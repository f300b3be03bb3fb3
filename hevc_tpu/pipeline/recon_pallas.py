"""Pallas TPU mega-kernel reconstruction: the whole-frame wavefront as
ONE kernel launch per component group.

Why: the XLA formulation (pipeline/recon.py) chains ~520 per-TU ops per
CTU through a lax.scan over wavefront diagonals; each op is an XLA call
site whose ~23 us dispatch overhead SERIALIZES along the intra
dependency chain — 4.33 s of pure launch overhead per 1080p frame batch
(ROADMAP round-4 microbenchmarks). Here the entire per-CTU DFS runs as
straight-line Mosaic code inside a Pallas kernel:

  * grid = (n_ctu,) in RASTER order — TPU grid steps execute
    sequentially, which IS the coding order, so the intra dependency
    needs no wavefront machinery at all;
  * the frame batch rides the 128-lane dim (planes stored [H, W, F]);
    per grid step one CTU position x all F frames is coded;
  * recon/coef planes live in HBM (ANY memory, input_output_aliased);
    each step DMAs its context row/column + originals in and its
    reconstructed tile out, so step i+1 reads step i's samples;
  * the 344 luma / 176 chroma TU sub-steps run as a fori_loop over an
    SMEM step table with a lax.switch over size classes, keeping the
    compiled body small;
  * intra prediction = the ops/intra_mm weight-table matmul
    (bf16 x bf16 -> f32: refs <= 255 and weights <= 32 are bf16-exact,
    sums < 2^24 — bit-exact, hardware-verified), DC via an exact
    epilogue; per-lane mode selection by one-hot masking, with inactive
    modes skipped via pl.when;
  * DCT/IDCT = Kronecker-factor matmuls (T (x) I_n), int32-exact via
    hi/lo byte splits (all partial products/sums < 2^24 in f32);
  * RDOQ-lite / quant / dequant elementwise with the ops/rdoq cost
    model; the CG-zeroing pool mirrors NumPy's summation order (dx then
    dy, sequential shifted adds) so f32 sums match the twins bit-exact.

Parity oracle: pipeline/recon.py (XLA) == pipeline/golden.py (NumPy) ==
this kernel; tests/test_recon_pallas.py. Behavioral reference for the
coded math: HM TComPrediction.cpp:412, TComTrQuant.cpp:388-841,1126 —
spec only, nothing here shares its shape.

Limitations: RDOQ model "lite" only (HEVC_TPU_RDOQ=trellis falls back
to the XLA path), bit_depth 8, 4:2:0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import intra, intra_mm, quant, rdoq, transforms
from .recon import FramePlanes, node_table

# extT flipped-y constants: extT[x, YC - y] = ext[y, x]
YC_L = 96      # luma: left-ref reads reach y0+2n <= 96
YC_C = 48      # chroma


# ---------------------------------------------------------------------------
# Host-side constant tables
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _luma_steps():
    """TU step table for one CTU, DFS pre-order (mirrors recon.code_ctu).

    Columns: cls, tux, tuy, nd8x, nd8y, dep, m4x, m4y.
    cls: 0 = 32x32, 1 = 16x16, 2 = 8x8 2Nx2N, 3 = 4x4 NxN (DST).
    """
    rows = []
    for (d, x0, y0) in node_table():
        d, x0, y0 = int(d), int(x0), int(y0)
        n8x, n8y, m4x, m4y = x0 >> 3, y0 >> 3, x0 >> 2, y0 >> 2
        if d == 0:
            for (dx, dy) in ((0, 0), (32, 0), (0, 32), (32, 32)):
                rows.append((0, x0 + dx, y0 + dy, n8x, n8y, 0, m4x, m4y))
        elif d == 1:
            rows.append((0, x0, y0, n8x, n8y, 1, m4x, m4y))
        elif d == 2:
            rows.append((1, x0, y0, n8x, n8y, 2, m4x, m4y))
        else:
            rows.append((2, x0, y0, n8x, n8y, 3, m4x, m4y))
            for (dx, dy) in ((0, 0), (4, 0), (0, 4), (4, 4)):
                rows.append((3, x0 + dx, y0 + dy, n8x, n8y, 3,
                             (x0 + dx) >> 2, (y0 + dy) >> 2))
    return np.asarray(rows, np.int32)


@functools.lru_cache(maxsize=None)
def _chroma_steps():
    """Chroma TU steps (tux/tuy in chroma coords; cls 0=16, 1=8, 2=4)."""
    rows = []
    for (d, x0, y0) in node_table():
        d, x0, y0 = int(d), int(x0), int(y0)
        n8x, n8y, m4x, m4y = x0 >> 3, y0 >> 3, x0 >> 2, y0 >> 2
        cx, cy = x0 >> 1, y0 >> 1
        if d == 0:
            for (dx, dy) in ((0, 0), (16, 0), (0, 16), (16, 16)):
                rows.append((0, cx + dx, cy + dy, n8x, n8y, 0, m4x, m4y))
        elif d == 1:
            rows.append((0, cx, cy, n8x, n8y, 1, m4x, m4y))
        elif d == 2:
            rows.append((1, cx, cy, n8x, n8y, 2, m4x, m4y))
        else:
            rows.append((2, cx, cy, n8x, n8y, 3, m4x, m4y))
    return np.asarray(rows, np.int32)


@functools.lru_cache(maxsize=None)
def _w_table_np(n: int, component: str):
    """intra_mm weight table repacked [35*n*n, 2R+1] f32 (mode-major
    rows; columns = [unfiltered refs, filtered refs, bias])."""
    W, _inv, _clip = intra_mm._tables(n, component)
    Wt = np.ascontiguousarray(W.T.astype(np.float32))
    # pad the ref dim to a 128-lane multiple (Mosaic DMA slice rule)
    r2 = Wt.shape[1]
    r2p = -(-r2 // 128) * 128
    if r2p != r2:
        Wt = np.pad(Wt, ((0, 0), (0, r2p - r2)))
    return Wt


@functools.lru_cache(maxsize=None)
def _mode_shift(n: int, component: str):
    """Per-mode interior inverse-shift multiplier + edge-clip flag."""
    _W, inv, clip = intra_mm._tables(n, component)
    n2 = n * n
    shifts, has_edge = [], []
    for m in range(35):
        cols_inv = inv[m * n2:(m + 1) * n2]
        vals, counts = np.unique(cols_inv, return_counts=True)
        shifts.append(float(vals[np.argmax(counts)]))
        has_edge.append(bool(clip[m * n2:(m + 1) * n2].any()))
    return shifts, has_edge


def _kron_np(n: int, use_dst: bool):
    """(A, B) = (T (x) I_n), (I_n (x) T) over row-major flattened
    blocks, f32 (cast to bf16 device-side)."""
    T = (transforms.dst_matrix() if use_dst
         else transforms.dct_matrix(n)).astype(np.float32)
    I = np.eye(n, dtype=np.float32)
    return np.kron(T, I), np.kron(I, T)


def _ptf_np(n: int):
    """Permutation: out[x*n + (n-1-y)] = in[y*n + x] — transposes the
    block AND flips y so extT column writes are ascending-yhat slices."""
    P = np.zeros((n * n, n * n), np.float32)
    for y in range(n):
        for x in range(n):
            P[x * n + (n - 1 - y), y * n + x] = 1.0
    return P


def _flip_np(n: int):
    return np.eye(n, dtype=np.float32)[::-1].copy()


def _ecol_np(n: int):
    """[n², n]: place vals[y] at row (y*n + 0)."""
    E = np.zeros((n * n, n), np.float32)
    for y in range(n):
        E[y * n, y] = 1.0
    return E


# ---------------------------------------------------------------------------
# In-kernel building blocks (traced; static shapes per call site)
# ---------------------------------------------------------------------------

def _shift_down(x, k):
    """out[i] = x[i-k] (rows < k hold garbage copies)."""
    R = x.shape[0]
    return jnp.concatenate([x[0:k], x[0:R - k]], axis=0)


def _shift_up(x, k):
    R = x.shape[0]
    return jnp.concatenate([x[k:R], x[R - k:R]], axis=0)


def _substitute(r, avail, bit_depth=8):
    """Reference substitution (8.4.4.2.2): forward fill then head fill.
    r [R, C] i32, avail [R, 1] bool (uniform over lanes)."""
    R = r.shape[0]
    ii = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    # masks as int32 0/1: Mosaic cannot shift/concat i1 vectors
    filled = r
    av = avail.astype(jnp.int32)
    k = 1
    while k < R:
        filled = jnp.where(av > 0, filled, _shift_down(filled, k))
        av = av | jnp.where(ii >= k, _shift_down(av, k), 0)
        k <<= 1
    k = 1
    while k < R:
        filled = jnp.where(av > 0, filled, _shift_up(filled, k))
        av = av | jnp.where(ii < R - k, _shift_up(av, k), 0)
        k <<= 1
    return jnp.where(jnp.any(avail), filled, 1 << (bit_depth - 1))


def _filter_refs(r):
    mid = (r[0:-2] + 2 * r[1:-1] + r[2:] + 2) >> 2
    return jnp.concatenate([r[0:1], mid, r[-1:]], axis=0)


def _interleave4(v):
    v = v & 0xF
    v = (v | (v << 2)) & 0x33
    v = (v | (v << 1)) & 0x55
    return v


def _avail_vec(gx0, gy0, n, pad_w, pad_h, n_ctu_x, scale):
    """[4n+1, 1] normative availability (ops/refs.availability twin).
    gx0/gy0 traced scalars in component coords; statics otherwise."""
    R = 4 * n + 1
    i = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    dx = jnp.where(i <= 2 * n, -1, i - 2 * n - 1)
    dy = jnp.where(i < 2 * n, 2 * n - 1 - i, -1)
    gx = gx0 + dx
    gy = gy0 + dy
    inside = (gx >= 0) & (gy >= 0) & (gx < pad_w) & (gy < pad_h)

    def zaddr(x, y):
        bx = x >> 2
        by = y >> 2
        morton = (_interleave4(bx & 15)
                  | (_interleave4(by & 15) << 1))
        return ((by >> 4) * n_ctu_x + (bx >> 4)) * 256 + morton

    zcur = zaddr(gx0 * scale, gy0 * scale)
    zref = zaddr(jnp.maximum(gx, 0) * scale, jnp.maximum(gy, 0) * scale)
    return inside & (zref < zcur)


def _dot(a_bf, x):
    """bf16 x bf16 -> f32 matmul, int32 result (exact for our ranges)."""
    return jax.lax.dot_general(
        a_bf.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)


def _dot_t(a_bf, x):
    """a^T @ x (contract dim 0 of both), int32 result."""
    return jax.lax.dot_general(
        a_bf.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)


def _rs(x, s):
    return (x + (1 << (s - 1))) >> s


def _hilo(v):
    hi = v >> 8
    return hi, v - (hi << 8)


def _row_mask(n, fn):
    """[n², 1] bool row mask from a (y, x) predicate via iota math."""
    p = jax.lax.broadcasted_iota(jnp.int32, (n * n, 1), 0)
    y = p // n
    return fn(y, p - y * n)


def _load_row(ref, oidx, start, size, *, aligned):
    """ref[oidx, start:start+size, :] -> [size, C] i32.

    Mosaic only allows dynamic sublane offsets it can prove 8-aligned;
    `aligned` asserts that (TU origins for n >= 8 are), else an aligned
    power-of-two window is loaded and dynamically rotated (dynamic
    rotate is 32-bit only and only correct for power-of-two windows —
    hardware-probed)."""
    C = ref.shape[2]
    if aligned:
        a0 = pl.multiple_of(start, 8)
        v = ref[pl.ds(oidx, 1), pl.ds(a0, size), :]
        return v.reshape(size, C).astype(jnp.int32)
    win = 16
    while win < size + 8:
        win *= 2
    a0 = pl.multiple_of((start // 8) * 8, 8)
    rem = start - a0
    v = ref[pl.ds(oidx, 1), pl.ds(a0, win), :].astype(jnp.int32)
    v = pltpu.roll(v, -rem, 1)
    return v[:, 0:size, :].reshape(size, C)


def _store_row(ref, oidx, start, size, vals, keep, *, aligned):
    """Masked RMW: ref[oidx, start+j, c] = vals[j, c] where keep[0, c].

    vals [size, C] int; keep [1, C] bool. Same alignment contract as
    _load_row."""
    C = ref.shape[2]
    dt = ref.dtype
    if aligned:
        a0 = pl.multiple_of(start, 8)
        cur = ref[pl.ds(oidx, 1), pl.ds(a0, size), :].reshape(size, C)
        new = jnp.where(keep, vals.astype(dt), cur)
        ref[pl.ds(oidx, 1), pl.ds(a0, size), :] = new.reshape(1, size, C)
        return
    win = 16
    while win < size + 8:
        win *= 2
    a0 = pl.multiple_of((start // 8) * 8, 8)
    rem = start - a0
    cur = ref[pl.ds(oidx, 1), pl.ds(a0, win), :].astype(jnp.int32)
    vp = jnp.concatenate(
        [vals.astype(jnp.int32).reshape(1, size, C),
         jnp.zeros((1, win - size, C), jnp.int32)], axis=1)
    vp = pltpu.roll(vp, rem, 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (1, win, 1), 1)
    m = (ii >= rem) & (ii < rem + size) & keep.reshape(1, 1, C)
    ref[pl.ds(oidx, 1), pl.ds(a0, win), :] = jnp.where(
        m, vp, cur).astype(dt)


def _load_cell(ref, oy, ox):
    """ref[oy, ox, :] -> [1, C] i32 (arbitrary dynamic offsets)."""
    return _load_row(ref, oy, ox, 1, aligned=False)


def _cg_pool(x, n):
    """4x4-CG sums at anchor rows, NumPy summation order (dx seq, then
    dy seq); non-anchor rows hold garbage. x: [n², C] f32."""
    acc = x
    for dx in (1, 2, 3):
        acc = acc + _shift_up(x, dx)
    acc2 = acc
    for dy in (1, 2, 3):
        acc2 = acc2 + _shift_up(acc, dy * n)
    return acc2


def _cg_broadcast(m, n):
    """Propagate a bool at CG anchor rows to all 16 rows of each CG
    (int32 0/1 internally — i1 vectors cannot be shifted in Mosaic)."""
    m = m.astype(jnp.int32)
    for dx in (1, 2, 3):
        m = m | jnp.where(_row_mask(n, lambda y, x, dx=dx: x % 4 == dx),
                          _shift_down(m, dx), 0)
    for dy in (1, 2, 3):
        m = m | jnp.where(_row_mask(n, lambda y, x, dy=dy: y % 4 == dy),
                          _shift_down(m, dy * n), 0)
    return m > 0


def _level_bits_f32(l):
    """ops/rdoq._level_bits twin (exact elementwise)."""
    v = (l + 1).astype(jnp.float32)
    b32 = pltpu.bitcast(v, jnp.int32)
    e = ((b32 >> 23) - 127).astype(jnp.float32)
    m = (b32 & 0x7FFFFF).astype(jnp.float32) * jnp.float32(2.0 ** -23)
    return jnp.where(l == 0, jnp.float32(1.0),
                     jnp.where(l == 1, jnp.float32(2.5),
                               jnp.where(l == 2, jnp.float32(4.0),
                                         2.0 * (e + m) + 3.5)))


def _dequantize(lv, n, qp, bit_depth=8):
    log2n = int(n).bit_length() - 1
    tshift = quant.MAX_TR_DYNAMIC_RANGE - bit_depth - log2n
    shift = (20 - quant.QUANT_SHIFT) - tshift
    scale = quant.INV_QUANT_SCALES[qp % 6] << (qp // 6)
    d = (lv * scale + (1 << (shift - 1))) >> shift
    return jnp.clip(d, -32768, 32767)


def _rdoq_lite(coef, n, qp, lam_f, bit_depth=8):
    """ops/rdoq.rd_quantize twin on [n², C] (bit-exact decisions)."""
    log2n = int(n).bit_length() - 1
    qbits = quant._qbits(qp, log2n, bit_depth)
    scale = quant.QUANT_SCALES[qp % 6]
    a = jnp.abs(coef)
    sign = coef < 0
    hi = jnp.minimum((a * scale + (1 << (qbits - 1))) >> qbits, 32767)
    lo = jnp.maximum(hi - 1, 0)
    al = jnp.float32(rdoq.alpha(n, bit_depth))
    lam = jnp.float32(lam_f * rdoq.LAMBDA_SCALE)

    def cost(lv):
        e = (a - _dequantize(lv, n, qp, bit_depth)).astype(jnp.float32)
        return al * e * e + lam * _level_bits_f32(lv)

    zero = jnp.zeros_like(hi)
    c_hi, c_lo, c_z = cost(hi), cost(lo), cost(zero)
    lv = jnp.where((c_lo <= c_hi) & (lo > 0), lo, hi)
    cv = jnp.minimum(c_lo, c_hi)
    lv = jnp.where(c_z <= cv, zero, lv)
    cv = jnp.minimum(c_z, cv)
    if n >= 8:
        keep = _cg_pool(cv, n)
        zcost = _cg_pool(c_z, n) - lam * jnp.float32(1.0)
        zcg = ((zcost <= keep)
               & _row_mask(n, lambda y, x: (y % 4 == 0) & (x % 4 == 0)))
        lv = jnp.where(_cg_broadcast(zcg, n), 0, lv)
    return jnp.where(sign, -lv, lv)


def _quantize(coef, n, qp, is_intra=True, bit_depth=8):
    log2n = int(n).bit_length() - 1
    qbits = quant._qbits(qp, log2n, bit_depth)
    scale = quant.QUANT_SCALES[qp % 6]
    add = (171 if is_intra else 85) << (qbits - 9)
    lv = jnp.minimum((jnp.abs(coef) * scale + add) >> qbits, 32767)
    return jnp.where(coef < 0, -lv, lv)


def _dc_block(r_s, n, component, flipn, ecol):
    """Exact DC prediction [n², C] i32 from substituted refs [R, C]."""
    log2n = int(n).bit_length() - 1
    C = r_s.shape[1]
    n2 = n * n
    T = r_s[2 * n + 1:3 * n + 1]                      # top[0..n-1]
    Lrows = r_s[n:2 * n]                              # left[n-1]..left[0]
    dc = ((jnp.sum(T, axis=0, keepdims=True)
           + jnp.sum(Lrows, axis=0, keepdims=True) + n) >> (log2n + 1))
    dcp = jnp.broadcast_to(dc, (n2, C)).astype(jnp.int32)
    if component == "luma" and n < 32:
        Lf = _dot(flipn, Lrows)                       # left[0..n-1]
        row0 = (T + 3 * dc + 2) >> 2                  # at p = x
        row0e = jnp.concatenate(
            [row0, jnp.zeros((n2 - n, C), jnp.int32)], axis=0)
        col0e = _dot(ecol, (Lf + 3 * dc + 2) >> 2)    # at p = y*n
        c00 = (Lf[0:1] + 2 * dc + T[0:1] + 2) >> 2
        dcp = jnp.where(_row_mask(n, lambda y, x: x == 0), col0e, dcp)
        dcp = jnp.where(_row_mask(n, lambda y, x: y == 0), row0e, dcp)
        dcp = jnp.where(_row_mask(n, lambda y, x: (y == 0) & (x == 0)),
                        jnp.broadcast_to(c00, (n2, C)), dcp)
    return dcp


# ---------------------------------------------------------------------------
# Kernel factory
# ---------------------------------------------------------------------------

def _build_component_call(*, nx, ny, qp, pad_w, pad_h, rdoq_on, C,
                          component, interpret):
    luma = component == "luma"
    steps_np = _luma_steps() if luma else _chroma_steps()
    n_steps = steps_np.shape[0]
    S = 64 if luma else 32
    yc = YC_L if luma else YC_C
    qp_c = qp if luma else quant.chroma_qp(qp)
    lam_f = 0.57 * 2.0 ** ((qp_c - 12) / 3.0)
    pw = pad_w if luma else pad_w // 2
    ph = pad_h if luma else pad_h // 2
    scale = 1 if luma else 2
    np_ = 1 if luma else 2
    classes = ([(32, False), (16, False), (8, False), (4, True)] if luma
               else [(16, False), (8, False), (4, False)])
    streamed_w = {32, 16} if luma else set()
    streamed_ab = {32} if luma else set()
    wchunk = {32: 2, 16: 8}
    nmax = classes[0][0]
    H = ny * S
    W = nx * S

    ext_x = 2 * S + 8
    extT_y = ((yc + 1 + 7) // 8) * 8

    # ---- constants (host) -------------------------------------------------
    w_res_np, w_any_np, ab_res_np, ab_any_np = {}, {}, {}, {}
    for (n, dst) in classes:
        key = (n, dst)
        wt = _w_table_np(n, component)
        (w_any_np if n in streamed_w else w_res_np)[key] = wt
        A, B = _kron_np(n, dst)
        PT = _ptf_np(n)
        tri = np.stack([A, B, PT])
        (ab_any_np if n in streamed_ab else ab_res_np)[key] = tri
    flips_np = {n: _flip_np(n) for (n, _d) in classes}
    ecols_np = {n: _ecol_np(n) for (n, _d) in classes}

    res_keys = sorted(w_res_np)
    any_keys = sorted(w_any_np)
    abres_keys = sorted(ab_res_np)
    abany_keys = sorted(ab_any_np)
    flip_keys = sorted(flips_np)
    ecol_keys = sorted(ecols_np)

    r2max_any = max((w_any_np[k].shape[1] for k in any_keys), default=0)
    wrows_any = max((wchunk.get(k[0], 4) * k[0] * k[0]
                     for k in any_keys), default=0)
    abmax = max((k[0] * k[0] for k in abany_keys), default=0)

    def kernel(*refs):
        it = iter(refs)
        tbl = next(it)
        orig_refs = [next(it) for _ in range(np_)]
        d8_any = next(it)
        m4_any = next(it)
        nxn_any = next(it)
        w_res = {k: next(it) for k in res_keys}
        w_any = {k: next(it) for k in any_keys}
        ab_res = {k: next(it) for k in abres_keys}
        ab_any = {k: next(it) for k in abany_keys}
        flips = {k: next(it) for k in flip_keys}
        ecols = {k: next(it) for k in ecol_keys}
        plane_in = [next(it) for _ in range(np_)]     # aliased inputs
        coef_in = [next(it) for _ in range(np_)]
        plane_out = [next(it) for _ in range(np_)]
        coef_out = [next(it) for _ in range(np_)]
        exts = [next(it) for _ in range(np_)]
        extTs = [next(it) for _ in range(np_)]
        rbufs = [next(it) for _ in range(np_)]
        orig_bufs = [next(it) for _ in range(np_)]
        coef_bufs = [next(it) for _ in range(np_)]
        d8buf = next(it)
        m4buf = next(it)
        nxnbuf = next(it)
        pred_buf = next(it)
        wbuf = next(it)
        abbuf = next(it)
        ltmps = [next(it) for _ in range(np_)]
        tctxs = [next(it) for _ in range(np_)]
        sems = next(it)
        del plane_in, coef_in  # same buffers as plane_out/coef_out

        step = pl.program_id(0)
        ctu_x = step % nx
        ctu_y = step // nx
        ox = ctu_x * S
        oy = ctu_y * S

        # ---- stage in ---------------------------------------------------
        # plane layout: 1-row top + 8-col left border; interior (y, x)
        # at [1+y, 8+x] so every DMA dim-1 start is 8-aligned. The +-1
        # context shifts happen in-register below.
        dmas = []
        for p in range(np_):
            dmas.append(pltpu.make_async_copy(
                plane_out[p].at[pl.ds(oy, 1), pl.ds(ox, 2 * S + 16), :],
                tctxs[p].at[0:1, 0:2 * S + 16, :], sems.at[p]))
            dmas.append(pltpu.make_async_copy(
                plane_out[p].at[pl.ds(oy + 1, S), pl.ds(ox, 8), :],
                ltmps[p].at[0:S, 0:8, :], sems.at[2 + p]))
            dmas.append(pltpu.make_async_copy(
                orig_refs[p].at[pl.ds(oy, S), pl.ds(ox, S), :],
                orig_bufs[p].at[0:S, 0:S, :], sems.at[4 + p]))
        dmas.append(pltpu.make_async_copy(
            d8_any.at[pl.ds(ctu_y * 8, 8), pl.ds(ctu_x * 8, 8), :],
            d8buf.at[0:8, 0:8, :], sems.at[6]))
        dmas.append(pltpu.make_async_copy(
            m4_any.at[pl.ds(ctu_y * 16, 16), pl.ds(ctu_x * 16, 16), :],
            m4buf.at[0:16, 0:16, :], sems.at[7]))
        dmas.append(pltpu.make_async_copy(
            nxn_any.at[pl.ds(ctu_y * 8, 8), pl.ds(ctu_x * 8, 8), :],
            nxnbuf.at[0:8, 0:8, :], sems.at[8]))
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()

        for p in range(np_):
            # ctx row: corner sits at tctx col 7, top at cols 8..
            exts[p][0:1, 0:2 * S + 1, :] = (
                tctxs[p][0:1, 7:2 * S + 8, :])
            # left ctx column (corner-col 7 of the 8-wide window)
            exts[p][1:S + 1, 0:1, :] = ltmps[p][0:S, 7:8, :]
            # and into extT[0, yc-y] for y = 1..S (reversed order);
            # S tiny [1,1,C] copies — layout-safe
            for k in range(S):           # ltmps[p][k] = plane row oy+1+k
                extTs[p][0:1, yc - 1 - k:yc - k, :] = (
                    ltmps[p][k:k + 1, 7:8, :])
            coef_bufs[p][...] = jnp.zeros((S, S + 16, C), jnp.int16)

        # ---- TU loop ----------------------------------------------------
        def tu_body(s, _carry):
            cls = tbl[s, 0]
            tux = tbl[s, 1]
            tuy = tbl[s, 2]
            n8x = tbl[s, 3]
            n8y = tbl[s, 4]
            dep = tbl[s, 5]
            m4x = tbl[s, 6]
            m4y = tbl[s, 7]

            d8v = _load_cell(d8buf, n8y, n8x)
            leaf0 = d8v == dep
            mode_v = _load_cell(m4buf, m4y, m4x)
            nxv = _load_cell(nxnbuf, n8y, n8x) != 0

            def class_fn(ci):
                n, dst = classes[ci]
                key = (n, dst)

                def run(_):
                    leaf = leaf0
                    if luma and n == 8:
                        leaf = leaf & (~nxv)
                    elif luma and n == 4:
                        leaf = leaf & nxv

                    @pl.when(jnp.any(leaf))
                    def _():
                        for p in range(np_):
                            _code_one_tu(
                                n=n, dst=dst, component=component,
                                qp=qp_c, lam_f=lam_f, rdoq_on=rdoq_on,
                                ext=exts[p], extT=extTs[p],
                                orig_buf=orig_bufs[p],
                                coef_buf=coef_bufs[p],
                                pred_buf=pred_buf, wbuf=wbuf,
                                abbuf=abbuf, sems=sems, yc=yc,
                                w_res=w_res.get(key),
                                w_any=w_any.get(key),
                                ab_res=ab_res.get(key),
                                ab_any=ab_any.get(key),
                                flipn=flips[n][...], ecoln=ecols[n][...],
                                wchunk=wchunk.get(n, 4),
                                x0=tux, y0=tuy, leaf=leaf,
                                mode_v=mode_v,
                                gx0=ox + tux, gy0=oy + tuy,
                                pw=pw, ph=ph, n_ctu_x=nx, scale=scale,
                                C=C)
                    return 0
                return run

            jax.lax.switch(cls, [class_fn(i) for i in range(len(classes))],
                           0)
            return 0

        jax.lax.fori_loop(0, n_steps, tu_body, 0)

        # ---- stage out --------------------------------------------------
        # DMA needs 8-aligned sublane starts: shift the interior
        # (ext cols 1..S) into an aligned staging buffer first
        for p in range(np_):
            for i8 in range(0, S, 8):
                v = exts[p][i8 + 1:i8 + 9, :, :]   # full aligned rows
                rbufs[p][i8:i8 + 8, 0:S, :] = v[:, 1:S + 1, :]
        outs = []
        for p in range(np_):
            outs.append(pltpu.make_async_copy(
                rbufs[p].at[0:S, 0:S, :],
                plane_out[p].at[pl.ds(oy + 1, S), pl.ds(ox + 8, S), :],
                sems.at[p]))
            outs.append(pltpu.make_async_copy(
                coef_bufs[p].at[0:S, 0:S, :],
                coef_out[p].at[pl.ds(oy, S), pl.ds(ox, S), :],
                sems.at[2 + p]))
        for d in outs:
            d.start()
        for d in outs:
            d.wait()

    # ---- specs ------------------------------------------------------------
    i16 = jnp.int16
    i32 = jnp.int32
    bf16 = jnp.bfloat16

    def vspec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def aspec():
        return pl.BlockSpec(memory_space=pltpu.ANY)

    def hspec():
        # big planes must live in HBM: DMA to/from HBM is byte-strided
        # (no tile-alignment rules), and ANY may pick VMEM for small
        # test frames, where +1-offset plane slices are illegal
        return pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]     # tbl
    in_specs += [hspec() for _ in range(np_)]              # orig planes
    in_specs += [hspec(), hspec(), hspec()]                # d8, m4, nxn
    in_specs += [vspec() for _ in res_keys]                # W resident
    in_specs += [hspec() for _ in any_keys]                # W streamed
    in_specs += [vspec() for _ in abres_keys]              # AB resident
    in_specs += [hspec() for _ in abany_keys]              # AB streamed
    in_specs += [vspec() for _ in flip_keys]               # flips
    in_specs += [vspec() for _ in ecol_keys]               # ecols
    in_specs += [hspec() for _ in range(2 * np_)]          # plane+coef init

    out_specs = tuple(hspec() for _ in range(2 * np_))
    out_shape = tuple(
        [jax.ShapeDtypeStruct((H + 1, W + S + 16, C), i16)
         for _ in range(np_)]
        + [jax.ShapeDtypeStruct((H, W, C), i16) for _ in range(np_)])

    n_inputs = len(in_specs)
    # aliased plane/coef inits are the LAST 2*np_ inputs
    aliases = {n_inputs - 2 * np_ + k: k for k in range(2 * np_)}

    nmax2 = nmax * nmax
    scratch = []
    scratch += [pltpu.VMEM((S + 1, ext_x, C), i16) for _ in range(np_)]
    scratch += [pltpu.VMEM((S + 1, extT_y, C), i16) for _ in range(np_)]
    scratch += [pltpu.VMEM((S, S, C), i16) for _ in range(np_)]   # rbufs
    # orig/coef sublane dims padded so n=4 roll windows stay in bounds
    scratch += [pltpu.VMEM((S, S + 16, C), i16) for _ in range(np_)]
    scratch += [pltpu.VMEM((S, S + 16, C), i16) for _ in range(np_)]
    scratch += [pltpu.VMEM((8, 16, C), i32),
                pltpu.VMEM((16, 32, C), i32),
                pltpu.VMEM((8, 16, C), i32)]
    scratch += [pltpu.VMEM((nmax2, C), i32)]                      # pred
    scratch += [pltpu.VMEM((max(wrows_any, 8),
                            max(r2max_any, 8)), bf16)]            # wbuf
    scratch += [pltpu.VMEM((1, max(abmax, 8), max(abmax, 8)),
                           bf16)]                                 # abbuf
    scratch += [pltpu.VMEM((S, 8, C), i16) for _ in range(np_)]   # ltmps
    scratch += [pltpu.VMEM((1, 2 * S + 16, C), i16)
                for _ in range(np_)]                              # tctxs
    scratch += [pltpu.SemaphoreType.DMA((12,))]

    grid = (nx * ny,)

    def call(orig_planes, d8, m4, nxn8, plane_inits, coef_inits):
        args = [jnp.asarray(steps_np)]
        args += list(orig_planes)
        args += [d8, m4, nxn8]
        args += [jnp.asarray(w_res_np[k], bf16) for k in res_keys]
        args += [jnp.asarray(w_any_np[k], bf16) for k in any_keys]
        args += [jnp.asarray(ab_res_np[k], bf16) for k in abres_keys]
        args += [jnp.asarray(ab_any_np[k], bf16) for k in abany_keys]
        args += [jnp.asarray(flips_np[k], bf16) for k in flip_keys]
        args += [jnp.asarray(ecols_np[k], bf16) for k in ecol_keys]
        args += list(plane_inits) + list(coef_inits)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            input_output_aliases=aliases,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*args)

    return call


def _code_one_tu(*, n, dst, component, qp, lam_f, rdoq_on, ext, extT,
                 orig_buf, coef_buf, pred_buf, wbuf, abbuf, sems, yc,
                 w_res, w_any, ab_res, ab_any, flipn, ecoln, wchunk,
                 x0, y0, leaf, mode_v, gx0, gy0, pw, ph, n_ctu_x, scale,
                 C):
    """Trace the full predict->transform->quant->recon chain for one TU."""
    n2 = n * n
    luma = component == "luma"
    log2n = int(n).bit_length() - 1
    s1f = log2n + 8 - 9
    s2f = log2n + 6

    # ---- refs -------------------------------------------------------------
    al = n >= 8          # TU origins for n >= 8 are 8-aligned
    top = _load_row(ext, y0, x0, 2 * n + 1, aligned=al)
    rl = _load_row(extT, x0, yc - y0 - 2 * n, 2 * n, aligned=al)
    r_u = jnp.concatenate([rl, top], axis=0)
    avail = _avail_vec(gx0, gy0, n, pw, ph, n_ctu_x, scale)
    r_s = _substitute(r_u, avail)
    import os as _os
    _dbg = _os.environ.get("HEVC_TPU_PALLAS_DEBUG_TU")
    if _dbg:
        _dgx, _dgy, _dn = map(int, _dbg.split(","))
        if _dn == n:
            @pl.when((gx0 == _dgx) & (gy0 == _dgy))
            def _():
                for _i in range(4 * n + 1):
                    pl.debug_print("rs[" + str(_i) + "] = {}",
                                   r_s[_i, 0])
    r_f = _filter_refs(r_s) if luma else r_s
    refs2 = jnp.concatenate(
        [r_s, r_f, jnp.ones((1, C), jnp.int32)], axis=0)
    refs_bf = refs2.astype(jnp.bfloat16)

    # ---- prediction -------------------------------------------------------
    shifts, has_edge = _mode_shift(n, component)
    mrow0 = _row_mask(n, lambda y, x: y == 0)
    mcol0 = _row_mask(n, lambda y, x: x == 0)

    r2log = 2 * (4 * n + 1) + 1

    def emit(m, w_rows):
        raw = jax.lax.dot_general(
            w_rows[:, 0:r2log], refs_bf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if has_edge[m]:
            emask = mcol0 if m == intra.VER else mrow0
            inv = jnp.where(emask, jnp.float32(0.5),
                            jnp.float32(shifts[m]))
            pm = jnp.floor(raw * inv)
            pm = jnp.where(emask, jnp.clip(pm, 0.0, 255.0), pm)
        else:
            pm = jnp.floor(raw * jnp.float32(shifts[m]))
        sel = mode_v == m
        pred_buf[0:n2, :] = jnp.where(sel, pm.astype(jnp.int32),
                                      pred_buf[0:n2, :])

    if w_any is None:
        for m in range(35):
            if m == intra.DC:
                continue

            @pl.when(jnp.any(mode_v == m))
            def _(m=m):
                emit(m, w_res[m * n2:(m + 1) * n2, :])
    else:
        r2 = w_any.shape[1]
        for m0 in range(0, 35, wchunk):
            ms = [m for m in range(m0, min(m0 + wchunk, 35))
                  if m != intra.DC]
            if not ms:
                continue
            hit = jnp.zeros((), jnp.bool_)
            for m in ms:
                hit = hit | jnp.any(mode_v == m)

            c_eff = min(wchunk, 35 - m0)

            @pl.when(hit)
            def _(m0=m0, ms=ms, c_eff=c_eff):
                cp = pltpu.make_async_copy(
                    w_any.at[pl.ds(m0 * n2, c_eff * n2), :],
                    wbuf.at[0:c_eff * n2, 0:r2], sems.at[9])
                cp.start()
                cp.wait()
                for m in ms:
                    k = m - m0

                    @pl.when(jnp.any(mode_v == m))
                    def _(m=m, k=k):
                        emit(m, wbuf[k * n2:(k + 1) * n2, 0:r2])

    dcp = _dc_block(r_s, n, component, flipn, ecoln)
    pred = jnp.where(mode_v == intra.DC, dcp, pred_buf[0:n2, :])

    # ---- original block ---------------------------------------------------
    rows = [_load_row(orig_buf, y0 + i, x0, n, aligned=al)
            for i in range(n)]
    orig_blk = jnp.concatenate(rows, axis=0)
    resi = orig_blk - pred

    # ---- transforms -------------------------------------------------------
    if ab_res is not None:
        A_bf = ab_res[0:1, :, :].reshape(n2, n2)
        B_bf = ab_res[1:2, :, :].reshape(n2, n2)
        PT_bf = ab_res[2:3, :, :].reshape(n2, n2)

        t1 = _rs(_dot(A_bf, resi), s1f)
        hi, lo = _hilo(t1)
        cf = _rs((_dot(B_bf, hi) << 8) + _dot(B_bf, lo), s2f)
        lvl = (_rdoq_lite(cf, n, qp, lam_f) if rdoq_on
               else _quantize(cf, n, qp))
        dq = _dequantize(lvl, n, qp)
        hid, lod = _hilo(dq)
        u1 = jnp.clip(_rs((_dot_t(A_bf, hid) << 8) + _dot_t(A_bf, lod),
                          7), -32768, 32767)
        hi2, lo2 = _hilo(u1)
        rr = jnp.clip(_rs((_dot_t(B_bf, hi2) << 8) + _dot_t(B_bf, lo2),
                          12), -32768, 32767)
        rec = jnp.clip(pred + rr, 0, 255)
        recTF = _dot(PT_bf, rec)
    else:
        def fetch2(idx):
            cp = pltpu.make_async_copy(
                ab_any.at[pl.ds(idx, 1), 0:n2, 0:n2],
                abbuf.at[0:1, 0:n2, 0:n2], sems.at[9])
            cp.start()
            cp.wait()
            return abbuf[0:1, 0:n2, 0:n2].reshape(n2, n2)

        A_bf = fetch2(0)
        t1 = _rs(_dot(A_bf, resi), s1f)
        B_bf = fetch2(1)
        hi, lo = _hilo(t1)
        cf = _rs((_dot(B_bf, hi) << 8) + _dot(B_bf, lo), s2f)
        lvl = (_rdoq_lite(cf, n, qp, lam_f) if rdoq_on
               else _quantize(cf, n, qp))
        dq = _dequantize(lvl, n, qp)
        A_bf = fetch2(0)
        hid, lod = _hilo(dq)
        u1 = jnp.clip(_rs((_dot_t(A_bf, hid) << 8) + _dot_t(A_bf, lod),
                          7), -32768, 32767)
        B_bf = fetch2(1)
        hi2, lo2 = _hilo(u1)
        rr = jnp.clip(_rs((_dot_t(B_bf, hi2) << 8) + _dot_t(B_bf, lo2),
                          12), -32768, 32767)
        rec = jnp.clip(pred + rr, 0, 255)
        PT_bf = fetch2(2)
        recTF = _dot(PT_bf, rec)

    # ---- masked writes ----------------------------------------------------
    for i in range(n):
        _store_row(ext, y0 + 1 + i, x0 + 1, n,
                   rec[i * n:(i + 1) * n, :], leaf, aligned=False)
        _store_row(extT, x0 + 1 + i, yc - y0 - n, n,
                   recTF[i * n:(i + 1) * n, :], leaf, aligned=al)
        _store_row(coef_buf, y0 + i, x0, n,
                   lvl[i * n:(i + 1) * n, :], leaf, aligned=al)


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------

def _use_interpret():
    try:
        dd = jax.config.jax_default_device
        if dd is not None:
            return dd.platform != "tpu"
        return jax.default_backend() != "tpu"
    except Exception:
        return True


@functools.partial(jax.jit,
                   static_argnames=("qp", "pad_w", "pad_h", "rdoq",
                                    "interpret"))
def encode_frame_planes_pallas(ys, cbs, crs, depth8, modes4, nxn8, *,
                               qp, pad_w, pad_h, rdoq=True,
                               interpret=None):
    """Batched whole-frame reconstruction via the Pallas mega-kernel.

    ys/cbs/crs: [F, H, W] (uint8/int); depth8 [F, h8, w8] (pad units),
    modes4 [F, h4, w4], nxn8 [F, h8, w8] bool. Returns FramePlanes with
    leading F dim (recon uint8 cropped to pad dims, coef int16) — the
    batched twin of jax.vmap(recon.encode_frame_planes)."""
    if interpret is None:
        interpret = _use_interpret()
    F = ys.shape[0]
    # Mosaic DMA requires lane-dim slices aligned to the 128-lane tile,
    # so the hardware path pads the frame batch to 128 (the VMEM
    # footprint is 128-lane padded regardless); interpret mode keeps F.
    C = F if interpret else 128
    assert F <= C, (F, "use <=128-frame chunks")
    nx, ny = -(-pad_w // 64), -(-pad_h // 64)
    H64, W64 = ny * 64, nx * 64

    def to_hwc(a, th, tw, fill=0, dtype=jnp.int16):
        a = jnp.asarray(a)
        a = jnp.pad(a, ((0, C - a.shape[0]), (0, th - a.shape[1]),
                        (0, tw - a.shape[2])), constant_values=fill)
        return a.transpose(1, 2, 0).astype(dtype)

    orig_y = to_hwc(ys, H64, W64)
    orig_cb = to_hwc(cbs, H64 // 2, W64 // 2)
    orig_cr = to_hwc(crs, H64 // 2, W64 // 2)
    d8 = to_hwc(depth8, H64 // 8, W64 // 8, fill=-1, dtype=jnp.int32)
    m4 = to_hwc(modes4, H64 // 4, W64 // 4, dtype=jnp.int32)
    nxn = to_hwc(nxn8.astype(jnp.int32), H64 // 8, W64 // 8,
                 dtype=jnp.int32)

    ly = _build_component_call(nx=nx, ny=ny, qp=qp, pad_w=pad_w,
                               pad_h=pad_h, rdoq_on=rdoq, C=C,
                               component="luma", interpret=interpret)
    lc = _build_component_call(nx=nx, ny=ny, qp=qp, pad_w=pad_w,
                               pad_h=pad_h, rdoq_on=rdoq, C=C,
                               component="chroma", interpret=interpret)

    py0 = jnp.zeros((H64 + 1, W64 + 80, C), jnp.int16)
    cy0 = jnp.zeros((H64, W64, C), jnp.int16)
    rec_y, coef_y = ly([orig_y], d8, m4, nxn, [py0], [cy0])

    pc0 = jnp.zeros((H64 // 2 + 1, W64 // 2 + 48, C), jnp.int16)
    cc0 = jnp.zeros((H64 // 2, W64 // 2, C), jnp.int16)
    rcb, rcr, cfb, cfr = lc([orig_cb, orig_cr], d8, m4, nxn,
                            [pc0, jnp.zeros_like(pc0)],
                            [cc0, jnp.zeros_like(cc0)])

    def back(a, hh, ww, dtype):
        return a[:hh, :ww, :F].transpose(2, 0, 1).astype(dtype)

    return FramePlanes(
        recon_y=back(rec_y[1:, 8:], pad_h, pad_w, jnp.uint8),
        recon_cb=back(rcb[1:, 8:], pad_h // 2, pad_w // 2, jnp.uint8),
        recon_cr=back(rcr[1:, 8:], pad_h // 2, pad_w // 2, jnp.uint8),
        coef_y=back(coef_y, pad_h, pad_w, jnp.int16),
        coef_cb=back(cfb, pad_h // 2, pad_w // 2, jnp.int16),
        coef_cr=back(cfr, pad_h // 2, pad_w // 2, jnp.int16),
    )
