"""HM-style rate-distortion optimized quantization with exact CABAC rates.

Vectorized TPU re-formulation of HM's xRateDistOptQuant
(TComTrQuant.cpp:2129): per-coefficient level decisions priced with the
frozen slice-init fractional-bit tables of ops/bits_exact (the estBitsSbac
analogue, HM TComTrQuant::xGetICRate), then coded-sub-block zeroing
(d64CostZeroCG) and the last-position sweep (HM's best-last scan over
candidate last positions, truncating trailing |level|==1 runs).

Where HM tracks the c1/c2/GoRice side states *sequentially* while
deciding, this formulation freezes them from the provisional round-half
level field (the max candidates): every decision becomes a data-parallel
3-way compare, and the order-dependent prefix/suffix cost sums of the
last-position sweep are cumsum/cummax scans over the scan axis — all
static-shaped, one XLA op each, so the whole quantizer stays a small
fused addition to the per-TU pipeline.

The NumPy "twin" simply runs the same jitted function on the host
backend: level choices are RD decisions, not normative math, so any
backend's choice yields a conformant stream — parity between the
reconstruction path and the entropy coder is by construction (both
consume the same level tensors).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import quant
from .bits_exact import _tables
from .rdoq import alpha
from ..entropy import scan as scanlib

C1FLAG_NUMBER = 8

#: rate-weight calibration knob (same role as ops/rdoq.LAMBDA_SCALE).
LAMBDA_SCALE = float(os.environ.get(
    "HEVC_TPU_TRELLIS_LAMBDA_SCALE", "1.0"))

# stage switches (debug/ablation)
ENABLE_CG_ZERO = True
ENABLE_LAST_SWEEP = True


@functools.lru_cache(maxsize=None)
def _inv_scan(scan_type: int, n: int) -> np.ndarray:
    scan = scanlib.grouped_scan(scan_type, n)
    inv = np.empty_like(scan)
    inv[scan] = np.arange(scan.size, dtype=scan.dtype)
    return inv


def _golomb_bits(value, rice):
    """coeff_abs_level_remaining length in bits; value >= 0 int32, rice
    int32 arrays. Integer bit-length via compares (no float log2)."""
    one = jnp.ones_like(rice)
    thresh = jnp.left_shift(3 * one, rice)
    small = jnp.right_shift(value, rice) + 1 + rice
    w = jnp.maximum(value - thresh + jnp.left_shift(one, rice), 1)
    length = jnp.zeros_like(value)
    for b in range(1, 17):
        length = length + (w >= (1 << b)).astype(value.dtype)
    big = 4 + 2 * length - rice
    return jnp.where(value < thresh, small, big).astype(jnp.float32)


def rd_quantize_trellis(coef, qp: int, lam, *, is_luma=True, init_type=0,
                        is_intra=True, ctx_qp=None, bit_depth=8,
                        scan_type=scanlib.SCAN_DIAG):
    """RD-optimal quantization of [..., n, n] int32 coefficients.

    qp/lam quantize and weigh; ctx_qp (default qp) selects the frozen
    context-state cost tables (HM keys estBitsSbac off the slice QP).
    Returns signed levels, same shape/dtype int32.

    Wrapped in an inner jit: call sites inside big traced programs (the
    85-node recon DFS makes ~hundreds of them) share ONE compiled body
    per (shape, statics) instead of inlining it — measured ~2x compile
    time/memory on call-heavy modules.
    """
    return _rd_quantize_trellis_jit(
        jnp.asarray(coef), int(qp), float(lam), bool(is_luma),
        int(init_type), bool(is_intra),
        int(qp if ctx_qp is None else ctx_qp), int(bit_depth),
        int(scan_type))


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7, 8))
def _rd_quantize_trellis_jit(coef, qp, lam, is_luma, init_type,
                             is_intra, ctx_qp, bit_depth, scan_type):
    n = coef.shape[-1]
    nn = n * n
    batch = coef.shape[:-2]
    log2n = int(n).bit_length() - 1
    t = _tables(n, scan_type, is_luma, ctx_qp, init_type)
    ncg = t["ncg"]
    scan = jnp.asarray(t["scan"])

    c = coef.reshape(*batch, nn).astype(jnp.int32)
    sign_r = c < 0
    a = jnp.take(jnp.abs(c), scan, axis=-1)              # scan order

    qbits = quant._qbits(qp, log2n, bit_depth)
    qscale = quant.QUANT_SCALES[qp % 6]
    hi = jnp.minimum((a * qscale + (1 << (qbits - 1))) >> qbits, 32767)
    lo = jnp.maximum(hi - 1, 0)

    # normative dequant at this TU size (inline: scan-order layout)
    tshift = quant.MAX_TR_DYNAMIC_RANGE - bit_depth - log2n
    dshift = (20 - quant.QUANT_SHIFT) - tshift
    dscale = quant.INV_QUANT_SCALES[qp % 6] << (qp // 6)

    al = jnp.float32(alpha(n, bit_depth))
    lam32 = jnp.float32(float(lam) * LAMBDA_SCALE)

    def dist(lv):
        d = jnp.clip((lv * dscale + (1 << (dshift - 1))) >> dshift,
                     -32768, 32767)
        e = (a - d).astype(jnp.float32)
        return al * e * e

    # ---- frozen side-state fields from the provisional field L0 = hi ----
    k_idx = jnp.arange(nn, dtype=jnp.int32)
    i16 = jnp.arange(16, dtype=jnp.int32)
    subs = jnp.arange(ncg, dtype=jnp.int32)
    sub_of_k = k_idx >> 4
    L0 = hi
    nz0 = L0 > 0
    l0cg = L0.reshape(*batch, ncg, 16)
    nzcg0 = l0cg > 0
    cg_nz0 = nzcg0.any(-1)
    last0 = jnp.max(jnp.where(nz0, k_idx, -1), axis=-1)  # [...], -1 if none
    last_cg0 = jnp.maximum(last0, 0) >> 4

    def nbr_flag(flags, nbr):
        nbr = jnp.asarray(nbr)
        f = jnp.take(flags, jnp.maximum(nbr, 0), axis=-1)
        return jnp.where(nbr >= 0, f, False)

    pattern = (nbr_flag(cg_nz0, t["right_sub"]).astype(jnp.int32)
               + 2 * nbr_flag(cg_nz0, t["lower_sub"]).astype(jnp.int32))

    # coding-order rank within CG (higher in-CG scan idx codes first)
    def excl_count_above(flags_cg16):
        x = flags_cg16.astype(jnp.int32)[..., ::-1]
        return (jnp.cumsum(x, -1) - x)[..., ::-1]

    rank = excl_count_above(nzcg0)                       # [..., ncg, 16]
    gt1_in8 = (l0cg > 1) & nzcg0 & (rank < C1FLAG_NUMBER)
    n_gt1_before = excl_count_above(gt1_in8)
    c1 = jnp.where(n_gt1_before > 0, 0, jnp.minimum(1 + rank, 3))
    c2_avail = n_gt1_before == 0                         # abs_flag unused yet

    nnz_cg0 = nzcg0.sum(-1)
    has_gt1_cg = gt1_in8.any(-1)

    # ctx-set bit: previous *coded* subset had a greater1 (c1 ended 0).
    # Running "flag of the nearest coded CG above" via cummax of
    # 2*sub + flag over coded subsets, scanned from the high end.
    tag = jnp.where(nnz_cg0 > 0,
                    2 * subs + has_gt1_cg.astype(jnp.int32), -1)
    m = jax.lax.cummax(tag, axis=tag.ndim - 1, reverse=True)
    # nearest coded CG at s' >= s+1: shift left by one
    pad = jnp.full((*batch, 1), -1, jnp.int32)
    m_above = jnp.concatenate([m[..., 1:], pad], axis=-1)
    prev_gt1 = jnp.where(m_above >= 0, m_above & 1, 0)
    if is_luma:
        ctx_set = jnp.where(subs > 0, 2, 0) + prev_gt1
    else:
        ctx_set = prev_gt1

    # per-rank Golomb-Rice param (frozen evolution over L0, coding order)
    order = jnp.argsort(jnp.where(nzcg0, -i16 - 1, 1), axis=-1)
    ar = jnp.take_along_axis(l0cg, order, -1)            # rank-ordered |L0|
    escape = ((nnz_cg0 > C1FLAG_NUMBER)
              | (gt1_in8.sum(-1) >= 2)
              | (ar[..., :C1FLAG_NUMBER] > 2).any(-1))
    rice_r = jnp.zeros_like(nnz_cg0)
    first2 = jnp.ones_like(nnz_cg0)
    one_cg = jnp.ones_like(nnz_cg0)
    rice_cols = []
    for r in range(16):
        rice_cols.append(rice_r)
        val = ar[..., r]
        active = escape & (r < nnz_cg0)
        base = (2 + first2) if r < C1FLAG_NUMBER else one_cg
        has_rem = active & (val >= base)
        rice_r = jnp.where(
            has_rem & (val > jnp.left_shift(3 * one_cg, rice_r)),
            jnp.minimum(rice_r + 1, 4), rice_r)
        first2 = jnp.where(active & (val >= 2), 0, first2)
    rice_ranked = jnp.stack(rice_cols, -1)               # [..., ncg, 16]
    rice = jnp.take_along_axis(rice_ranked, rank, -1)

    # ---- per-coefficient candidate rates (HM xGetICRate) -----------------
    cost_one = jnp.asarray(t["cost_one"])                # [nset, 4, 2]
    cost_abs = jnp.asarray(t["cost_abs"])                # [nset, 2]
    set_b = jnp.broadcast_to(ctx_set[..., None], rank.shape)
    one0 = cost_one[set_b, c1, 0]
    one1 = cost_one[set_b, c1, 1]
    abs0 = cost_abs[set_b, 0]
    abs1 = cost_abs[set_b, 1]

    def lvl_rate_cg(l):
        """Rate of abs level l (excl. sig flag, incl. 1 sign bin).
        l: [..., ncg, 16] int32 -> float32."""
        g1 = _golomb_bits(jnp.maximum(l - 1, 0), rice)
        g2 = _golomb_bits(jnp.maximum(l - 2, 0), rice)
        g3 = _golomb_bits(jnp.maximum(l - 3, 0), rice)
        r2 = one1 + jnp.where(c2_avail, abs0, g2)
        r3 = one1 + jnp.where(c2_avail, abs1 + g3, g2)
        r_in8 = jnp.where(l == 1, one0, jnp.where(l == 2, r2, r3))
        rate = jnp.where(rank >= C1FLAG_NUMBER, g1, r_in8)
        return jnp.where(l > 0, rate + 1.0, 0.0).astype(jnp.float32)

    def lvl_rate(l):
        return lvl_rate_cg(l.reshape(*batch, ncg, 16)).reshape(*batch, nn)

    # sig-flag pricing: coded below last, skipping the inferred
    # first-in-CG bin (mirrors ops/bits_exact)
    cg_flag0 = cg_nz0 | (subs == 0) | (subs == last_cg0[..., None])
    nz_above0 = (nzcg0 & (i16 > 0)).any(-1)
    infer_skip = ((k_idx & 15) == 0) & (sub_of_k != 0) \
        & ~jnp.take(nz_above0, sub_of_k, axis=-1)
    sig_coded = (k_idx < last0[..., None]) \
        & jnp.take(cg_flag0, sub_of_k, axis=-1) & ~infer_skip
    cost_sig = jnp.asarray(t["cost_sig"])                # [npat, nn, 2]
    if t["cost_sig"].shape[0] > 1:
        pat_k = jnp.take(pattern, sub_of_k, axis=-1)
    else:
        pat_k = jnp.zeros((*batch, nn), jnp.int32)
    sig0 = jnp.where(sig_coded, cost_sig[pat_k, k_idx, 0], 0.0)
    sig1 = jnp.where(sig_coded, cost_sig[pat_k, k_idx, 1], 0.0)

    # ---- 3-way decision {0, lo, hi} --------------------------------------
    is_last0 = k_idx == last0[..., None]
    lo_eff = jnp.where(is_last0, jnp.maximum(lo, 1), lo)
    c_hi = dist(hi) + lam32 * (lvl_rate(hi) + sig1)
    c_lo = dist(lo_eff) + lam32 * (lvl_rate(lo_eff) + sig1)
    c_z = dist(jnp.zeros_like(hi)) + lam32 * sig0
    take_lo = (c_lo <= c_hi) & (lo_eff > 0) & (lo_eff < hi)
    lv = jnp.where(take_lo, lo_eff, hi)
    cv = jnp.where(take_lo, c_lo, c_hi)
    lv = jnp.where(~is_last0 & (c_z <= cv), 0, lv)
    L1 = jnp.where(nz0, lv, 0)

    # ---- CG zeroing (csbf saving; HM d64CostZeroCG) ----------------------
    l1cg = L1.reshape(*batch, ncg, 16)
    sig_cg = jnp.where(l1cg > 0,
                       sig1.reshape(*batch, ncg, 16),
                       sig0.reshape(*batch, ncg, 16))
    keep_cost = (dist(L1).reshape(*batch, ncg, 16)
                 + lam32 * (lvl_rate_cg(l1cg) + sig_cg)).sum(-1)
    d0 = dist(jnp.zeros_like(L1))
    d0cg = d0.reshape(*batch, ncg, 16)
    zero_cost = d0cg.sum(-1)
    cost_cg = jnp.asarray(t["cost_cg"])                  # [inc, bin]
    csbf_coded = (subs >= 1) & (subs < last_cg0[..., None])
    keep_cost = keep_cost + jnp.where(
        csbf_coded, lam32 * cost_cg[(pattern > 0).astype(jnp.int32), 1],
        0.0)
    zero_cost = zero_cost + jnp.where(
        csbf_coded, lam32 * cost_cg[(pattern > 0).astype(jnp.int32), 0],
        0.0)
    zero_cg = csbf_coded & (zero_cost <= keep_cost) & ENABLE_CG_ZERO
    L2 = jnp.where(jnp.repeat(zero_cg, 16, axis=-1), 0, L1)

    # ---- last-position sweep (HM's best-last scan) -----------------------
    cg_nz2 = (L2.reshape(*batch, ncg, 16) > 0).any(-1)
    coded_pos2 = jnp.take(cg_nz2, sub_of_k, axis=-1)
    rate2 = lvl_rate(L2) + jnp.where(L2 > 0, sig1, sig0)
    dcost = jnp.where(coded_pos2, dist(L2) + lam32 * rate2, d0)
    P = jnp.cumsum(dcost, -1) - dcost                    # exclusive prefix
    Pd0_inc = jnp.cumsum(d0, -1)
    tot_d0 = Pd0_inc[..., -1]
    Z = tot_d0[..., None] - Pd0_inc                      # suffix dist0

    csbf_rate = jnp.where(
        csbf_coded,
        cost_cg[(pattern > 0).astype(jnp.int32), cg_nz2.astype(jnp.int32)],
        0.0)
    csbf_pref = jnp.cumsum(csbf_rate, -1) - csbf_rate    # sum over g<s, g>=1

    cost_last = jnp.asarray(t["cost_last"])
    gt1_2 = (L2 > 1).astype(jnp.int32)
    sfx_gt1 = jnp.cumsum(gt1_2[..., ::-1], -1)[..., ::-1] - gt1_2
    cand = (L2 > 0) & (sfx_gt1 == 0)
    total_k = (P + lam32 * jnp.take(csbf_pref, sub_of_k, axis=-1)
               + dist(L2)
               + lam32 * (lvl_rate(L2) + cost_last[k_idx]) + Z)
    total_k = jnp.where(cand, total_k, jnp.float32(3.4e38))
    best_k = jnp.argmin(total_k, -1)
    best_cost = jnp.take_along_axis(total_k, best_k[..., None], -1)[..., 0]
    all_zero = (tot_d0 <= best_cost) | ~cand.any(-1)

    keep = (k_idx <= best_k[..., None]) & ~all_zero[..., None]
    L3 = jnp.where(keep, L2, 0) if ENABLE_LAST_SWEEP else L2

    out = jnp.take(L3, jnp.asarray(_inv_scan(scan_type, n)), axis=-1)
    out = jnp.where(sign_r, -out, out).astype(jnp.int32)
    return out.reshape(coef.shape)


def rd_quantize_trellis_np(coef, qp: int, lam, **kw):
    """Host twin: the same jitted decisions on the CPU backend."""
    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(rd_quantize_trellis(
            jnp.asarray(np.asarray(coef, np.int32)), qp, lam, **kw))
