"""MXU formulation of the 35-mode intra prediction + SATD search.

Every HEVC intra prediction (planar / angular, incl. the VER/HOR edge
smoothing) is an integer-linear function of the boundary reference
samples followed by one floor-shift — so predicting ALL modes for a
node is ONE matmul `refs [B, 2R+1] x W [2R+1, 35*n*n]` against a
precomputed integer weight matrix (DC is the lone exception: its
interior value is floored before the edge rows reuse it, so it gets a
tiny vector epilogue). This replaces the reference's per-mode scalar
loops (TComPrediction.cpp:412 predIntraAng) and our gather-table
formulation (ops/intra.predict_all_modes) with systolic-array work —
the op the TPU is built for. Products stay < 2^24, so f32 matmuls at
precision=HIGHEST are bit-exact vs the integer reference.

`satd_all_modes` additionally folds the Hadamard-SATD mode metric
(TComRdCost.cpp xCalcHADs8x8 semantics via ops/cost.satd) over the
predicted blocks; on TPU a Pallas kernel fuses matmul + floor + SATD in
VMEM to avoid materializing the 35x prediction blowup in HBM.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import cost, intra


@functools.lru_cache(maxsize=None)
def _tables(n: int, component: str = "luma", bit_depth: int = 8):
    """Build (W [2R+2, 35*n*n] f32, inv_shift [35*n*n] f32,
    clip_mask [35*n*n] bool) — integer weights over the concatenated
    (unfiltered refs, filtered refs, bias) vector.

    Column layout: mode-major, then y, then x. DC columns are zero
    (handled by the exact epilogue in predict_all_modes_mm)."""
    R = 4 * n + 1
    ncol = 35 * n * n
    W = np.zeros((2 * R + 1, ncol), np.float32)
    shift = np.zeros(ncol, np.int32)
    clip = np.zeros(ncol, bool)
    fmask = np.array([intra.ref_filter_flag(m, n) for m in range(35)],
                     bool)
    log2n = n.bit_length() - 1
    bias_row = 2 * R

    def col(m, y, x):
        return (m * n + y) * n + x

    # r layout (ops/refs): r[2n-1-j] = left[j], r[2n] = corner,
    # r[2n+1+i] = top[i]
    def left_row(j, base):
        return base + 2 * n - 1 - j

    def top_row(i, base):
        return base + 2 * n + 1 + i

    corner_row = lambda base: base + 2 * n

    # planar (mode 0)
    base = R if fmask[0] else 0
    for y in range(n):
        for x in range(n):
            c = col(0, y, x)
            W[left_row(y, base), c] += n - 1 - x
            W[top_row(n, base), c] += x + 1          # top-right
            W[top_row(x, base), c] += n - 1 - y
            W[left_row(n, base), c] += y + 1         # bottom-left
            W[bias_row, c] += n
            shift[c] = log2n + 1

    # angular modes 2..34
    for m in range(2, 35):
        base = R if fmask[m] else 0
        i0, i1, fa = intra._angular_tables(m, n)
        for y in range(n):
            for x in range(n):
                c = col(m, y, x)
                W[base + i0[y, x], c] += 32 - fa[y, x]
                W[base + i1[y, x], c] += fa[y, x]
                W[bias_row, c] += 16
                shift[c] = 5
        if component == "luma" and n < 32:
            if m == intra.VER:
                # pred[y][0] = clip(top[0] + ((left[y]-corner)>>1))
                #            = clip((2*top[0] + left[y] - corner) >> 1)
                for y in range(n):
                    c = col(m, y, 0)
                    W[:, c] = 0.0
                    W[top_row(0, base), c] = 2
                    W[left_row(y, base), c] = 1
                    W[corner_row(base), c] = -1
                    shift[c] = 1
                    clip[c] = True
            elif m == intra.HOR:
                for x in range(n):
                    c = col(m, 0, x)
                    W[:, c] = 0.0
                    W[left_row(0, base), c] = 2
                    W[top_row(x, base), c] = 1
                    W[corner_row(base), c] = -1
                    shift[c] = 1
                    clip[c] = True

    inv_shift = (2.0 ** -shift).astype(np.float32)
    return W, inv_shift, clip


def _dc_block(r_u, n, component, bit_depth):
    """Exact DC prediction [B, n, n] (interior floor + edge smoothing,
    predict_all_modes DC path)."""
    B = r_u.shape[0]
    log2n = int(n).bit_length() - 1
    left = r_u[:, 2 * n - 1::-1]
    top = r_u[:, 2 * n + 1:]
    T = top[:, :n]
    Lf = left[:, :n]
    dc = (T.sum(1) + Lf.sum(1) + n) >> (log2n + 1)
    dcp = jnp.broadcast_to(dc[:, None, None], (B, n, n))
    if component == "luma" and n < 32:
        row0 = (T + 3 * dc[:, None] + 2) >> 2
        col0 = (Lf + 3 * dc[:, None] + 2) >> 2
        c00 = (Lf[:, 0] + 2 * dc + T[:, 0] + 2) >> 2
        dcp = dcp.at[:, 0, :].set(row0)
        dcp = dcp.at[:, :, 0].set(col0)
        dcp = dcp.at[:, 0, 0].set(c00)
    return dcp


def predict_all_modes_mm(r_u, r_f, n, *, component="luma", bit_depth=8):
    """All 35 modes via one MXU matmul; bit-exact vs the per-mode-
    selected (filtered/unfiltered) gather formulation:
    jnp.where(fmask, predict_all_modes(r_f), predict_all_modes(r_u)).

    r_u/r_f: [B, 4n+1] substituted refs, unfiltered / filtered.
    Returns [B, 35, n, n] int32.
    """
    W, inv_shift, clip = _tables(n, component, bit_depth)
    r_u = jnp.asarray(r_u, jnp.int32)
    B = r_u.shape[0]
    refs = jnp.concatenate(
        [r_u, jnp.asarray(r_f, jnp.int32),
         jnp.ones((B, 1), jnp.int32)], axis=1).astype(jnp.float32)
    raw = jnp.dot(refs, jnp.asarray(W),
                  precision=jax.lax.Precision.HIGHEST)
    pred = jnp.floor(raw * jnp.asarray(inv_shift))
    maxv = float((1 << bit_depth) - 1)
    pred = jnp.where(jnp.asarray(clip), jnp.clip(pred, 0.0, maxv), pred)
    pred = pred.astype(jnp.int32).reshape(B, 35, n, n)
    return pred.at[:, 1].set(_dc_block(r_u, n, component, bit_depth))


#: observability for the bench / driver: "pallas" once the kernel path
#: has been traced, "xla-fallback:<err>" if the kernel raised and the
#: matmul path took over, "xla" when pallas is off for the backend.
LAST_SATD_PATH = "unused"


def satd_all_modes(r_u, r_f, orig, n, *, component="luma", bit_depth=8):
    """[B, 35] Hadamard SATD of every intra mode vs `orig` [B, n, n]."""
    global LAST_SATD_PATH
    if _use_pallas():
        try:
            out = _satd_all_modes_pallas(r_u, r_f, orig, n,
                                         component=component,
                                         bit_depth=bit_depth)
            LAST_SATD_PATH = "pallas"
            return out
        except Exception as e:
            # loud one-time warning: a silently-skipped kernel would
            # make the bench measure the XLA path unnoticed
            if not LAST_SATD_PATH.startswith("xla-fallback"):
                import logging
                logging.getLogger(__name__).warning(
                    "pallas satd kernel failed (n=%d): %s -- falling "
                    "back to the XLA matmul path", n, e)
            LAST_SATD_PATH = f"xla-fallback:{type(e).__name__}"
    else:
        LAST_SATD_PATH = "xla"
    preds = predict_all_modes_mm(r_u, r_f, n, component=component,
                                 bit_depth=bit_depth)
    block = 4 if n == 4 else 8
    return cost.satd(jnp.asarray(orig, jnp.int32)[:, None], preds,
                     block=block)


# ---------------------------------------------------------------------------
# Pallas fusion (TPU): matmul + floor/clip + Hadamard SATD in VMEM.
# ---------------------------------------------------------------------------

def _use_pallas() -> bool:
    env = os.environ.get("HEVC_TPU_PALLAS", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    try:
        # the effective default device, not devices()[0]: a TPU plugin
        # can register while the session computes on a pinned CPU
        # backend (jax_default_device in the test conftest).
        dd = jax.config.jax_default_device
        if dd is not None:
            return dd.platform == "tpu"
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _hadamard(k: int) -> np.ndarray:
    h = np.array([[1]], np.float32)
    while h.shape[0] < k:
        h = np.block([[h, h], [h, -h]])
    return h


@functools.lru_cache(maxsize=None)
def _satd_ops(n: int):
    """Flattened-layout SATD operators: M [n*n, n*n] applies the 2-sided
    kxk Hadamard per block on vec(d) (vec(H d H) = (H (x) H) vec(d),
    block-permuted); G [n*n, nb*nb] sums |t| per Hadamard block."""
    k = 4 if n == 4 else 8
    nb = n // k
    h = _hadamard(k)
    M = np.zeros((n * n, n * n), np.float32)
    G = np.zeros((n * n, nb * nb), np.float32)
    for by in range(nb):
        for bx in range(nb):
            for i in range(k):
                for ll in range(k):
                    out_p = (by * k + i) * n + bx * k + ll
                    G[out_p, by * nb + bx] = 1.0
                    for j in range(k):
                        for m in range(k):
                            in_p = (by * k + j) * n + bx * k + m
                            M[in_p, out_p] += h[i, j] * h[ll, m]
    return M, G, k


def _satd_all_modes_pallas(r_u, r_f, orig, n, *, component, bit_depth,
                           interpret=None):
    """Fused MXU kernel, grid = (node tiles, 35 modes): per step one
    [T, R2] x [R2, n*n] prediction matmul + floor/clip + the Hadamard
    SATD as two more matmuls, all resident in VMEM — the 35x prediction
    blowup never touches HBM. DC (mode 1) is floored-nonlinear, so its
    column is overwritten with the exact XLA value afterwards."""
    from jax.experimental import pallas as pl

    W, inv_shift, clip = _tables(n, component, bit_depth)
    M, G, k = _satd_ops(n)
    n2 = n * n
    r_u = jnp.asarray(r_u, jnp.int32)
    B = r_u.shape[0]
    refs = jnp.concatenate(
        [r_u, jnp.asarray(r_f, jnp.int32),
         jnp.ones((B, 1), jnp.int32)], axis=1).astype(jnp.float32)
    R2 = refs.shape[1]

    T = 256 if n <= 8 else 64                  # node tile
    Bp = -(-B // T) * T
    if Bp != B:
        refs = jnp.pad(refs, ((0, Bp - B), (0, 0)))
        orig = jnp.pad(jnp.asarray(orig, jnp.int32),
                       ((0, Bp - B), (0, 0), (0, 0)))
    orig_f = jnp.asarray(orig, jnp.float32).reshape(Bp, n2)

    maxv = float((1 << bit_depth) - 1)
    round_mul = 0.25 if k == 8 else 0.5
    round_add = 2.0 if k == 8 else 1.0

    # Mosaic block rule: the LAST TWO dims of every block must divide
    # (8, 128) or equal the array dims — so per-mode operands are
    # reshaped mode-major-3D (the mode picks a leading-dim block, the
    # trailing dims stay whole) and the output is 4D (35, tiles, T, 1).
    W3 = jnp.asarray(W.T.reshape(35, n2, R2).transpose(0, 2, 1))
    inv3 = jnp.asarray(inv_shift.reshape(35, 1, n2))
    clip3 = jnp.asarray(clip.astype(np.float32).reshape(35, 1, n2))

    def kernel(refs_ref, orig_ref, w_ref, inv_ref, clip_ref, m_ref,
               g_ref, out_ref):
        raw = jnp.dot(refs_ref[:], w_ref[0],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        pred = jnp.floor(raw * inv_ref[0])
        pred = jnp.where(clip_ref[0] > 0.5, jnp.clip(pred, 0.0, maxv),
                         pred)
        d = pred - orig_ref[:]                 # [T, n2]
        t = jnp.dot(d, m_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        s = jnp.dot(jnp.abs(t), g_ref[:],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        s = jnp.floor((s + round_add) * round_mul)
        out_ref[0, 0, 0] = jnp.sum(s, axis=-1)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        grid=(Bp // T, 35),
        in_specs=[
            pl.BlockSpec((T, R2), lambda i, j: (i, 0)),
            pl.BlockSpec((T, n2), lambda i, j: (i, 0)),
            pl.BlockSpec((1, R2, n2), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, n2), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, n2), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((n2, n2), lambda i, j: (0, 0)),
            pl.BlockSpec((n2, G.shape[1]), lambda i, j: (0, 0)),
        ],
        # output (35, tiles, 1, T): the singleton sits on the SUBLANE
        # axis (padded 1 -> 8), keeping the per-instance store static —
        # the previous (..., T, 1) layout put it on the LANE axis
        # (padded 1 -> 128), ballooning the NxN depth-4 buffer to
        # 18.7 GB and OOMing 8-frame batches.
        out_specs=pl.BlockSpec((1, 1, 1, T), lambda i, j: (j, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((35, Bp // T, 1, T), jnp.float32),
        interpret=interpret,
    )(refs, orig_f, W3, inv3, clip3, jnp.asarray(M), jnp.asarray(G))
    satd = out.reshape(35, Bp)[:, :B].T.astype(jnp.int32)

    # exact DC (floored interior reused by the edge smoothing)
    dcp = _dc_block(r_u[:B] if Bp != B else r_u, n, component, bit_depth)
    block = 4 if n == 4 else 8
    dc_satd = cost.satd(jnp.asarray(orig, jnp.int32)[:B], dcp,
                        block=block)
    return satd.at[:, 1].set(dc_satd)
