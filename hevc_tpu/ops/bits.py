"""Syntax-aware coefficient-rate estimation for RDO.

Behavioral counterpart of HM's estBitsSbac tables inside
xRateDistOptQuant / the RD mode costs (TComTrQuant.cpp:2129,
TEncSbac codeCoeffNxN TEncSbac.cpp:1181): instead of a 2*log2|l| curve,
count the actual residual-syntax events of a TU — significance flags
over the coded region, coeff-group flags, greater1/greater2,
Golomb-Rice remaining, signs, last-position prefix/suffix — and charge
each class a fractional-bit weight. The weights are calibrated once
against the exact CABAC coder at slice-init context states
(tools/calibrate_bits.py regenerates them); context *adaptation* is
deliberately ignored, as in HM's per-TU estimates.

All features are computed vectorized over a batch of TUs with static
shapes — the estimator runs inside the jitted search at every tree node.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..entropy import scan as scanlib

FEATURE_NAMES = (
    "sig0", "sig1", "g1_0", "g1_1", "g2_cg", "g2_hit", "rem_log", "rem_n",
    "sign", "last_pre", "last_suf", "cg0", "cg1", "const")

# Calibrated per-event fractional-bit weights (tools/calibrate_bits.py:
# ridge-to-prior weighted least squares vs exact CABAC bits at init
# states; corpus = 2633 quantized TUs, sizes 4-32, QPs 22-37;
# mean relative error 11.8% luma / 13.4% chroma).
WEIGHTS_LUMA = np.array(
    [0.0481, 1.5114, 1.0321, 1.3343, 0.8896, 0.4585, 1.8529, 0.7107,
     0.9664, 0.9829, 1.2031, 0.0000, 1.9174, 1.6550], np.float32)
WEIGHTS_CHROMA = np.array(
    [0.0635, 1.6650, 1.0142, 1.3961, 0.8388, 0.4460, 1.9282, 0.7834,
     1.0104, 1.0564, 1.2143, 0.0000, 1.7840, 1.5453], np.float32)


@functools.lru_cache(maxsize=None)
def _scan_maps(n: int, scan_type: int = scanlib.SCAN_DIAG):
    """(scan_idx_of_raster [n*n], cg_scan_idx_of_raster [n*n])."""
    scan = scanlib.grouped_scan(scan_type, n)       # scan idx -> raster
    inv = np.empty(n * n, np.int32)
    inv[scan] = np.arange(n * n, dtype=np.int32)    # raster -> scan idx
    return inv, (inv >> 4).astype(np.int32)         # 16 coeffs per CG


def tu_features(levels, scan_type: int = scanlib.SCAN_DIAG):
    """Per-TU syntax event counts. levels: [..., n, n] int.

    Returns [..., len(FEATURE_NAMES)] float32. Empty TUs produce all-zero
    features (their cbf=0 cost belongs to the caller's per-CU overhead).
    """
    n = levels.shape[-1]
    batch = levels.shape[:-2]
    inv, cg_of = _scan_maps(n, scan_type)
    ncg2 = max(n // 4, 1) ** 2
    a = jnp.abs(levels.reshape(*batch, n * n)).astype(jnp.int32)
    nz = a > 0
    any_nz = nz.any(-1)

    s_idx = jnp.asarray(inv)                        # [n*n]
    last_scan = jnp.max(jnp.where(nz, s_idx, -1), axis=-1)   # [...]
    coded = (s_idx <= last_scan[..., None]) & (last_scan[..., None] >= 0)
    is_last = nz & (s_idx == last_scan[..., None])

    n_nz = nz.sum(-1).astype(jnp.float32)
    f_sig1 = n_nz - any_nz                           # nz excl last
    f_sig0 = (coded & ~nz).sum(-1).astype(jnp.float32)

    g1 = a >= 2
    f_g1_1 = g1.sum(-1).astype(jnp.float32)
    f_g1_0 = n_nz - f_g1_1

    # per-CG aggregates: one_hot [ncg2, n*n] over CG scan index
    one_hot = (jnp.arange(ncg2)[:, None] == jnp.asarray(cg_of)[None, :])

    def per_cg(mask):                                # [..., n*n] -> [..., ncg2]
        return (mask[..., None, :] & one_hot).any(-1)

    cg_nz = per_cg(nz)
    f_g2 = per_cg(g1).sum(-1).astype(jnp.float32)    # one g2 flag per CG
    f_g2_hit = per_cg(a >= 3).sum(-1).astype(jnp.float32)

    last_cg = last_scan >> 4
    cg_scan = jnp.arange(ncg2)
    # CG flags are coded for scan idx 1..last_cg-1 (0 and last inferred)
    cg_rng = (cg_scan >= 1) & (cg_scan < last_cg[..., None])
    f_cg1 = (cg_rng & cg_nz).sum(-1).astype(jnp.float32)
    f_cg0 = (cg_rng & ~cg_nz).sum(-1).astype(jnp.float32)

    rem = jnp.maximum(a - 3, 0)
    f_rem_log = jnp.where(rem > 0,
                          jnp.log2(rem.astype(jnp.float32) + 1.0),
                          0.0).sum(-1)
    f_rem_n = (rem > 0).sum(-1).astype(jnp.float32)

    f_sign = n_nz

    # last position prefix/suffix over x and y
    last_raster = jnp.argmax(is_last, axis=-1)
    ly, lx = last_raster // n, last_raster % n
    gidx = jnp.asarray(scanlib.GROUP_IDX)
    gx, gy = jnp.take(gidx, lx), jnp.take(gidx, ly)
    f_lpre = (gx + gy + 2).astype(jnp.float32)
    f_lsuf = (jnp.where(gx > 3, (gx - 2) >> 1, 0)
              + jnp.where(gy > 3, (gy - 2) >> 1, 0)).astype(jnp.float32)

    feats = jnp.stack([f_sig0, f_sig1, f_g1_0, f_g1_1, f_g2, f_g2_hit,
                       f_rem_log, f_rem_n, f_sign, f_lpre, f_lsuf,
                       f_cg0, f_cg1,
                       jnp.ones_like(f_sign)], axis=-1)
    return jnp.where(any_nz[..., None], feats, 0.0)


def tu_bits(levels, *, is_luma: bool = True,
            scan_type: int = scanlib.SCAN_DIAG):
    """Estimated CABAC bits of one TU's residual syntax.
    levels: [..., n, n] -> [...] float32 (0 for all-zero TUs)."""
    w = jnp.asarray(WEIGHTS_LUMA if is_luma else WEIGHTS_CHROMA)
    return tu_features(levels, scan_type) @ w
