"""HEVC integer transforms (4/8/16/32 DCT-II approximation + 4x4 DST-VII).

Bit-exact integer math per ITU-T H.265 sections 8.6.3/8.6.4, formulated as
batched int32 matrix products so XLA can tile them onto the TPU MXU (the
reference implements the same math as scalar partial butterflies,
HM TComTrQuant.cpp:388-841 — behavioral reference only).

Exactness notes:
  * All arithmetic is int32; dynamic ranges stay well inside 32 bits
    (coefficients are 16-bit, matrix entries 8-bit, N<=32 accumulation).
  * The *inverse* transform is normative (decoder must match): stage-1
    output is clipped to int16 per spec 8.6.4.2; our reconstruction uses
    exactly this path so encoder recon == decoder recon.
  * The forward transform mirrors HM's two-stage rounding shifts so RD
    costs and coefficient streams match HM quality.

Transform matrices are generated from the standard's quantized cosine
table via T_N[k][n] = C[((2n+1) * k * (32/N)) mod 128] — verified by
tests against the published 4x4/8x8 tables and symmetry properties.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_TR_DYNAMIC_RANGE = 15          # Main profile, extended_precision off
COEFF_MIN, COEFF_MAX = -32768, 32767

# Quantized-cosine half tables of the HEVC core transform (H.265 Table in
# 8.6.4; public standard constants).
_L32 = [90, 90, 88, 85, 82, 78, 73, 67, 61, 54, 46, 38, 31, 22, 13, 4]
_L16 = [90, 87, 80, 70, 57, 43, 25, 9]
_L8 = [89, 75, 50, 18]
_L4 = [83, 36]

_DST4 = np.array([
    [29, 55, 74, 84],
    [74, 74, 0, -74],
    [84, -29, -74, 55],
    [55, -84, 74, -29],
], dtype=np.int32)


def _cos_table() -> np.ndarray:
    """C[a] for a in [0, 128): quantized 64*sqrt(2)*cos(a*pi/64)."""
    c = np.zeros(128, np.int64)
    base = np.zeros(33, np.int64)
    base[0] = 64
    base[32] = 0
    for j, v in enumerate(_L32):
        base[2 * j + 1] = v
    for j, v in enumerate(_L16):
        base[2 + 4 * j] = v
    for j, v in enumerate(_L8):
        base[4 + 8 * j] = v
    for j, v in enumerate(_L4):
        base[8 + 16 * j] = v
    base[16] = 64
    for a in range(128):
        if a <= 32:
            c[a] = base[a]
        elif a <= 64:
            c[a] = -base[64 - a]
        else:
            c[a] = -c[a - 64]
    return c.astype(np.int32)


@functools.lru_cache(maxsize=None)
def dct_matrix(n: int) -> np.ndarray:
    """The N x N HEVC core (DCT-II-like) forward matrix, int32."""
    assert n in (4, 8, 16, 32)
    c = _cos_table()
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    idx = ((2 * m + 1) * k * (32 // n)) % 128
    return c[idx].astype(np.int32)


@functools.lru_cache(maxsize=None)
def dst_matrix() -> np.ndarray:
    """The 4x4 DST-VII matrix used for intra 4x4 luma TUs."""
    return _DST4.copy()


def _rs(x, shift):
    """Rounding right-shift on int32: (x + (1 << (shift-1))) >> shift."""
    return (x + (1 << (shift - 1))) >> shift


def _mat(n, use_dst):
    t = dst_matrix() if (use_dst and n == 4) else dct_matrix(n)
    return jnp.asarray(t, jnp.int32)


def forward_transform(resi, *, use_dst=False, bit_depth=8):
    """Forward 2-D transform of residual blocks.

    Args:
      resi: [..., N, N] int32 residual (orig - pred), range +-(2^bd - 1).
      use_dst: use DST-VII (only valid for N == 4; intra luma 4x4).
      bit_depth: sample bit depth.

    Returns:
      [..., N, N] int32 coefficients (16-bit range).

    HM shift scheme (TComTrQuant.cpp partialButterfly*): stage 1 (vertical)
    shift = log2N + bit_depth - 9; stage 2 (horizontal) shift = log2N + 6.
    """
    n = resi.shape[-1]
    log2n = int(n).bit_length() - 1
    t = _mat(n, use_dst)
    s1 = log2n + bit_depth - 9
    s2 = log2n + 6
    x = resi.astype(jnp.int32)
    # stage 1: tmp[k, j] = sum_i T[k, i] * x[i, j]
    tmp = _rs(jnp.einsum("ki,...ij->...kj", t, x,
                         preferred_element_type=jnp.int32), s1)
    # stage 2: out[k, l] = sum_j tmp[k, j] * T[l, j]
    out = _rs(jnp.einsum("...kj,lj->...kl", tmp, t,
                         preferred_element_type=jnp.int32), s2)
    return out


def inverse_transform(coeff, *, use_dst=False, bit_depth=8):
    """Normative inverse 2-D transform (H.265 8.6.4.2).

    Stage 1 output is clipped to [-32768, 32767]; stage 2 applies the
    bit-depth shift. Returns int32 residual.
    """
    n = coeff.shape[-1]
    t = _mat(n, use_dst)
    s1 = 7
    s2 = 20 - bit_depth  # 12 for 8-bit
    c = coeff.astype(jnp.int32)
    # stage 1 (columns): e[i, j] = sum_k T[k, i] * c[k, j]  (T transposed)
    tmp = _rs(jnp.einsum("ki,...kj->...ij", t, c,
                         preferred_element_type=jnp.int32), s1)
    tmp = jnp.clip(tmp, COEFF_MIN, COEFF_MAX)
    # stage 2 (rows): r[i, j] = sum_l T[l, j] * tmp[i, l]
    out = _rs(jnp.einsum("...il,lj->...ij", tmp, t,
                         preferred_element_type=jnp.int32), s2)
    return jnp.clip(out, COEFF_MIN, COEFF_MAX)


# ---------------------------------------------------------------------------
# NumPy oracle (python-int exact, independent of XLA) for golden tests.
# ---------------------------------------------------------------------------

def forward_transform_np(resi, *, use_dst=False, bit_depth=8):
    resi = np.asarray(resi, np.int64)
    n = resi.shape[-1]
    log2n = int(n).bit_length() - 1
    t = (dst_matrix() if (use_dst and n == 4) else dct_matrix(n)).astype(np.int64)
    s1 = log2n + bit_depth - 9
    s2 = log2n + 6
    tmp = (np.einsum("ki,...ij->...kj", t, resi) + (1 << (s1 - 1))) >> s1
    out = (np.einsum("...kj,lj->...kl", tmp, t) + (1 << (s2 - 1))) >> s2
    return out.astype(np.int32)


def inverse_transform_np(coeff, *, use_dst=False, bit_depth=8):
    coeff = np.asarray(coeff, np.int64)
    n = coeff.shape[-1]
    t = (dst_matrix() if (use_dst and n == 4) else dct_matrix(n)).astype(np.int64)
    s1 = 7
    s2 = 20 - bit_depth
    tmp = (np.einsum("ki,...kj->...ij", t, coeff) + (1 << (s1 - 1))) >> s1
    tmp = np.clip(tmp, COEFF_MIN, COEFF_MAX)
    out = (np.einsum("...il,lj->...ij", tmp, t) + (1 << (s2 - 1))) >> s2
    return np.clip(out, COEFF_MIN, COEFF_MAX).astype(np.int32)
