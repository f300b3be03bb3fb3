"""HEVC scalar quantization / normative dequantization.

Behavioral reference: HM TComTrQuant.cpp xQuant (:1126) / xDeQuant; the
normative dequant is H.265 8.6.3 with flat (m=16) scaling lists — scaling
lists stay disabled in our SPS/PPS.

All math is int32-exact; value-range analysis in comments guarantees no
overflow for conformant levels (quant clamps levels accordingly).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

QUANT_SCALES = (26214, 23302, 20560, 18396, 16384, 14564)     # g_quantScales
INV_QUANT_SCALES = (40, 45, 51, 57, 64, 72)                   # g_invQuantScales
QUANT_SHIFT = 14
MAX_TR_DYNAMIC_RANGE = 15

# H.265 Table 8-10: chroma QP mapping for 4:2:0.
_CHROMA_QP_TABLE = np.array(
    [29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37], np.int32)

# full 0..57 -> chroma QP map (Table 8-10 applied to every index), so the
# mapping is one gather under jit when qp is traced.
_CHROMA_QP_FULL = np.array(
    [q if q < 30 else (q - 6 if q > 43 else int(_CHROMA_QP_TABLE[q - 30]))
     for q in range(58)], np.int32)


def is_static_qp(qp) -> bool:
    """True when qp is a Python/NumPy integer (compile-time constant)."""
    return isinstance(qp, (int, np.integer))


def chroma_qp(qp_y, offset: int = 0):
    """Luma QP -> chroma QP (4:2:0). Accepts a Python int (returns int)
    or a traced/array qp (returns the gathered jnp value)."""
    if is_static_qp(qp_y):
        q = int(np.clip(qp_y + offset, 0, 57))
        return int(_CHROMA_QP_FULL[q])
    q = jnp.clip(jnp.asarray(qp_y, jnp.int32) + offset, 0, 57)
    return jnp.asarray(_CHROMA_QP_FULL)[q]


def _qbits(qp: int, log2n: int, bit_depth: int) -> int:
    transform_shift = MAX_TR_DYNAMIC_RANGE - bit_depth - log2n
    return QUANT_SHIFT + qp // 6 + transform_shift


def _bcast_qp(qp, ndim):
    """Traced/array qp -> int32 broadcastable against [..., N, N] blocks.
    A qp with k >= 1 dims indexes the leading k batch dims of the block
    tensor (per-block QP, the cu_qp_delta / LCU-rate-control path)."""
    q = jnp.asarray(qp, jnp.int32)
    if q.ndim:
        q = q.reshape(q.shape + (1,) * (ndim - q.ndim))
    return q


def quantize(coeff, qp, *, is_intra: bool = True, bit_depth: int = 8):
    """Forward scalar quantization with HM's intra/inter dead-zone offset.

    Args:
      coeff: [..., N, N] int32 transform coefficients.
      qp: quantization parameter — python int (compile-time constant),
        traced scalar, or per-block array broadcast over the leading
        batch dims (LCU-level rate control).
    Returns:
      [..., N, N] int32 quantized levels.
    """
    n = coeff.shape[-1]
    log2n = int(n).bit_length() - 1
    c = coeff.astype(jnp.int32)
    if is_static_qp(qp):
        qbits = _qbits(qp, log2n, bit_depth)
        scale = QUANT_SCALES[qp % 6]
        add = (171 if is_intra else 85) << (qbits - 9)
        level = (jnp.abs(c) * scale + add) >> qbits
    else:
        q = _bcast_qp(qp, c.ndim)
        transform_shift = MAX_TR_DYNAMIC_RANGE - bit_depth - log2n
        qbits = QUANT_SHIFT + q // 6 + transform_shift
        scale = jnp.asarray(QUANT_SCALES, jnp.int32)[q % 6]
        add = jnp.left_shift(171 if is_intra else 85, qbits - 9)
        # |coeff| <= 32767, scale <= 26214 -> < 2^30; + add < 2^31. Exact.
        level = jnp.right_shift(jnp.abs(c) * scale + add, qbits)
    # Clamp so dequant stays in int32 (conformance): |level * invQ << per|
    # must fit; entropy coding also requires 16-bit levels.
    level = jnp.minimum(level, 32767)
    return jnp.where(c < 0, -level, level)


def dequantize(level, qp, *, bit_depth: int = 8):
    """Normative dequantization (H.265 8.6.3, flat scaling).

    HM formulation: shift = log2N - 1 (8-bit), scale = invQ[qp%6] << (qp/6);
    d = clip3(-32768, 32767, (level*scale + round) >> shift).
    qp may be static, traced, or a per-block array (see quantize).
    """
    n = level.shape[-1]
    log2n = int(n).bit_length() - 1
    transform_shift = MAX_TR_DYNAMIC_RANGE - bit_depth - log2n
    shift = (20 - QUANT_SHIFT) - transform_shift  # = log2N - 1 for 8-bit
    lv = level.astype(jnp.int32)
    if is_static_qp(qp):
        scale = INV_QUANT_SCALES[qp % 6] << (qp // 6)
    else:
        q = _bcast_qp(qp, lv.ndim)
        scale = jnp.left_shift(
            jnp.asarray(INV_QUANT_SCALES, jnp.int32)[q % 6], q // 6)
    # |level| <= 32767, scale <= 72 << 8 -> < 2^31. Exact.
    d = (lv * scale + (1 << (shift - 1))) >> shift
    return jnp.clip(d, -32768, 32767)


# ---------------------------------------------------------------------------
# NumPy oracles
# ---------------------------------------------------------------------------

def quantize_np(coeff, qp, *, is_intra=True, bit_depth=8):
    coeff = np.asarray(coeff, np.int64)
    n = coeff.shape[-1]
    log2n = int(n).bit_length() - 1
    qbits = _qbits(qp, log2n, bit_depth)
    scale = QUANT_SCALES[qp % 6]
    add = (171 if is_intra else 85) << (qbits - 9)
    level = np.minimum((np.abs(coeff) * scale + add) >> qbits, 32767)
    return np.where(coeff < 0, -level, level).astype(np.int32)


def dequantize_np(level, qp, *, bit_depth=8):
    level = np.asarray(level, np.int64)
    n = level.shape[-1]
    log2n = int(n).bit_length() - 1
    transform_shift = MAX_TR_DYNAMIC_RANGE - bit_depth - log2n
    shift = (20 - QUANT_SHIFT) - transform_shift
    scale = INV_QUANT_SCALES[qp % 6] << (qp // 6)
    d = (level * scale + (1 << (shift - 1))) >> shift
    return np.clip(d, -32768, 32767).astype(np.int32)
