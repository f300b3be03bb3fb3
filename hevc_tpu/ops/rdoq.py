"""Rate-distortion optimized quantization (vectorized RDOQ-lite).

HM's RDOQ (TComTrQuant.cpp:2129) is a sequential per-coefficient trellis
over scan order with CABAC-state-coupled rates — inherently serial. This
TPU formulation keeps the decisions data-parallel:

  1. per coefficient, choose level among {round(c/step), that-1, 0}
     minimizing  D(l) + lambda * R(l), with pixel-domain distortion
     D(l) = alpha(N) * (c - dequant(l))^2  (alpha measured from the
     actual inverse transform's unit-impulse energy) and a level-rate
     model R(l);
  2. per 4x4 coefficient group, zero the whole CG when that lowers
     total cost (the coded_sub_block_flag saving).

Typical gain vs plain dead-zone quantization: several percent rate at
equal PSNR; exact HM-RDOQ parity is a round-2 target (ROADMAP #1).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import quant, transforms

# Calibration knob for the rate weight (swept offline; see
# results_bdrate_gated.json). Applied identically in both twins.
LAMBDA_SCALE = float(os.environ.get("HEVC_TPU_RDOQ_LAMBDA_SCALE", "1.0"))

#: quantizer model: "lite" = the 3-way compare below with the per-level
#: approximate rate curve; "trellis" = ops/rdoq_trellis.py (exact
#: frozen-state CABAC rates + CG zeroing + last-position sweep, the HM
#: xRateDistOptQuant analogue).
RDOQ_MODEL = os.environ.get("HEVC_TPU_RDOQ", "lite")


@functools.lru_cache(maxsize=None)
def alpha(n: int, bit_depth: int = 8) -> float:
    """Pixel-domain SSE per unit squared dequantized-coefficient error.

    Measured: put a unit impulse in the (dequantized) coefficient domain,
    inverse-transform, take the output energy (averaged over positions).
    """
    total = 0.0
    cnt = 0
    for (i, j) in ((0, 0), (n // 2, n // 2), (n - 1, n - 1), (0, n - 1)):
        c = np.zeros((1, n, n), np.int64)
        c[0, i, j] = 1024  # scale up to dodge integer rounding, undo below
        r = transforms.inverse_transform_np(c, bit_depth=bit_depth)
        total += float((r.astype(np.float64) ** 2).sum()) / (1024.0 ** 2)
        cnt += 1
    return total / cnt


def _level_bits(l):
    """Approximate coding cost (bits) of an absolute level (jnp).

    The l >= 3 curve is a piecewise-LINEAR log2 (exponent + mantissa of
    the exact float32 representation of l+1): every operation is an
    exact elementwise float op, so NumPy, XLA (any backend) and the
    Pallas Mosaic kernel produce bit-identical costs — a transcendental
    log2 here would make RD decisions backend-dependent."""
    v = (l + 1).astype(jnp.float32)        # exact for l < 2^24
    bits32 = jax.lax.bitcast_convert_type(v, jnp.int32)
    e = ((bits32 >> 23) - 127).astype(jnp.float32)
    m = (bits32 & 0x7FFFFF).astype(jnp.float32) * jnp.float32(2.0 ** -23)
    return jnp.where(
        l == 0, 1.0,
        jnp.where(l == 1, 2.5,
                  jnp.where(l == 2, 4.0, 2.0 * (e + m) + 3.5)))


def rd_quantize(coef, qp: int, lam, *, is_intra=True, bit_depth=8,
                is_luma=True, init_type=None, ctx_qp=None):
    """RD-optimized quantization of [..., n, n] int32 coefficients.

    is_luma/init_type/ctx_qp select the context cost tables when
    RDOQ_MODEL == "trellis" (ignored by the lite model). init_type
    defaults to 0 (I slice) when is_intra else 1 (P slice)."""
    if RDOQ_MODEL == "trellis" and quant.is_static_qp(qp):
        # the trellis quantizer's context-cost tables are per-QP
        # trace-time constants; traced-QP programs use the lite model
        from . import rdoq_trellis
        return rdoq_trellis.rd_quantize_trellis(
            coef, qp, lam, is_luma=is_luma, is_intra=is_intra,
            init_type=(0 if is_intra else 1) if init_type is None
            else init_type, ctx_qp=ctx_qp, bit_depth=bit_depth)
    n = coef.shape[-1]
    log2n = int(n).bit_length() - 1
    a = jnp.abs(coef.astype(jnp.int32))
    sign = coef < 0

    # candidate levels: round-to-nearest and one below
    if quant.is_static_qp(qp):
        qbits = quant._qbits(qp, log2n, bit_depth)
        scale = quant.QUANT_SCALES[qp % 6]
        hi = (a * scale + (1 << (qbits - 1))) >> qbits
    else:
        q = quant._bcast_qp(qp, a.ndim)
        qbits = (quant.QUANT_SHIFT + q // 6
                 + quant.MAX_TR_DYNAMIC_RANGE - bit_depth - log2n)
        scale = jnp.asarray(quant.QUANT_SCALES, jnp.int32)[q % 6]
        hi = jnp.right_shift(a * scale + jnp.left_shift(1, qbits - 1),
                             qbits)
    hi = jnp.minimum(hi, 32767)
    lo = jnp.maximum(hi - 1, 0)

    al = jnp.float32(alpha(n, bit_depth))
    lam = jnp.asarray(lam, jnp.float32) * jnp.float32(LAMBDA_SCALE)
    if lam.ndim:                # per-block lambda (LCU rate control)
        lam = lam.reshape(lam.shape + (1,) * (a.ndim - lam.ndim))

    def cost(lv):
        deq = quant.dequantize(lv, qp, bit_depth=bit_depth)
        e = (a - deq).astype(jnp.float32)
        return al * e * e + lam * _level_bits(lv)

    zero = jnp.zeros_like(hi)
    c_hi, c_lo, c_z = cost(hi), cost(lo), cost(zero)
    lv = jnp.where((c_lo <= c_hi) & (lo > 0), lo, hi)
    cv = jnp.minimum(c_lo, c_hi)
    lv = jnp.where(c_z <= cv, zero, lv)
    cv = jnp.minimum(c_z, cv)

    # CG zeroing: compare kept cost vs all-zero cost per 4x4 group
    if n >= 8:
        g = n // 4
        def pool(x):
            s = x.shape
            return x.reshape(*s[:-2], g, 4, g, 4).sum((-3, -1))
        keep_cost = pool(cv)
        zero_cost = pool(cost(zero)) - lam * 1.0  # save the csbf bit
        zero_cg = (zero_cost <= keep_cost)[..., :, None, :, None]
        zero_cg = jnp.broadcast_to(
            zero_cg, lv.shape[:-2] + (g, 4, g, 4)).reshape(lv.shape)
        lv = jnp.where(zero_cg, 0, lv)

    return jnp.where(sign, -lv, lv)


def rd_quantize_np(coef, qp, lam, *, is_intra=True, bit_depth=8,
                   is_luma=True, init_type=None, ctx_qp=None):
    """NumPy twin for the golden encoder."""
    if RDOQ_MODEL == "trellis":
        from . import rdoq_trellis
        return rdoq_trellis.rd_quantize_trellis_np(
            coef, qp, lam, is_luma=is_luma, is_intra=is_intra,
            init_type=(0 if is_intra else 1) if init_type is None
            else init_type, ctx_qp=ctx_qp, bit_depth=bit_depth)
    coef = np.asarray(coef, np.int64)
    n = coef.shape[-1]
    log2n = int(n).bit_length() - 1
    qbits = quant._qbits(qp, log2n, bit_depth)
    scale = quant.QUANT_SCALES[qp % 6]
    a = np.abs(coef)
    sign = coef < 0
    hi = np.minimum((a * scale + (1 << (qbits - 1))) >> qbits, 32767)
    lo = np.maximum(hi - 1, 0)
    al = alpha(n, bit_depth)

    al = np.float32(al)
    lam = np.float32(lam * LAMBDA_SCALE)

    def bits(l):
        v = (l + 1).astype(np.float32)
        b32 = v.view(np.int32)
        e = ((b32 >> 23) - 127).astype(np.float32)
        m = (b32 & 0x7FFFFF).astype(np.float32) * np.float32(2.0 ** -23)
        return np.where(l == 0, np.float32(1.0),
                        np.where(l == 1, np.float32(2.5),
                                 np.where(l == 2, np.float32(4.0),
                                          (np.float32(2.0) * (e + m)
                                           + np.float32(3.5)))))

    def cost(lv):
        deq = quant.dequantize_np(lv, qp, bit_depth=bit_depth)
        e = (a - deq).astype(np.float32)
        return (al * e * e + lam * bits(lv)).astype(np.float32)

    zero = np.zeros_like(hi)
    c_hi, c_lo, c_z = cost(hi), cost(lo), cost(zero)
    lv = np.where((c_lo <= c_hi) & (lo > 0), lo, hi)
    cv = np.minimum(c_lo, c_hi)
    lv = np.where(c_z <= cv, zero, lv)
    cv = np.minimum(c_z, cv)
    if n >= 8:
        g = n // 4
        def pool(x):
            s = x.shape
            return x.reshape(*s[:-2], g, 4, g, 4).sum((-3, -1))
        keep_cost = pool(cv)
        zero_cost = pool(cost(zero)) - lam * 1.0
        zcg = (zero_cost <= keep_cost)
        zcg = np.repeat(np.repeat(zcg, 4, -1), 4, -2)
        lv = np.where(zcg, 0, lv)
    return np.where(sign, -lv, lv).astype(np.int32)
