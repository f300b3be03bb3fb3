"""Adapted CABAC context states for the exact-bit RDO tables.

ops/bits_exact prices every residual bin at a frozen context state. The
slice-INIT states overprice bins relative to mid-slice reality (HM's
estBitsSbac reads the *current adapted* states each CTU —
TComTrQuant.cpp:2129 xRateDistOptQuant via m_pcEstBitsSbac), which the
round-1/2 A/Bs showed drives trellis over-zeroing (ROADMAP). This
module derives representative adapted states by streaming a realistic
quantized-TU corpus through the real adapting residual coder and
snapshotting the context memory — deterministic (fixed seed), so the
tables are reproducible without committed blobs.

Selected via HEVC_TPU_BITS_STATES=adapted|init (bits_exact reads it at
trace time).
"""

from __future__ import annotations

import functools

import numpy as np


class _AdaptOnly:
    """Duck-typed CabacEncoder: adapts contexts, writes nothing."""

    def __init__(self):
        from ..entropy import cabac
        self._trans_lps = cabac.TRANS_IDX_LPS

    def encode_bin(self, ctx, idx, bin_val):
        state = int(ctx.state[idx])
        mps = int(ctx.mps[idx])
        if bin_val != mps:
            if state == 0:
                ctx.mps[idx] = 1 - mps
            ctx.state[idx] = self._trans_lps[state]
        elif state < 62:
            ctx.state[idx] = state + 1

    def encode_bypass(self, bin_val):
        pass

    def encode_bypass_bins(self, value, nbits):
        pass

    def encode_terminate(self, bin_val):
        pass


def _corpus(qp: int, n_tus: int, seed: int):
    """Quantized-TU mix with realistic magnitude/sparsity (the
    tools/calibrate_bits.py corpus, restricted to one QP)."""
    from . import quant, transforms
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    out = []
    while len(out) < n_tus:
        n = int(rng.choice([4, 8, 16, 32]))
        kind = rng.randint(0, 4)
        if kind == 0:
            resi = rng.randn(n, n) * rng.uniform(1, 40)
        elif kind == 1:
            yy, xx = np.mgrid[0:n, 0:n] / n
            resi = (rng.randn() * 60 * xx + rng.randn() * 60 * yy
                    + rng.randn() * 20 * xx * yy)
        elif kind == 2:
            resi = np.where(np.arange(n)[None, :] > rng.randint(0, n),
                            rng.uniform(-60, 60), 0.0) \
                + rng.randn(n, n) * 3
        else:
            resi = np.zeros((n, n))
            for _ in range(rng.randint(1, 6)):
                resi[rng.randint(0, n), rng.randint(0, n)] = \
                    rng.uniform(-200, 200)
        # NumPy twins only: this runs at TRACE time when the stacked
        # bits tables are built inside a jit (traced-QP programs); jnp
        # ops here would leak into the enclosing trace.
        cf = transforms.forward_transform_np(
            resi.round().astype(np.int32)[None])[0]
        lvl = quant.quantize_np(cf[None], qp)[0]
        if (lvl != 0).any():
            out.append(lvl.astype(np.int32))
    return out


@functools.lru_cache(maxsize=None)
def adapted_states(qp: int, init_type: int, n_tus: int = 300,
                   seed: int = 1):
    """(state, mps) uint8 arrays of the full context memory after
    adapting over a realistic TU stream from the slice-init states."""
    from ..entropy import residual
    from ..entropy.contexts import ContextModels
    ctx = ContextModels(init_type, qp)
    enc = _AdaptOnly()
    rng = np.random.RandomState(seed + 7)
    for i, lvl in enumerate(_corpus(qp, n_tus, seed)):
        is_luma = rng.rand() < 0.7
        if not is_luma and lvl.shape[0] > 16:
            lvl = lvl[:16, :16]
            if not (lvl != 0).any():
                continue
        residual.code_residual(enc, ctx, lvl, is_luma=is_luma,
                               scan_type=0)
    return ctx.state.copy(), ctx.mps.copy()
