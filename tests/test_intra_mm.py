"""MXU/Pallas intra formulation: bit-exactness vs the gather path.

The weight-matrix predictor (ops/intra_mm) must reproduce the
per-mode-filtered gather predictor (ops/intra.predict_all_modes)
exactly — same integers, every mode, every size — since the search's
SATD argmin (and therefore the bitstream) depends on it.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hevc_tpu.ops import cost, intra, intra_mm, refs
from hevc_tpu.pipeline.search import _filter_mask


def _random_refs(n, B, seed):
    r = np.random.RandomState(seed)
    return jnp.asarray(r.randint(0, 256, (B, 4 * n + 1)).astype(np.int32))


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_predict_all_modes_mm_exact(n):
    B = 13
    r_u = _random_refs(n, B, n)
    r_f = intra.filter_refs(r_u)
    got = np.asarray(intra_mm.predict_all_modes_mm(r_u, r_f, n))

    pu = np.asarray(intra.predict_all_modes(r_u, n, component="luma"))
    pf = np.asarray(intra.predict_all_modes(r_f, n, component="luma"))
    fmask = _filter_mask(n)
    want = np.where(fmask[None, :, None, None], pf, pu)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [4, 8, 16])
def test_satd_all_modes_exact(n):
    B = 9
    rng = np.random.RandomState(100 + n)
    r_u = _random_refs(n, B, 2 * n)
    r_f = intra.filter_refs(r_u)
    orig = jnp.asarray(rng.randint(0, 256, (B, n, n)).astype(np.int32))

    got = np.asarray(intra_mm.satd_all_modes(r_u, r_f, orig, n))

    pu = intra.predict_all_modes(r_u, n, component="luma")
    pf = intra.predict_all_modes(r_f, n, component="luma")
    fmask = jnp.asarray(_filter_mask(n))
    preds = jnp.where(fmask[None, :, None, None], pf, pu)
    block = 4 if n == 4 else 8
    want = np.asarray(cost.satd(orig[:, None], preds, block=block))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [4, 8, 16])
def test_satd_pallas_kernel_exact(n):
    """The fused Pallas kernel (interpret mode on CPU) matches the XLA
    matmul path bit-exactly, including the DC epilogue and the
    non-tile-multiple batch padding."""
    B = 70                     # deliberately not a multiple of the tile
    rng = np.random.RandomState(5)
    r_u = _random_refs(n, B, 3 * n + 1)
    r_f = intra.filter_refs(r_u)
    orig = jnp.asarray(rng.randint(0, 256, (B, n, n)).astype(np.int32))

    got = np.asarray(intra_mm._satd_all_modes_pallas(
        r_u, r_f, orig, n, component="luma", bit_depth=8,
        interpret=True))
    preds = intra_mm.predict_all_modes_mm(r_u, r_f, n)
    block = 4 if n == 4 else 8
    want = np.asarray(cost.satd(orig[:, None], preds, block=block))
    np.testing.assert_array_equal(got, want)
