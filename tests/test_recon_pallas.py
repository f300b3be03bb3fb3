"""Pallas mega-kernel reconstruction vs the XLA wavefront: bit-exact.

Runs the kernel in Pallas interpret mode on CPU (the hardware Mosaic
path was additionally verified byte-exact on the real TPU chip against
the same XLA twin, 192x128 mixed-depth + NxN, round 5). Behavioral
reference: HM TComPrediction.cpp:412, TComTrQuant.cpp:388-841 (spec
only; see pipeline/recon_pallas.py docstring)."""

import numpy as np
import pytest

import jax

from hevc_tpu.entropy import headers
from hevc_tpu.pipeline import recon, recon_pallas

from tests.test_e2e_bitstream import synth_frame, legalize_depth


def _mk_inputs(W, H, F, seed, qp):
    rng = np.random.RandomState(seed)
    ys = np.stack([np.asarray(synth_frame(W, H, seed=seed + i).y)
                   for i in range(F)])
    cbs = np.stack([np.asarray(synth_frame(W, H, seed=seed + i).cb)
                    for i in range(F)])
    crs = np.stack([np.asarray(synth_frame(W, H, seed=seed + i).cr)
                    for i in range(F)])
    h8, w8 = H // 8, W // 8
    d8 = np.stack([legalize_depth(np.repeat(np.repeat(
        rng.randint(0, 4, (h8 // 2, w8 // 2)), 2, 0), 2, 1))
        for _ in range(F)])
    m4 = rng.randint(0, 35, (F, H // 4, W // 4)).astype(np.int32)
    nxn = (rng.rand(F, h8, w8) < 0.4) & (d8 == 3)
    return ys, cbs, crs, d8, m4, nxn


@pytest.mark.slow
@pytest.mark.parametrize("qp", [22, 37])
def test_pallas_recon_matches_xla(qp):
    W, H, F = 128, 64, 2
    ys, cbs, crs, d8, m4, nxn = _mk_inputs(W, H, F, seed=11 + qp, qp=qp)

    ref = jax.vmap(lambda y, cb, cr, d, m, n: recon.encode_frame_planes(
        y, cb, cr, d, m, n, qp=qp, pad_w=W, pad_h=H, rdoq=True))(
        ys, cbs, crs, d8, m4, nxn)
    got = recon_pallas.encode_frame_planes_pallas(
        ys, cbs, crs, d8, m4, nxn, qp=qp, pad_w=W, pad_h=H, rdoq=True,
        interpret=True)

    for name in ref._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            err_msg=name)
