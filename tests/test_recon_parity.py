"""TPU wavefront reconstruction vs golden NumPy encoder: bit-exact parity."""

import numpy as np
import pytest

from hevc_tpu.core.yuv import pad_frame
from hevc_tpu.entropy import headers
from hevc_tpu.pipeline import golden, recon
from hevc_tpu.pipeline.ai import AIEncoder

from tests.test_e2e_bitstream import synth_frame, legalize_depth


def _compare(cfg, frame, depth8, seed_modes=True):
    pf = pad_frame(frame, cfg.pad_width, cfg.pad_height)
    genc = golden.GoldenEncoder(cfg)
    # fix modes via search so both paths code identical decisions
    enc = AIEncoder(cfg)
    d8, m8 = enc.decide_frame(pf.y)
    if depth8 is not None:
        d8 = depth8
    m4 = np.repeat(np.repeat(m8, 2, 0), 2, 1)
    nxn = np.zeros_like(d8, bool)
    planes = recon.encode_frame_planes_jit(
        pf.y, pf.cb, pf.cr, d8, m4, nxn,
        qp=cfg.qp, pad_w=cfg.pad_width, pad_h=cfg.pad_height)
    decisions, grecon = genc.encode_frame(pf, d8, m8)

    np.testing.assert_array_equal(np.asarray(planes.recon_y),
                                  grecon.y.astype(np.int32), "recon_y")
    np.testing.assert_array_equal(np.asarray(planes.recon_cb),
                                  grecon.cb.astype(np.int32), "recon_cb")
    np.testing.assert_array_equal(np.asarray(planes.recon_cr),
                                  grecon.cr.astype(np.int32), "recon_cr")
    np.testing.assert_array_equal(np.asarray(planes.coef_y),
                                  decisions["coef_y"], "coef_y")
    np.testing.assert_array_equal(np.asarray(planes.coef_cb),
                                  decisions["coef_cb"], "coef_cb")
    np.testing.assert_array_equal(np.asarray(planes.coef_cr),
                                  decisions["coef_cr"], "coef_cr")


def test_recon_parity_single_ctu():
    cfg = headers.EncoderConfig(width=64, height=64, qp=32)
    _compare(cfg, synth_frame(64, 64, seed=3), None)


def test_recon_parity_multi_ctu_mixed_depths():
    cfg = headers.EncoderConfig(width=192, height=128, qp=27)
    rng = np.random.RandomState(9)
    d8 = legalize_depth(np.repeat(np.repeat(
        rng.randint(0, 4, (8, 12)), 2, 0), 2, 1))
    _compare(cfg, synth_frame(192, 128, seed=8), d8)


def test_recon_parity_high_qp():
    cfg = headers.EncoderConfig(width=128, height=64, qp=45)
    _compare(cfg, synth_frame(128, 64, seed=1), None)


def test_recon_parity_non_ctu_multiple():
    cfg = headers.EncoderConfig(width=96, height=80, qp=32)
    _compare(cfg, synth_frame(96, 80, seed=12), None)


def test_tu_wavefront_parity():
    """TU-level wavefront backend == golden encoder bit-exact."""
    from hevc_tpu.pipeline import recon_tu
    cfg = headers.EncoderConfig(width=192, height=128, qp=32)
    pf = pad_frame(synth_frame(192, 128, seed=17), cfg.pad_width,
                   cfg.pad_height)
    enc = AIEncoder(cfg)
    d8, m8 = enc.decide_frame(pf.y)
    planes = recon_tu.reconstruct_tu(
        pf.y, pf.cb, pf.cr, d8, m8,
        qp=cfg.qp, pad_w=cfg.pad_width, pad_h=cfg.pad_height)
    decisions, grecon = golden.GoldenEncoder(cfg).encode_frame(pf, d8, m8)
    np.testing.assert_array_equal(np.asarray(planes.recon_y),
                                  grecon.y, "recon_y")
    np.testing.assert_array_equal(np.asarray(planes.recon_cb),
                                  grecon.cb, "recon_cb")
    np.testing.assert_array_equal(np.asarray(planes.coef_y).astype(np.int32),
                                  decisions["coef_y"], "coef_y")
    np.testing.assert_array_equal(np.asarray(planes.coef_cb).astype(np.int32),
                                  decisions["coef_cb"], "coef_cb")


def test_tu_schedule_sanity():
    from hevc_tpu.pipeline import recon_tu
    rng = np.random.RandomState(3)
    d8 = legalize_depth(np.repeat(np.repeat(
        rng.randint(0, 4, (8, 8)), 2, 0), 2, 1))
    sched, n_steps = recon_tu.build_schedule(d8)
    total = sum(int(sched[s][1].sum()) for s in (1, 2, 4))
    # every 8x8 cell covered exactly once
    area = sum(int(sched[s][1].sum()) * s * s for s in (1, 2, 4))
    assert area == 16 * 16
    assert n_steps <= 16 * 3 + 32  # bucketed to multiples of 16
