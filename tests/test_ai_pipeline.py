"""AI pipeline tests: TPU search decisions + CNN gating, E2E vs HM."""

import jax
import numpy as np
import pytest

from hevc_tpu.core.yuv import pad_frame, read_yuv420, psnr
from hevc_tpu.entropy import headers
from hevc_tpu.evaltools import hm
from hevc_tpu.models import eth_cnn, hcpm
from hevc_tpu.pipeline.ai import AIEncoder

from tests.test_e2e_bitstream import synth_frame


def legal_quadtree(d8):
    """Check depth map is a valid quadtree labeling."""
    h8, w8 = d8.shape
    for y0 in range(0, h8, 8):
        for x0 in range(0, w8, 8):
            blk = d8[y0:y0 + 8, x0:x0 + 8]
            if not _check_node(blk, 0):
                return False
    return True


def _check_node(blk, depth):
    n = blk.shape[0]
    if (blk == depth).all():
        return True
    if (blk < depth).any() or n == 1:
        return False
    h = n // 2
    return all(_check_node(blk[dy:dy + h, dx:dx + h], depth + 1)
               for (dy, dx) in ((0, 0), (0, h), (h, 0), (h, h)))


def test_search_produces_legal_tree():
    cfg = headers.EncoderConfig(width=128, height=128, qp=32)
    enc = AIEncoder(cfg)
    pf = pad_frame(synth_frame(128, 128, seed=11), cfg.pad_width,
                   cfg.pad_height)
    depth8, modes8 = enc.decide_frame(pf.y)
    assert depth8.shape == (16, 16)
    assert legal_quadtree(depth8)
    assert modes8.min() >= 0 and modes8.max() <= 34


def test_search_boundary_forced_split():
    cfg = headers.EncoderConfig(width=96, height=80, qp=32)
    enc = AIEncoder(cfg)
    pf = pad_frame(synth_frame(96, 80, seed=2), cfg.pad_width,
                   cfg.pad_height)
    depth8, _ = enc.decide_frame(pf.y)
    # CTU (64..128, 0..64) crosses pad_w=96: its in-frame part must be
    # depth>=1 (32-wide CUs fit: 64+32 <= 96).
    assert (depth8[:, 8:12] >= 1).all()
    # rows 64..80 cross pad_h=80 -> depth >= 2 there (16 CUs fit)
    assert (depth8[8:10, :] >= 2).all()


def test_hcpm_gating_forces_decisions():
    cfg = headers.EncoderConfig(width=64, height=64, qp=32)
    pf = pad_frame(synth_frame(64, 64, seed=4), cfg.pad_width,
                   cfg.pad_height)
    params = eth_cnn.init_params(jax.random.PRNGKey(0))

    # force split everywhere: up thresholds 0 => prob > up => split-only
    enc = AIEncoder(cfg, cnn_params=params,
                    thresholds=hcpm.Thresholds(up=(0.0, 0.0, 0.0),
                                               down=(-0.1, -0.1, -0.1)))
    d8, _ = enc.decide_frame(pf.y)
    assert (d8 == 3).all(), d8

    # force no-split: down thresholds 1.0 => prob <= down => leaf-only
    enc2 = AIEncoder(cfg, cnn_params=params,
                     thresholds=hcpm.Thresholds(up=(1.1, 1.1, 1.1),
                                                down=(1.0, 1.0, 1.0)))
    d8b, _ = enc2.decide_frame(pf.y)
    assert (d8b == 0).all(), d8b


@pytest.mark.skipif(not hm.decoder_available(), reason="HM decoder missing")
def test_ai_pipeline_e2e_hm_decode(tmp_path):
    cfg = headers.EncoderConfig(width=128, height=96, qp=32)
    frames = [synth_frame(128, 96, seed=s) for s in range(2)]
    params = eth_cnn.init_params(jax.random.PRNGKey(1))
    enc = AIEncoder(cfg, cnn_params=params)
    stream, recons, stats = enc.encode(frames)
    rc, log, rec_path = hm.decode_bytes(stream, str(tmp_path))
    assert rc == 0, log
    assert "mismatch" not in log.lower(), log
    dec = read_yuv420(rec_path, cfg.width, cfg.height)
    assert len(dec) == 2
    for d, r in zip(dec, recons):
        np.testing.assert_array_equal(d.y, r.y[:cfg.height, :cfg.width])
    # quality sanity: recon should be close to the original
    p = psnr(dec[0].y, frames[0].y)
    assert p > 28.0, p


def test_threshold_file_end_to_end():
    """Thr_info.txt-style parsing drives the gating (AI order)."""
    thr = hcpm.parse_thresholds("0.0 -0.1 0.0 -0.1 0.0 -0.1", order="ai")
    cfg = headers.EncoderConfig(width=64, height=64, qp=32)
    pf = pad_frame(synth_frame(64, 64, seed=4), 64, 64)
    params = eth_cnn.init_params(jax.random.PRNGKey(0))
    enc = AIEncoder(cfg, cnn_params=params, thresholds=thr)
    d8, _ = enc.decide_frame(pf.y)
    assert (d8 == 3).all()   # up=0 everywhere -> always split


@pytest.mark.skipif(not hm.decoder_available(), reason="HM decoder missing")
def test_deblocking_normative(tmp_path):
    """With PPS deblocking enabled, our deblocked recon must equal the
    reference decoder's output byte-for-byte (proves ops/deblock.py is
    normative)."""
    cfg = headers.EncoderConfig(width=128, height=128, qp=37, deblock=True)
    frames = [synth_frame(128, 128, seed=21)]
    enc = AIEncoder(cfg)
    stream, recons, _ = enc.encode(frames)
    rc, log, rec_path = hm.decode_bytes(stream, str(tmp_path))
    assert rc == 0, log
    assert "mismatch" not in log.lower(), log
    dec = read_yuv420(rec_path, cfg.width, cfg.height)
    np.testing.assert_array_equal(dec[0].y, recons[0].y)
    np.testing.assert_array_equal(dec[0].cb, recons[0].cb)
    np.testing.assert_array_equal(dec[0].cr, recons[0].cr)
    # and deblocking must actually change something at high QP
    enc2 = AIEncoder(headers.EncoderConfig(width=128, height=128, qp=37))
    _, recons2, _ = enc2.encode(frames)
    assert not np.array_equal(recons[0].y, recons2[0].y)


@pytest.mark.skipif(not hm.decoder_available(), reason="HM decoder missing")
@pytest.mark.parametrize("qp,deblock", [(22, True), (37, False)])
def test_ai_qp_sweep_conformance(tmp_path, qp, deblock):
    cfg = headers.EncoderConfig(width=64, height=64, qp=qp, deblock=deblock)
    frames = [synth_frame(64, 64, seed=qp)]
    enc = AIEncoder(cfg)
    stream, recons, _ = enc.encode(frames)
    rc, log, rec_path = hm.decode_bytes(stream, str(tmp_path))
    assert rc == 0, log
    assert "mismatch" not in log.lower(), log


@pytest.mark.skipif(not hm.decoder_available(), reason="HM decoder missing")
@pytest.mark.parametrize("qp", [6, 45, 51])
def test_ai_extreme_qp_conformance(tmp_path, qp):
    cfg = headers.EncoderConfig(width=64, height=64, qp=qp)
    frames = [synth_frame(64, 64, seed=qp + 1)]
    enc = AIEncoder(cfg)
    stream, recons, _ = enc.encode(frames)
    rc, log, rec_path = hm.decode_bytes(stream, str(tmp_path))
    assert rc == 0, log
    assert "mismatch" not in log.lower(), log
