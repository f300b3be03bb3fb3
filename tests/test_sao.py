"""SAO: estimator/apply units + E2E HM-decode conformance."""

import numpy as np
import pytest

from hevc_tpu.entropy import headers
from hevc_tpu.ops import sao as sao_lib

from tests.test_e2e_bitstream import synth_frame


def test_sao_apply_band_known():
    """BO: +3 on bands pos..pos+3 shifts exactly those samples."""
    rec = np.arange(64 * 64, dtype=np.int32).reshape(64, 64) % 256
    pos = 10
    t = np.array([1], np.int32)
    offs = np.array([[3, 3, 3, 3]], np.int32)
    out = np.asarray(sao_lib.sao_apply(rec, t, np.zeros(1, np.int32),
                                       np.array([pos], np.int32), offs, 64))
    band = rec >> 3
    in_win = ((band - pos) & 31) < 4
    np.testing.assert_array_equal(out[in_win], np.clip(rec[in_win] + 3, 0, 255))
    np.testing.assert_array_equal(out[~in_win], rec[~in_win])


def test_sao_apply_edge_smooths_impulse():
    """EO class 0 (horizontal) with negative cat-4 offset pulls down a
    horizontal impulse (local max)."""
    rec = np.full((64, 64), 100, np.int32)
    rec[10, 20] = 120            # local max along the row
    t = np.array([2], np.int32)
    offs = np.array([[0, 0, 0, -5]], np.int32)
    out = np.asarray(sao_lib.sao_apply(rec, t, np.zeros(1, np.int32),
                                       np.zeros(1, np.int32), offs, 64))
    assert out[10, 20] == 115
    assert out[10, 21] == 100    # cat1/2 offsets are 0


def test_sao_estimator_reduces_sse():
    """Estimated params never increase SSE when applied."""
    rng = np.random.RandomState(0)
    orig = rng.randint(0, 256, (128, 128)).astype(np.int32)
    rec = np.clip(orig + rng.randint(-6, 7, orig.shape), 0, 255)
    ocb = rng.randint(0, 256, (64, 64)).astype(np.int32)
    rcb = np.clip(ocb + rng.randint(-4, 5, ocb.shape), 0, 255)
    p = sao_lib.estimate_frame(orig, ocb, ocb, rec, rcb, rcb, qp=32)
    y2, cb2, cr2 = sao_lib.apply_frame(rec, rcb, rcb, p)
    sse_before = ((orig - rec) ** 2).sum()
    sse_after = ((orig - np.asarray(y2)) ** 2).sum()
    assert sse_after <= sse_before
    assert p.type_idx.shape == (3, 4)


@pytest.mark.skipif(not __import__("hevc_tpu.evaltools.hm", fromlist=["hm"]).decoder_available(),
                    reason="HM decoder missing")
@pytest.mark.parametrize("deblock", [False, True])
def test_ai_sao_e2e_hm_decode(tmp_path, deblock):
    """AI with SAO (+- deblock): HM decodes with byte-exact recon."""
    from hevc_tpu.pipeline.ai import AIEncoder
    from hevc_tpu.evaltools import hm as hm_mod
    from hevc_tpu.core.yuv import read_yuv420

    cfg = headers.EncoderConfig(width=128, height=64, qp=37, sao=True,
                                deblock=deblock)
    frames = [synth_frame(128, 64, seed=60), synth_frame(128, 64, seed=61)]
    enc = AIEncoder(cfg)
    stream, recons, _ = enc.encode(frames)
    rc, log, rec_path = hm_mod.decode_bytes(stream, str(tmp_path))
    assert rc == 0, log
    assert "mismatch" not in log.lower(), log
    dec = read_yuv420(rec_path, cfg.width, cfg.height)
    for i, (d, r) in enumerate(zip(dec, recons)):
        np.testing.assert_array_equal(d.y, r.y, err_msg=f"luma {i}")
        np.testing.assert_array_equal(d.cb, r.cb, err_msg=f"cb {i}")
        np.testing.assert_array_equal(d.cr, r.cr, err_msg=f"cr {i}")


@pytest.mark.skipif(not __import__("hevc_tpu.evaltools.hm", fromlist=["hm"]).decoder_available(),
                    reason="HM decoder missing")
def test_ldp_sao_deblock_e2e(tmp_path):
    """LDP with deblock + SAO: HM byte-exact across I and P frames."""
    from hevc_tpu.pipeline.pframe import LDPEncoder
    from hevc_tpu.evaltools import hm as hm_mod
    from hevc_tpu.core.yuv import read_yuv420, Frame

    cfg = headers.EncoderConfig(width=128, height=64, qp=37, sao=True,
                                deblock=True)
    base = synth_frame(128, 64, seed=62)
    frames = [base]
    for i in range(3):
        y = np.roll(frames[-1].y, (1, 2), axis=(0, 1))
        rng = np.random.RandomState(70 + i)
        y = np.clip(y.astype(np.int32) + rng.randint(-4, 5, y.shape), 0,
                    255).astype(np.uint8)
        frames.append(Frame(y, frames[-1].cb, frames[-1].cr))

    enc = LDPEncoder(cfg)
    stream, recons = enc.encode(frames)
    rc, log, rec_path = hm_mod.decode_bytes(stream, str(tmp_path))
    assert rc == 0, log
    assert "mismatch" not in log.lower(), log
    dec = read_yuv420(rec_path, cfg.width, cfg.height)
    for i, (d, r) in enumerate(zip(dec, recons)):
        np.testing.assert_array_equal(d.y, r.y, err_msg=f"luma {i}")
        np.testing.assert_array_equal(d.cb, r.cb, err_msg=f"cb {i}")
        np.testing.assert_array_equal(d.cr, r.cr, err_msg=f"cr {i}")
