"""R-lambda rate control: model behavior + E2E rate tracking."""

import numpy as np
import pytest

from hevc_tpu.entropy import headers
from hevc_tpu.pipeline.ratectrl import RateController, lambda_to_qp

from tests.test_e2e_bitstream import synth_frame


def test_qp_lambda_mapping():
    assert lambda_to_qp(np.exp((32 - 13.7122) / 4.2005)) == 32


def test_controller_steers_toward_budget():
    """Simulated encoder: bits halve per +6 QP; controller converges."""
    rc = RateController(target_bps=120_000, fps=30, width=320, height=192,
                        n_frames=60, init_qp=32)
    bits_at_32 = 8000.0
    spent = []
    for _ in range(60):
        qp = rc.pre_frame()
        bits = bits_at_32 * 2.0 ** ((32 - qp) / 6.0)
        rc.post_frame(bits)
        spent.append(bits)
    total = sum(spent)
    target = 120_000 * 60 / 30
    assert abs(total - target) / target < 0.25, (total, target)
    # steady state: last-10 average should track per-frame budget closely
    tail = sum(spent[-10:]) / 10
    assert abs(tail - target / 60) / (target / 60) < 0.2


@pytest.mark.skipif(not __import__("hevc_tpu.evaltools.hm", fromlist=["hm"]).decoder_available(),
                    reason="HM decoder missing")
def test_ai_rate_control_e2e(tmp_path):
    """AI with RC: per-frame QPs vary, stream decodes, rate approaches
    the target within slack (tiny clip, 6 frames)."""
    from hevc_tpu.pipeline.ai import AIEncoder
    from hevc_tpu.evaltools import hm as hm_mod

    n, fps = 6, 30.0
    frames = [synth_frame(128, 64, seed=80 + i) for i in range(n)]
    cfg = headers.EncoderConfig(width=128, height=64, qp=32)
    enc = AIEncoder(cfg)
    base_stream, _, _ = enc.encode(frames, with_hash_sei=False)
    base_bps = 8 * len(base_stream) * fps / n
    target = base_bps / 2  # ask for half the fixed-QP32 rate

    rc = RateController(target, fps, 128, 64, n_frames=n, init_qp=32)
    stream, recons, _ = enc.encode(frames, with_hash_sei=True,
                                   rate_control=rc)
    rc_bps = 8 * len(stream) * fps / n
    assert rc_bps < base_bps * 0.85    # clearly steered down
    rcq, log, _ = hm_mod.decode_bytes(stream, str(tmp_path))
    assert rcq == 0, log
    assert "mismatch" not in log.lower(), log


def test_lcu_rate_control_e2e():
    """LCU-level rate control (TEncRateCtrl.cpp:1402 LCU path): per-CTB
    QPs ride cu_qp_delta syntax, our decoder reproduces the encoder
    reconstruction EXACTLY (per-CTB dequant), and the rate steers to
    the target."""
    from hevc_tpu.decoder.top import decode_annexb
    from hevc_tpu.pipeline.pframe import LDPEncoder
    from hevc_tpu.pipeline.ratectrl import LCURateController

    n, fps = 6, 30.0
    rng = np.random.RandomState(5)
    from hevc_tpu.core.yuv import Frame
    base = rng.randint(0, 256, (64, 128)).astype(np.uint8)
    frames = []
    for t in range(n):
        y = np.roll(base, 2 * t, axis=1).copy()
        # one busy CTU (high residue -> more bits under MAD weighting)
        y[10:40, 10:50] = rng.randint(0, 256, (30, 40))
        cb = np.full((32, 64), 124, np.uint8)
        frames.append(Frame(y, cb, cb.copy()))

    cfg = headers.EncoderConfig(width=128, height=64, qp=32,
                                cu_qp_delta=True, num_refs=1)
    enc = LDPEncoder(cfg, use_gop_qp=False, rect_pu=False)
    base_stream, _ = enc.encode(frames, with_hash_sei=False)
    base_bps = 8 * len(base_stream) * fps / n

    rc = LCURateController(base_bps * 0.6, fps, 128, 64, n_frames=n,
                           init_qp=32)
    enc2 = LDPEncoder(cfg, use_gop_qp=False, rect_pu=False)
    stream, recons = enc2.encode(frames, with_hash_sei=False,
                                 rate_control=rc)

    res = decode_annexb(stream)
    assert len(res.frames) == n
    for i, (d, r) in enumerate(zip(res.frames, recons)):
        np.testing.assert_array_equal(d.y, r.y, err_msg=f"y frame {i}")
        np.testing.assert_array_equal(d.cb, r.cb, err_msg=f"cb frame {i}")
        np.testing.assert_array_equal(d.cr, r.cr, err_msg=f"cr frame {i}")
    rc_bps = 8 * len(stream) * fps / n
    # rate steered toward the 0.6x target (IDR dominates a 6-frame clip;
    # the P-frame rate is what the LCU model controls)
    assert rc_bps < base_bps, (rc_bps, base_bps)
