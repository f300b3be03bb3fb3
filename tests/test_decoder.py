"""Standalone decoder (hevc_tpu/decoder): full-stack roundtrip parity.

The decoder must reproduce the encoder's reconstruction byte-exactly
(the encoder recon is HM-verified normative), verify MD5 hash SEI, and
agree with the HM reference decoder on the same streams.
"""

import numpy as np
import pytest

from hevc_tpu.core.yuv import Frame
from hevc_tpu.decoder import decode_annexb
from hevc_tpu.entropy.headers import EncoderConfig
from hevc_tpu.pipeline.ai import AIEncoder

from tests.test_e2e_bitstream import synth_frame


def _assert_frames_equal(a, b, msg=""):
    np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y),
                                  err_msg=f"{msg} luma")
    np.testing.assert_array_equal(np.asarray(a.cb), np.asarray(b.cb),
                                  err_msg=f"{msg} cb")
    np.testing.assert_array_equal(np.asarray(a.cr), np.asarray(b.cr),
                                  err_msg=f"{msg} cr")


def test_decode_ai_roundtrip():
    """AI stream (NxN on): decode == encoder recon, hashes verified."""
    W, H = 192, 128
    cfg = EncoderConfig(width=W, height=H, qp=32)
    frames = [synth_frame(W, H, seed=s) for s in range(2)]
    stream, recons, _ = AIEncoder(cfg).encode(frames)
    r = decode_annexb(stream)
    assert len(r.frames) == 2
    assert r.hash_ok == [True, True]
    for i in range(2):
        _assert_frames_equal(r.recons[i], recons[i], f"frame {i}")
    # cropped output dims
    assert r.frames[0].y.shape == (H, W)


def test_decode_ai_filters_roundtrip():
    """Deblocking + SAO decode path matches the encoder recon."""
    W = H = 128
    cfg = EncoderConfig(width=W, height=H, qp=37, deblock=True, sao=True)
    frames = [synth_frame(W, H, seed=11)]
    stream, recons, _ = AIEncoder(cfg).encode(frames)
    r = decode_annexb(stream)
    assert r.hash_ok == [True]
    _assert_frames_equal(r.recons[0], recons[0])


def test_decode_ldp_roundtrip():
    """LDP stream (I + P, merge/skip/AMVP): decode == encoder recon."""
    W, H = 192, 128
    cfg = EncoderConfig(width=W, height=H, qp=32)
    fr = [synth_frame(W, H, seed=0)]
    for i in range(1, 3):
        p = fr[-1]
        fr.append(Frame(np.roll(p.y, (1, 2), (0, 1)),
                        np.roll(p.cb, (0, 1), (0, 1)),
                        np.roll(p.cr, (0, 1), (0, 1))))
    from hevc_tpu.pipeline.pframe import LDPEncoder
    out = LDPEncoder(cfg).encode(fr)
    stream, recons = out[0], out[1]
    r = decode_annexb(stream)
    assert len(r.frames) == 3
    assert r.hash_ok == [True] * 3
    for i in range(3):
        _assert_frames_equal(r.recons[i], recons[i], f"frame {i}")


def test_decode_detects_corruption():
    """A flipped hash byte must be reported as a hash mismatch."""
    W = H = 64
    cfg = EncoderConfig(width=W, height=H, qp=32)
    stream, _, _ = AIEncoder(cfg).encode([synth_frame(W, H, seed=3)])
    # find the SEI payload and flip one hash byte (type 132 after NAL hdr)
    idx = stream.rfind(bytes([132]))
    assert idx > 0
    bad = bytearray(stream)
    bad[idx + 3] ^= 0xFF
    r = decode_annexb(bytes(bad))
    assert r.hash_ok == [False]
