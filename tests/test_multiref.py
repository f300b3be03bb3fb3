"""Multi-reference LDP (4 active refs, the reference operating point:
encoder_lowdelay_P_main.cfg:24) — normative motion derivation units +
E2E conformance.
"""

import numpy as np
import pytest

from hevc_tpu.core import zorder
from hevc_tpu.core.yuv import Frame
from hevc_tpu.entropy import motion
from hevc_tpu.entropy.headers import EncoderConfig
from hevc_tpu.evaltools import hm

from tests.test_e2e_bitstream import synth_frame


def test_scale_mv_identity_and_spec_rounding():
    # tb == td -> identity
    assert motion.scale_mv((13, -7), 2, 2) == (13, -7)
    # known rounding behavior (8.5.3.2.8): scale (16, 16) from td=4 to
    # tb=1 -> tx = (16384+2)//4 = 4096, dsf = (1*4096+32)>>6 = 64,
    # mv = sign * ((|64*16|+127)>>8) = (1024+127)>>8 = 4
    assert motion.scale_mv((16, 16), 1, 4) == (4, 4)
    # negative components keep toward-zero magnitude rounding
    assert motion.scale_mv((-16, 16), 1, 4) == (-4, 4)


def _field(mvq8, ref8, W=64, H=64):
    zmap = zorder.frame_zmap(W, H)
    return motion.MotionField(mvq8, ref8, W, H, zmap)


def test_merge_zero_candidates_iterate_refs():
    h8 = w8 = 8
    f = _field(np.zeros((h8, w8, 2), np.int32), np.zeros((h8, w8), np.int32))
    # CU at (0,0): no neighbours -> all zero-MV candidates, refIdx
    # iterating 0..n_active-1 then 0 (8.5.3.2.3 zeroIdx rule)
    cands = motion.merge_candidates(f, 0, 0, 64, n_active_refs=3)
    assert cands == [(0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 0, 0), (0, 0, 0)]


def test_amvp_b_promotion_when_no_a_neighbour():
    """isScaledFlag==0: B's same-ref candidate fills the A slot and B
    re-derives scaled (8.5.3.2.7 steps 5-6)."""
    h8 = w8 = 8
    mv = np.zeros((h8, w8, 2), np.int32)
    ref = np.zeros((h8, w8), np.int32)
    # top row coded with mv (8, 4) at refIdx 1; CU at (0, 8) below it has
    # no left (A) neighbours inside the picture
    mv[0, :] = (8, 4)
    ref[0, :] = 1
    f = _field(mv, ref)
    # target ref 1 (same POC as neighbour): direct candidate
    cands = motion.amvp_candidates(f, 0, 8, 8, 8, 1, [7, 6, 5, 4], 8)
    assert cands[0] == (8, 4)
    # target ref 0 (poc 7): neighbour is at poc 6 -> scaled tb=1, td=2
    cands = motion.amvp_candidates(f, 0, 8, 8, 8, 0, [7, 6, 5, 4], 8)
    assert cands[0] == motion.scale_mv((8, 4), 1, 2)


def _moving_frames(W, H, n):
    base = synth_frame(W + 64, H, seed=1)
    out = []
    for i in range(n):
        o = 2 * i
        out.append(Frame(np.ascontiguousarray(base.y[:, o:o + W]),
                         np.ascontiguousarray(base.cb[:, o // 2:
                                                      o // 2 + W // 2]),
                         np.ascontiguousarray(base.cr[:, o // 2:
                                                      o // 2 + W // 2])))
    return out


def test_multiref_e2e_roundtrip_and_hm(tmp_path):
    """4-ref LDP stream: own decoder byte-exact + HM decoder MD5 OK."""
    from hevc_tpu.decoder import decode_annexb
    from hevc_tpu.pipeline.pframe import LDPEncoder

    W, H = 128, 64
    frames = _moving_frames(W, H, 6)
    cfg = EncoderConfig(width=W, height=H, qp=32, num_refs=4)
    enc = LDPEncoder(cfg)
    stream, recons = enc.encode(frames)

    r = decode_annexb(stream)
    assert r.hash_ok == [True] * 6
    for i in range(6):
        assert np.array_equal(r.frames[i].y, recons[i].y)

    if hm.decoder_available():
        rc, log, _ = hm.decode_bytes(stream, str(tmp_path))
        assert rc == 0, log
        assert "mismatch" not in log.lower(), log
        # the L0 list really carries 4 refs at steady state
        assert "[L0 4 3 2 1 ]" in log or "[L0  4  3  2  1" in log, log
