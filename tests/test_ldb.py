"""Low-Delay-B operating point: B slices with both lists = previous frame.

The LDB encoder shares the LDP search/reconstruction entirely (uni-L0
2Nx2N motion); only the slice syntax differs (slice_type=B, initType 2
contexts, inter_pred_idc per non-merge PU — reference operating point
cfg/encoder_lowdelay_main.cfg). Recon must therefore be byte-identical
to the LDP encode, and the stream must decode in HM with MD5 verified.
"""

import numpy as np
import pytest

from hevc_tpu.core.yuv import Frame, read_yuv420
from hevc_tpu.entropy.headers import EncoderConfig
from hevc_tpu.pipeline.pframe import LDPEncoder


def _frames(n=4, w=192, h=128, seed=11):
    from test_e2e_bitstream import synth_frame
    f0 = synth_frame(w, h, seed=seed)
    out = [f0]
    for i in range(1, n):
        out.append(Frame(np.roll(f0.y, 2 * i, 1),
                         np.roll(f0.cb, i, 1), np.roll(f0.cr, i, 1)))
    return out


@pytest.fixture(scope="module")
def ldb_encode():
    cfg = EncoderConfig(width=192, height=128, qp=32)
    frames = _frames()
    stream_b, recons_b = LDPEncoder(cfg, slice_mode="B").encode(frames)
    return cfg, frames, stream_b, recons_b


def test_ldb_recon_matches_ldp(ldb_encode):
    cfg, frames, stream_b, recons_b = ldb_encode
    stream_p, recons_p = LDPEncoder(cfg, slice_mode="P").encode(frames)
    for rb, rp in zip(recons_b, recons_p):
        np.testing.assert_array_equal(rb.y, rp.y)
        np.testing.assert_array_equal(rb.cb, rp.cb)
        np.testing.assert_array_equal(rb.cr, rp.cr)
    assert stream_b != stream_p  # different slice syntax


def test_ldb_hm_conformance(ldb_encode, tmp_path):
    from hevc_tpu.evaltools import hm
    if not hm.decoder_available():
        pytest.skip("HM decoder not built")
    cfg, frames, stream, recons = ldb_encode
    rc, log, rec_path = hm.decode_bytes(stream, str(tmp_path))
    assert rc == 0, log
    assert "mismatch" not in log.lower(), log
    dec = read_yuv420(rec_path, cfg.width, cfg.height)
    assert len(dec) == len(frames)
    for d, r in zip(dec, recons):
        np.testing.assert_array_equal(d.y, r.y[:cfg.height, :cfg.width])
        np.testing.assert_array_equal(
            d.cb, r.cb[:cfg.height // 2, :cfg.width // 2])
        np.testing.assert_array_equal(
            d.cr, r.cr[:cfg.height // 2, :cfg.width // 2])


def test_ldb_own_decoder(ldb_encode):
    cfg, frames, stream, recons = ldb_encode
    from hevc_tpu.decoder import top as dtop
    res = dtop.decode_annexb(stream)
    assert res.all_hashes_ok
    assert len(res.recons) == len(recons)
    for d, r in zip(res.recons, recons):
        np.testing.assert_array_equal(np.asarray(d.y), r.y)
