"""Inter MC filters, motion search, LDP pre-encode + predictor chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hevc_tpu.entropy import headers
from hevc_tpu.models import eth_lstm
from hevc_tpu.ops import inter
from hevc_tpu.pipeline import ldp

from tests.test_e2e_bitstream import synth_frame


def test_mc_luma_integer_is_copy():
    rng = np.random.RandomState(0)
    ref = rng.randint(0, 256, (2, 71, 71)).astype(np.int32)
    out = np.asarray(inter.mc_luma(jnp.asarray(ref), 0, 0, 64, 64))
    np.testing.assert_array_equal(out, ref[:, 3:67, 3:67])


def test_mc_luma_half_pel_flat():
    """Half-pel interp of a constant plane is the constant."""
    ref = np.full((1, 71, 71), 100, np.int32)
    out = np.asarray(inter.mc_luma(jnp.asarray(ref), 2, 2, 64, 64))
    assert np.all(out == 100)


def test_mc_luma_half_pel_matches_direct():
    """1-D half-pel against a direct numpy evaluation of the 8-tap."""
    rng = np.random.RandomState(1)
    ref = rng.randint(0, 256, (1, 71, 71)).astype(np.int64)
    out = np.asarray(inter.mc_luma(jnp.asarray(ref.astype(np.int32)),
                                   2, 0, 64, 64))
    f = inter.LUMA_FILTERS[2].astype(np.int64)
    for x in range(5):
        expect = sum(f[t] * ref[0, 3, x + t] for t in range(8))
        expect = (expect * 64 + (1 << 11)) >> 12
        expect = min(max(expect, 0), 255)
        assert out[0, 0, x] == expect, (x, out[0, 0, x], expect)


def test_mc_chroma_integer_is_copy():
    rng = np.random.RandomState(2)
    ref = rng.randint(0, 256, (1, 35, 35)).astype(np.int32)
    out = np.asarray(inter.mc_chroma(jnp.asarray(ref), 0, 0, 32, 32))
    np.testing.assert_array_equal(out, ref[:, 1:33, 1:33])


def test_integer_search_finds_known_shift():
    rng = np.random.RandomState(3)
    ref = rng.randint(0, 256, (128, 128)).astype(np.int32)
    # current = ref shifted by (+3, -2): block at (32,32) matches
    # ref at (35, 30) -> mv = (+3, -2)
    cur = np.zeros((64, 64), np.int32)
    cur[:, :] = ref[30:94, 35:99]
    mv, sad = inter.integer_search_ctu(
        jnp.asarray(cur[None]), jnp.asarray(ref),
        jnp.asarray(np.array([[32, 32]], np.int32)), radius=8)
    mv = np.asarray(mv)
    assert tuple(mv[0]) == (3, -2), mv
    assert int(sad[0]) == 0


def test_pre_encode_static_scene_zero_residue():
    cfg = headers.EncoderConfig(width=128, height=64, qp=32)
    f = synth_frame(128, 64, seed=4)
    pipe = ldp.LDPPipeline(cfg)
    out = pipe.run([f, f])
    assert "resi_y" not in out[0]          # first frame: no pre-encode
    r = out[1]["resi_y"]
    assert r.shape == (64, 128)
    assert np.all(r == 128)                # identical frames -> zero residue
    assert np.all(out[1]["mv_q"] == 0)


def test_pre_encode_translation():
    cfg = headers.EncoderConfig(width=128, height=128, qp=32)
    f0 = synth_frame(128, 128, seed=5)
    y1 = np.roll(f0.y, (2, -3), axis=(0, 1))  # dy=+2, dx=-3
    from hevc_tpu.core.yuv import Frame
    f1 = Frame(y1, f0.cb, f0.cr)
    pipe = ldp.LDPPipeline(cfg)
    out = pipe.run([f0, f1])
    mv = out[1]["mv_q"]
    # np.roll(+2 rows, -3 cols): cur[y][x] = prev[y-2][x+3] -> mv (+3, -2);
    # check a CTU whose matched window stays inside the frame.
    assert tuple(mv[2] // 4) == (3, -2), mv


def test_ldp_predictor_chain():
    cfg = headers.EncoderConfig(width=128, height=64, qp=32)
    params = eth_lstm.init_params(jax.random.PRNGKey(0))
    pipe = ldp.LDPPipeline(cfg, lstm_params=params)
    frames = [synth_frame(128, 64, seed=s) for s in range(3)]
    out = pipe.run(frames)
    assert "hcpm" in out[1] and "hcpm" in out[2]
    assert out[1]["hcpm"].shape == (2, 21)
    # state carried: same residue would give different probs at step 2
    assert not np.allclose(out[1]["hcpm"], out[2]["hcpm"])


@pytest.mark.skipif(not __import__("hevc_tpu.evaltools.hm", fromlist=["hm"]).decoder_available(),
                    reason="HM decoder missing")
def test_ldp_encoder_e2e_hm_decode(tmp_path):
    """IDR + 3 P frames; HM must decode with byte-exact reconstruction."""
    from hevc_tpu.pipeline.pframe import LDPEncoder
    from hevc_tpu.evaltools import hm as hm_mod
    from hevc_tpu.core.yuv import read_yuv420, Frame, psnr

    cfg = headers.EncoderConfig(width=128, height=64, qp=32)
    base = synth_frame(128, 64, seed=30)
    frames = [base]
    for i in range(3):
        y = np.roll(frames[-1].y, (1, 2), axis=(0, 1))
        rng = np.random.RandomState(40 + i)
        y = np.clip(y.astype(np.int32) + rng.randint(-3, 4, y.shape), 0,
                    255).astype(np.uint8)
        frames.append(Frame(y, frames[-1].cb, frames[-1].cr))

    enc = LDPEncoder(cfg)
    stream, recons = enc.encode(frames)
    rc, log, rec_path = hm_mod.decode_bytes(stream, str(tmp_path))
    assert rc == 0, log
    assert "mismatch" not in log.lower(), log
    dec = read_yuv420(rec_path, cfg.width, cfg.height)
    assert len(dec) == 4
    for i, (d, r) in enumerate(zip(dec, recons)):
        np.testing.assert_array_equal(d.y, r.y, err_msg=f"luma frame {i}")
        np.testing.assert_array_equal(d.cb, r.cb, err_msg=f"cb frame {i}")
    # P frames should be much cheaper than the IDR and decent quality
    p = psnr(dec[3].y, frames[3].y)
    assert p > 28.0, p
