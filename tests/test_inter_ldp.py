"""Inter MC filters, motion search, LDP pre-encode + predictor chain."""

import functools

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


def _shipped_lstm(qp=32):
    """The SHIPPED ETH-LSTM checkpoint for the QP band (falls back to a
    random init only if models/ is absent) — the suite exercises the
    weights we actually ship, not just random parameters."""
    import os
    from hevc_tpu.train.train_cnn import band_for_qp, load_params
    p = os.path.join(os.path.dirname(__file__), "..", "models",
                     f"eth_lstm_{band_for_qp(qp)}.npz")
    if os.path.exists(p):
        return load_params(p)
    import jax
    return eth_lstm.init_params(jax.random.PRNGKey(0))


def test_ldp_predictor_chain():
    cfg = headers.EncoderConfig(width=128, height=64, qp=32)
    params = _shipped_lstm(32)
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


def test_psearch_static_scene_all_skip():
    """Static content: the quadtree search picks 64x64 CUs with zero MV
    and zero residual; entropy codes every CTU as cu_skip."""
    from hevc_tpu.pipeline import psearch, search as search_lib
    from hevc_tpu.entropy.slice_enc_p import PSliceEncoder
    from hevc_tpu.entropy.bitstream import BitWriter

    cfg = headers.EncoderConfig(width=128, height=64, qp=32)
    f = synth_frame(128, 64, seed=5)
    origins = jnp.asarray(search_lib.ctu_grid(128, 64))
    res = psearch.p_search_frame(
        f.y.astype(np.int32), f.cb.astype(np.int32), f.cr.astype(np.int32),
        f.y.astype(np.int32), f.cb.astype(np.int32), f.cr.astype(np.int32),
        origins, qp=32, pad_w=128, pad_h=64)
    assert np.all(np.asarray(res.depth8) == 0)
    assert np.all(np.asarray(res.mv8) == 0)
    assert np.all(np.asarray(res.coef_y) == 0)
    from hevc_tpu.pipeline import ldp as ldp_mod
    np.testing.assert_array_equal(
        ldp_mod.tiles_to_plane(res.rec_y, 128, 64, 64), f.y)
    bw = BitWriter()
    pse = PSliceEncoder(cfg, 32)
    pse.encode(bw,
               ldp_mod.tiles_to_plane(res.depth8, 16, 8, 8),
               np.stack([ldp_mod.tiles_to_plane(res.mv8[..., 0], 16, 8, 8),
                         ldp_mod.tiles_to_plane(res.mv8[..., 1], 16, 8, 8)],
                        -1).astype(np.int32),
               ldp_mod.tiles_to_plane(res.coef_y, 128, 64, 64),
               ldp_mod.tiles_to_plane(res.coef_cb, 64, 32, 32),
               ldp_mod.tiles_to_plane(res.coef_cr, 64, 32, 32))
    # 2 CTUs, all-skip: a handful of bytes
    assert len(bw.get_bytes()) < 8
    assert np.all(pse.skip8 == 1)


def test_psearch_detail_region_splits():
    """A frame with a high-detail moving quadrant should split CUs there."""
    from hevc_tpu.pipeline import psearch, search as search_lib
    from hevc_tpu.core.yuv import Frame

    rng = np.random.RandomState(7)
    ref_y = rng.randint(0, 256, (64, 128)).astype(np.uint8)
    cur_y = np.roll(ref_y, (0, 3), axis=(0, 1))
    # overwrite one 32x32 region with fresh noise (uncompensable detail)
    cur_y[0:32, 0:32] = rng.randint(0, 256, (32, 32))
    cb = np.full((32, 64), 128, np.uint8)
    origins = jnp.asarray(search_lib.ctu_grid(128, 64))
    res = psearch.p_search_frame(
        cur_y.astype(np.int32), cb.astype(np.int32), cb.astype(np.int32),
        ref_y.astype(np.int32), cb.astype(np.int32), cb.astype(np.int32),
        origins, qp=37, pad_w=128, pad_h=64)
    d8 = np.asarray(res.depth8)
    # noise quadrant needs finer partitioning than the clean shifted part
    assert d8[0].max() >= 1


def test_psearch_hcpm_gate_forces_leaf():
    """HCPM prob <= down at level 0 forces 64x64 leaves (no split)."""
    from hevc_tpu.pipeline import psearch, search as search_lib

    rng = np.random.RandomState(9)
    ref_y = rng.randint(0, 256, (64, 128)).astype(np.uint8)
    cur_y = rng.randint(0, 256, (64, 128)).astype(np.uint8)  # uncorrelated
    cb = np.full((32, 64), 128, np.uint8)
    origins = jnp.asarray(search_lib.ctu_grid(128, 64))
    hcpm = jnp.zeros((2, 21), jnp.float32)   # all probs 0 -> never split
    res = psearch.p_search_frame(
        cur_y.astype(np.int32), cb.astype(np.int32), cb.astype(np.int32),
        ref_y.astype(np.int32), cb.astype(np.int32), cb.astype(np.int32),
        origins, qp=22, pad_w=128, pad_h=64, hcpm_probs=hcpm,
        thr_up=(0.6, 0.7, 0.8), thr_down=(0.4, 0.3, 0.2))
    assert np.all(np.asarray(res.depth8) == 0)
    # and all-ones forces max splitting
    res2 = psearch.p_search_frame(
        cur_y.astype(np.int32), cb.astype(np.int32), cb.astype(np.int32),
        ref_y.astype(np.int32), cb.astype(np.int32), cb.astype(np.int32),
        origins, qp=22, pad_w=128, pad_h=64,
        hcpm_probs=jnp.ones((2, 21), jnp.float32),
        thr_up=(0.6, 0.7, 0.8), thr_down=(0.4, 0.3, 0.2))
    assert np.all(np.asarray(res2.depth8) == 3)


@pytest.mark.skipif(not __import__("hevc_tpu.evaltools.hm", fromlist=["hm"]).decoder_available(),
                    reason="HM decoder missing")
def test_ldp_encoder_lstm_gated_e2e(tmp_path):
    """Full reference LDP chain: pre-encode residue -> ETH-CNN+LSTM HCPM
    -> gated quadtree P search -> merge/skip CABAC; HM byte-exact."""
    from hevc_tpu.pipeline.pframe import LDPEncoder
    from hevc_tpu.models import eth_lstm
    from hevc_tpu.evaltools import hm as hm_mod
    from hevc_tpu.core.yuv import read_yuv420, Frame

    cfg = headers.EncoderConfig(width=128, height=64, qp=32)
    base = synth_frame(128, 64, seed=31)
    frames = [base]
    for i in range(3):
        y = np.roll(frames[-1].y, (1, 1), axis=(0, 1))
        frames.append(Frame(y, frames[-1].cb, frames[-1].cr))

    params = _shipped_lstm(cfg.qp)
    enc = LDPEncoder(cfg, lstm_params=params)
    stream, recons = enc.encode(frames)
    rc, log, rec_path = hm_mod.decode_bytes(stream, str(tmp_path))
    assert rc == 0, log
    assert "mismatch" not in log.lower(), log
    dec = read_yuv420(rec_path, cfg.width, cfg.height)
    for i, (d, r) in enumerate(zip(dec, recons)):
        np.testing.assert_array_equal(d.y, r.y, err_msg=f"luma frame {i}")


@pytest.mark.skipif(not __import__("hevc_tpu.evaltools.hm", fromlist=["hm"]).decoder_available(),
                    reason="HM decoder missing")
def test_ldp_encoder_deblock_e2e(tmp_path):
    """LDP with in-loop deblocking (inter bS=1 derivation): HM byte-exact."""
    from hevc_tpu.pipeline.pframe import LDPEncoder
    from hevc_tpu.evaltools import hm as hm_mod
    from hevc_tpu.core.yuv import read_yuv420, Frame

    cfg = headers.EncoderConfig(width=128, height=64, qp=37, deblock=True)
    base = synth_frame(128, 64, seed=33)
    frames = [base]
    for i in range(3):
        y = np.roll(frames[-1].y, (2, 3), axis=(0, 1))
        rng = np.random.RandomState(50 + i)
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
        np.testing.assert_array_equal(d.y, r.y, err_msg=f"luma frame {i}")
        np.testing.assert_array_equal(d.cb, r.cb, err_msg=f"cb frame {i}")
        np.testing.assert_array_equal(d.cr, r.cr, err_msg=f"cr frame {i}")


def test_psearch_traced_qp_matches_static():
    """p_search_frame with a TRACED frame QP (static qp_set) is
    bit-identical to the per-QP-compiled program — the property that
    lets GOP-4 QP offsets and rate control share one compile."""
    from hevc_tpu.pipeline import psearch, search as search_lib

    rng = np.random.RandomState(3)
    ref_y = rng.randint(0, 256, (64, 128)).astype(np.uint8)
    cur_y = np.roll(ref_y, (1, 2), axis=(0, 1))
    cur_y[8:40, 70:110] = rng.randint(0, 256, (32, 40))
    cb = np.full((32, 64), 128, np.uint8)
    cb2 = np.clip(cb + rng.randint(-9, 9, cb.shape), 0, 255
                  ).astype(np.uint8)
    origins = jnp.asarray(search_lib.ctu_grid(128, 64))
    args = (cur_y.astype(np.int32), cb2.astype(np.int32),
            cb2.astype(np.int32), ref_y.astype(np.int32),
            cb.astype(np.int32), cb.astype(np.int32), origins)
    qp_set = (27, 32, 37)
    traced = jax.jit(functools.partial(
        psearch.p_search_frame, pad_w=128, pad_h=64, qp_set=qp_set))
    for qp in qp_set:
        ref = psearch.p_search_frame(*args, qp=qp, pad_w=128, pad_h=64)
        got = traced(*args, qp=jnp.int32(qp))
        for name in ref._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(ref, name)),
                np.asarray(getattr(got, name)), err_msg=f"qp{qp} {name}")
