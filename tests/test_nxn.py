"""Intra NxN (four 4x4 PUs/TUs, DST) at depth-3 CUs: full-stack parity."""

import os
import numpy as np
import pytest

from hevc_tpu.core.yuv import pad_frame
from hevc_tpu.entropy import headers
from hevc_tpu.entropy.slice_enc import SliceEncoder
from hevc_tpu.evaltools import hm
from hevc_tpu.pipeline import golden, recon
from hevc_tpu.pipeline.ai import AIEncoder

from tests.test_e2e_bitstream import synth_frame, legalize_depth


def _nxn_fixture(W=128, H=128, seed=7, n_nxn=6):
    rng = np.random.RandomState(seed)
    d8 = legalize_depth(rng.randint(0, 4, (H // 8, W // 8)).astype(np.int32))
    m8 = rng.randint(0, 35, (H // 8, W // 8)).astype(np.int32)
    m4 = np.repeat(np.repeat(m8, 2, 0), 2, 1)
    nxn = np.zeros((H // 8, W // 8), bool)
    ys, xs = np.nonzero(d8 == 3)
    for i in rng.permutation(len(ys))[:n_nxn]:
        yy, xx = ys[i], xs[i]
        nxn[yy, xx] = True
        m4[2 * yy:2 * yy + 2, 2 * xx:2 * xx + 2] = rng.randint(0, 35, (2, 2))
    return d8, m4[::2, ::2], m4, nxn


@pytest.mark.skipif(not hm.decoder_available(), reason="HM decoder missing")
def test_nxn_golden_hm_decode(tmp_path):
    """Golden NxN encode decodes bit-exactly in the HM reference."""
    W = H = 128
    cfg = headers.EncoderConfig(width=W, height=H, qp=32)
    pf = pad_frame(synth_frame(W, H, seed=5), W, H)
    d8, m8, m4, nxn = _nxn_fixture(W, H)
    assert nxn.any()
    genc = golden.GoldenEncoder(cfg)
    dec, rec = genc.encode_frame(pf, d8, m8, modes4=m4, nxn8=nxn)
    bw = headers.start_idr_slice(cfg, 32)
    se = SliceEncoder(cfg, 32)
    se.encode(bw, dec["depth8"], dec["modes8"], dec["coef_y"],
              dec["coef_cb"], dec["coef_cr"], modes4=dec["modes4"],
              nxn8=dec["nxn8"])
    stream = (headers.write_vps(cfg) + headers.write_sps(cfg)
              + headers.write_pps(cfg) + headers.finish_slice_nal(bw)
              + headers.write_hash_sei(golden.md5_plane(rec.y),
                                       golden.md5_plane(rec.cb),
                                       golden.md5_plane(rec.cr)))
    rc, log, recs = hm.decode_bytes(stream, str(tmp_path))
    assert rc == 0, log
    assert "mismatch" not in log.lower(), log


@pytest.mark.skipif(not hm.decoder_available(), reason="HM decoder missing")
def test_nxn_native_entropy_parity():
    """C++ slice coder == Python coder with NxN decisions present."""
    W = H = 128
    cfg = headers.EncoderConfig(width=W, height=H, qp=27)
    pf = pad_frame(synth_frame(W, H, seed=9), W, H)
    d8, m8, m4, nxn = _nxn_fixture(W, H, seed=11)
    dec, _ = golden.GoldenEncoder(cfg).encode_frame(pf, d8, m8, modes4=m4,
                                                    nxn8=nxn)
    bw = headers.start_idr_slice(cfg, 27)
    se = SliceEncoder(cfg, 27)
    se.encode(bw, dec["depth8"], dec["modes8"], dec["coef_y"],
              dec["coef_cb"], dec["coef_cr"], modes4=dec["modes4"],
              nxn8=dec["nxn8"])
    py = headers.finish_slice_nal(bw)
    from hevc_tpu import native
    data = native.encode_slice_data(
        dec["depth8"], dec["modes8"], dec["coef_y"], dec["coef_cb"],
        dec["coef_cr"], W, H, 27, modes4=dec["modes4"], nxn8=dec["nxn8"])
    from hevc_tpu.entropy.bitstream import nal_unit, NAL_IDR_W_RADL
    bw2 = headers.start_idr_slice(cfg, 27)
    nat = nal_unit(NAL_IDR_W_RADL, bw2.get_bytes() + data)
    assert py == nat


def test_nxn_tpu_recon_matches_golden():
    """TPU wavefront reconstruction == golden with NxN leaves."""
    W, H = 128, 64
    cfg = headers.EncoderConfig(width=W, height=H, qp=32)
    pf = pad_frame(synth_frame(W, H, seed=3), W, H)
    d8, m8, m4, nxn = _nxn_fixture(W, H, seed=13, n_nxn=5)
    assert nxn.any()
    dec, grec = golden.GoldenEncoder(cfg).encode_frame(pf, d8, m8,
                                                       modes4=m4, nxn8=nxn)
    planes = recon.encode_frame_planes_jit(
        pf.y, pf.cb, pf.cr, d8, dec["modes4"], dec["nxn8"],
        qp=32, pad_w=W, pad_h=H)
    np.testing.assert_array_equal(np.asarray(planes.recon_y),
                                  grec.y.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(planes.coef_y),
                                  dec["coef_y"].astype(np.int16))
    np.testing.assert_array_equal(np.asarray(planes.recon_cb),
                                  grec.cb.astype(np.int32))


def test_search_emits_nxn_only_at_depth3():
    import jax.numpy as jnp
    from hevc_tpu.pipeline import search
    W = H = 128
    y = synth_frame(W, H, seed=21).y
    f = synth_frame(W, H, seed=21)
    origins = jnp.asarray(search.ctu_grid(W, H))
    res = search.search_frame(jnp.asarray(y), origins, pad_w=W, pad_h=H,
                              n_ctu_x=2, qp=37,
                              cb_plane=jnp.asarray(f.cb),
                              cr_plane=jnp.asarray(f.cr))
    nxn = np.asarray(res.nxn8)
    d8 = np.asarray(res.depth8)
    assert not (nxn & (d8 != 3)).any()
    # modes4 agrees with modes8 at PU0 of every 8x8 unit
    m4 = np.asarray(res.modes4)
    np.testing.assert_array_equal(m4[:, ::2, ::2], np.asarray(res.modes8))


@pytest.mark.skipif(not hm.decoder_available(), reason="HM decoder missing")
def test_nxn_e2e_encoder_hm_decode(tmp_path):
    """Full AIEncoder with cfg.nxn on: HM decodes, recon byte-exact."""
    W, H = 96, 96
    cfg = headers.EncoderConfig(width=W, height=H, qp=37, nxn=True)
    frames = [synth_frame(W, H, seed=31)]
    stream, recons, _ = AIEncoder(cfg).encode(frames)
    rc, log, rec_path = hm.decode_bytes(stream, str(tmp_path))
    assert rc == 0, log
    assert "mismatch" not in log.lower(), log
    from hevc_tpu.core.yuv import read_yuv420
    dec = read_yuv420(rec_path, W, H)
    np.testing.assert_array_equal(dec[0].y, recons[0].y[:H, :W])
