"""Native C++ CABAC slice encoder: byte parity vs the Python entropy layer."""

import numpy as np
import pytest

from hevc_tpu.core.yuv import pad_frame
from hevc_tpu.entropy import headers
from hevc_tpu.entropy.slice_enc import SliceEncoder
from hevc_tpu import native
from hevc_tpu.pipeline import golden
from hevc_tpu.pipeline.ai import AIEncoder

from tests.test_e2e_bitstream import synth_frame, legalize_depth


def _python_slice_bytes(cfg, decisions):
    bw = headers.start_idr_slice(cfg, cfg.qp)
    header_len = len(bw.get_bytes())
    se = SliceEncoder(cfg, cfg.qp)
    se.encode(bw, decisions["depth8"], decisions["modes8"],
              decisions["coef_y"], decisions["coef_cb"],
              decisions["coef_cr"])
    return bw.get_bytes()[header_len:]


@pytest.mark.parametrize("dims,qp,seed", [
    ((64, 64), 32, 3), ((192, 128), 27, 8), ((96, 80), 37, 5),
    ((128, 128), 22, 11),
])
def test_native_matches_python(dims, qp, seed):
    w, h = dims
    cfg = headers.EncoderConfig(width=w, height=h, qp=qp)
    pf = pad_frame(synth_frame(w, h, seed=seed), cfg.pad_width,
                   cfg.pad_height)
    enc = AIEncoder(cfg, recon_backend="golden")
    d8, m8 = enc.decide_frame(pf.y)
    decisions, _ = enc.golden.encode_frame(pf, d8, m8)

    py_bytes = _python_slice_bytes(cfg, decisions)
    c_bytes = native.encode_slice_data(
        decisions["depth8"], decisions["modes8"], decisions["coef_y"],
        decisions["coef_cb"], decisions["coef_cr"],
        cfg.pad_width, cfg.pad_height, cfg.qp)
    assert c_bytes == py_bytes


def test_native_p_slice_matches_python():
    """Native P-slice CABAC == Python PSliceEncoder byte-for-byte."""
    from hevc_tpu.entropy.slice_enc_p import PSliceEncoder
    from hevc_tpu.pipeline.pframe import LDPEncoder
    from hevc_tpu.core.yuv import Frame
    import numpy as np

    cfg = headers.EncoderConfig(width=128, height=64, qp=32)
    base = synth_frame(128, 64, seed=30)
    y1 = np.roll(base.y, (1, 2), axis=(0, 1))
    frames = [base, Frame(y1, base.cb, base.cr)]
    enc = LDPEncoder(cfg, tree="flat")
    # reproduce the decision arrays the encoder feeds the entropy stage
    from hevc_tpu.core.yuv import pad_frame
    from hevc_tpu.pipeline import ldp as ldp_mod
    pf0 = pad_frame(frames[0], cfg.pad_width, cfg.pad_height)
    d8, m8 = enc.intra.decide_frame(pf0.y)
    _, rec0 = enc.intra.reconstruct(pf0, d8, m8)
    pf1 = pad_frame(frames[1], cfg.pad_width, cfg.pad_height)
    (cy, ccb, ccr, ry, rcb, rcr, mvq) = enc._search_fn(cfg.qp, False)(
        pf1.y.astype(np.int32), pf1.cb.astype(np.int32),
        pf1.cr.astype(np.int32), rec0.y.astype(np.int32),
        rec0.cb.astype(np.int32), rec0.cr.astype(np.int32))
    W, H = cfg.pad_width, cfg.pad_height
    coef_y = ldp_mod.tiles_to_plane(cy, W, H, 64)
    coef_cb = ldp_mod.tiles_to_plane(ccb, W // 2, H // 2, 32)
    coef_cr = ldp_mod.tiles_to_plane(ccr, W // 2, H // 2, 32)
    mvq = np.asarray(mvq)
    mvq8 = np.zeros((H // 8, W // 8, 2), np.int32)
    for b in range(mvq.shape[0]):
        by, bx = divmod(b, cfg.ctus_x)
        mvq8[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = mvq[b]
    depth8 = np.zeros((H // 8, W // 8), np.int32)

    bw = headers.start_p_slice(cfg, cfg.qp, 1)
    hl = len(bw.get_bytes())
    pse = PSliceEncoder(cfg, cfg.qp)
    pse.encode(bw, depth8, mvq8, coef_y, coef_cb, coef_cr)
    py_bytes = bw.get_bytes()[hl:]

    c_bytes = native.encode_slice_data_p(
        depth8, mvq8, coef_y, coef_cb, coef_cr, W, H, cfg.qp)
    assert c_bytes == py_bytes


def test_native_b_slice_matches_python():
    """Native low-delay-B CABAC == Python PSliceEncoder(slice_type='B')."""
    from hevc_tpu.entropy.slice_enc_p import PSliceEncoder
    import numpy as np

    rng = np.random.RandomState(5)
    cfg = headers.EncoderConfig(width=128, height=64, qp=30)
    W, H = cfg.pad_width, cfg.pad_height

    depth8 = np.zeros((H // 8, W // 8), np.int32)
    mvq8 = np.zeros((H // 8, W // 8, 2), np.int32)

    def rand_tree(y, x, size, depth):
        if depth < 3 and rng.rand() < 0.5:
            h = size // 2
            for dy, dx in ((0, 0), (0, h), (h, 0), (h, h)):
                rand_tree(y + dy, x + dx, h, depth + 1)
        else:
            depth8[y // 8:(y + size) // 8, x // 8:(x + size) // 8] = depth
            mv = rng.randint(-24, 25, 2)
            mvq8[y // 8:(y + size) // 8, x // 8:(x + size) // 8] = mv

    for cy in range(H // 64):
        for cx in range(W // 64):
            rand_tree(cy * 64, cx * 64, 64, 0)

    coef_y = (rng.randint(-4, 5, (H, W)) *
              (rng.rand(H, W) < 0.1)).astype(np.int32)
    coef_cb = (rng.randint(-3, 4, (H // 2, W // 2)) *
               (rng.rand(H // 2, W // 2) < 0.08)).astype(np.int32)
    coef_cr = np.zeros((H // 2, W // 2), np.int32)

    bw = headers.start_b_slice(cfg, cfg.qp, 1)
    hl = len(bw.get_bytes())
    pse = PSliceEncoder(cfg, cfg.qp, slice_type="B")
    pse.encode(bw, depth8, mvq8, coef_y, coef_cb, coef_cr)
    py_bytes = bw.get_bytes()[hl:]

    c_bytes = native.encode_slice_data_p(
        depth8, mvq8, coef_y, coef_cb, coef_cr, W, H, cfg.qp, is_b=True)
    assert c_bytes == py_bytes
