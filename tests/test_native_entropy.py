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


def _rand_sao(rng, n_ctu):
    """Random-but-legal SaoParams over n_ctu CTUs (with repeats so the
    merge_left/merge_up paths are exercised)."""
    from hevc_tpu.ops.sao import SaoParams
    type_idx = rng.randint(0, 3, (3, n_ctu)).astype(np.int32)
    eo_class = rng.randint(0, 4, (3, n_ctu)).astype(np.int32)
    band_pos = rng.randint(0, 32, (3, n_ctu)).astype(np.int32)
    offsets = rng.randint(0, 8, (3, n_ctu, 4)).astype(np.int32)
    # EO sign convention: cats 1,2 >= 0; cats 3,4 <= 0. Band: signed.
    offsets[..., 2:] *= -1
    band = type_idx == 1
    offsets[band] = rng.randint(-7, 8, (int(band.sum()), 4))
    # duplicate some CTUs from their left/up neighbour to hit merges
    for ci in range(1, n_ctu):
        if rng.rand() < 0.3:
            src = ci - 1
            type_idx[:, ci] = type_idx[:, src]
            eo_class[:, ci] = eo_class[:, src]
            band_pos[:, ci] = band_pos[:, src]
            offsets[:, ci] = offsets[:, src]
    return SaoParams(type_idx=type_idx, eo_class=eo_class,
                     band_pos=band_pos, offsets=offsets)


def test_native_i_slice_sao_matches_python():
    """Native I-slice CABAC with SAO syntax == Python byte-for-byte."""
    rng = np.random.RandomState(7)
    cfg = headers.EncoderConfig(width=192, height=128, qp=32, sao=True)
    W, H = cfg.pad_width, cfg.pad_height
    depth8 = legalize_depth(rng.randint(0, 4, (H // 8, W // 8)))
    modes8 = rng.randint(0, 35, (H // 8, W // 8)).astype(np.int32)
    coef_y = (rng.randint(-6, 7, (H, W)) *
              (rng.rand(H, W) < 0.12)).astype(np.int32)
    coef_cb = (rng.randint(-4, 5, (H // 2, W // 2)) *
               (rng.rand(H // 2, W // 2) < 0.08)).astype(np.int32)
    coef_cr = (rng.randint(-4, 5, (H // 2, W // 2)) *
               (rng.rand(H // 2, W // 2) < 0.06)).astype(np.int32)
    # make modes uniform per CU so MPM derivation agrees
    for y8 in range(H // 8):
        for x8 in range(W // 8):
            d = depth8[y8, x8]
            s = 8 >> d
            y0, x0 = (y8 // s) * s, (x8 // s) * s
            modes8[y8, x8] = modes8[y0, x0]
    sao = _rand_sao(rng, cfg.ctus_x * cfg.ctus_y)

    bw = headers.start_idr_slice(cfg, cfg.qp)
    hl = len(bw.get_bytes())
    se = SliceEncoder(cfg, cfg.qp)
    se.encode(bw, depth8, modes8, coef_y, coef_cb, coef_cr, sao=sao)
    py_bytes = bw.get_bytes()[hl:]

    c_bytes = native.encode_slice_data(
        depth8, modes8, coef_y, coef_cb, coef_cr, W, H, cfg.qp, sao=sao)
    assert c_bytes == py_bytes


def test_native_p_slice_multiref_sao_matches_python():
    """Native P-slice CABAC with 4 refs + SAO == Python byte-for-byte
    (ref_idx coding, AMVP with POC scaling, mvp_l0_flag choice)."""
    from hevc_tpu.entropy.slice_enc_p import PSliceEncoder

    rng = np.random.RandomState(11)
    cfg = headers.EncoderConfig(width=192, height=128, qp=30, sao=True)
    W, H = cfg.pad_width, cfg.pad_height
    n_refs, poc = 4, 7

    depth8 = np.zeros((H // 8, W // 8), np.int32)
    mvq8 = np.zeros((H // 8, W // 8, 2), np.int32)
    ref8 = np.zeros((H // 8, W // 8), np.int32)

    def rand_tree(y, x, size, depth):
        if depth < 3 and rng.rand() < 0.5:
            h = size // 2
            for dy, dx in ((0, 0), (0, h), (h, 0), (h, h)):
                rand_tree(y + dy, x + dx, h, depth + 1)
        else:
            depth8[y // 8:(y + size) // 8, x // 8:(x + size) // 8] = depth
            mvq8[y // 8:(y + size) // 8, x // 8:(x + size) // 8] = \
                rng.randint(-24, 25, 2)
            ref8[y // 8:(y + size) // 8, x // 8:(x + size) // 8] = \
                rng.randint(0, n_refs)

    for cy in range(H // 64):
        for cx in range(W // 64):
            rand_tree(cy * 64, cx * 64, 64, 0)

    coef_y = (rng.randint(-4, 5, (H, W)) *
              (rng.rand(H, W) < 0.1)).astype(np.int32)
    coef_cb = (rng.randint(-3, 4, (H // 2, W // 2)) *
               (rng.rand(H // 2, W // 2) < 0.08)).astype(np.int32)
    coef_cr = (rng.randint(-3, 4, (H // 2, W // 2)) *
               (rng.rand(H // 2, W // 2) < 0.05)).astype(np.int32)
    sao = _rand_sao(rng, cfg.ctus_x * cfg.ctus_y)

    bw = headers.start_p_slice(cfg, cfg.qp, poc)
    hl = len(bw.get_bytes())
    pse = PSliceEncoder(cfg, cfg.qp, n_refs=n_refs, poc=poc)
    pse.encode(bw, depth8, mvq8, coef_y, coef_cb, coef_cr, sao=sao,
               ref8=ref8)
    py_bytes = bw.get_bytes()[hl:]

    c_bytes = native.encode_slice_data_p(
        depth8, mvq8, coef_y, coef_cb, coef_cr, W, H, cfg.qp,
        ref8=ref8, n_refs=n_refs, poc=poc, sao=sao)
    assert c_bytes == py_bytes


def test_native_p_slice_intra_in_p_matches_python():
    """Native P CABAC with intra-in-P CUs (+4 refs, SAO) == Python."""
    from hevc_tpu.entropy.slice_enc_p import PSliceEncoder

    rng = np.random.RandomState(13)
    cfg = headers.EncoderConfig(width=192, height=128, qp=32, sao=True)
    W, H = cfg.pad_width, cfg.pad_height
    n_refs, poc = 4, 5

    depth8 = np.zeros((H // 8, W // 8), np.int32)
    mvq8 = np.zeros((H // 8, W // 8, 2), np.int32)
    ref8 = np.zeros((H // 8, W // 8), np.int32)
    intra8 = np.zeros((H // 8, W // 8), bool)
    imode8 = np.ones((H // 8, W // 8), np.int32)

    def rand_tree(y, x, size, depth):
        if depth < 3 and rng.rand() < 0.5:
            h = size // 2
            for dy, dx in ((0, 0), (0, h), (h, 0), (h, h)):
                rand_tree(y + dy, x + dx, h, depth + 1)
        else:
            s8 = slice(y // 8, (y + size) // 8), slice(x // 8,
                                                       (x + size) // 8)
            depth8[s8] = depth
            if rng.rand() < 0.3:      # ~30% of CUs intra
                intra8[s8] = True
                imode8[s8] = rng.randint(0, 35)
            else:
                mvq8[s8] = rng.randint(-24, 25, 2)
                ref8[s8] = rng.randint(0, n_refs)

    for cy in range(H // 64):
        for cx in range(W // 64):
            rand_tree(cy * 64, cx * 64, 64, 0)

    coef_y = (rng.randint(-4, 5, (H, W)) *
              (rng.rand(H, W) < 0.1)).astype(np.int32)
    coef_cb = (rng.randint(-3, 4, (H // 2, W // 2)) *
               (rng.rand(H // 2, W // 2) < 0.08)).astype(np.int32)
    coef_cr = (rng.randint(-3, 4, (H // 2, W // 2)) *
               (rng.rand(H // 2, W // 2) < 0.05)).astype(np.int32)
    sao = _rand_sao(rng, cfg.ctus_x * cfg.ctus_y)

    bw = headers.start_p_slice(cfg, cfg.qp, poc)
    hl = len(bw.get_bytes())
    pse = PSliceEncoder(cfg, cfg.qp, n_refs=n_refs, poc=poc)
    pse.encode(bw, depth8, mvq8, coef_y, coef_cb, coef_cr, sao=sao,
               ref8=ref8, intra8=intra8, imode8=imode8)
    py_bytes = bw.get_bytes()[hl:]

    c_bytes = native.encode_slice_data_p(
        depth8, mvq8, coef_y, coef_cb, coef_cr, W, H, cfg.qp,
        ref8=ref8, n_refs=n_refs, poc=poc, sao=sao,
        intra8=intra8, imode8=imode8)
    assert c_bytes == py_bytes


def test_native_rect_pu_matches_python():
    """Rect-PU (2NxN/Nx2N) P/B slices: native == Python byte-for-byte
    across partition mixes, depths 0-2, multi-ref, per-PU merge/AMVP."""
    from hevc_tpu.entropy.slice_enc_p import PSliceEncoder

    def synth_maps(seed, W, H, n_refs):
        rng = np.random.RandomState(seed)
        H8, W8 = H // 8, W // 8
        depth8 = np.zeros((H8, W8), np.int32)
        part8 = np.zeros((H8, W8), np.int32)
        mvq8 = np.zeros((H8, W8, 2), np.int32)
        ref8 = np.zeros((H8, W8), np.int32)
        for cy in range(H // 64):
            for cx in range(W // 64):
                if rng.randint(0, 2) == 0:
                    s8 = slice(cy * 8, cy * 8 + 8), slice(cx * 8, cx * 8 + 8)
                    depth8[s8] = 0
                    part8[s8] = rng.randint(0, 3)
                else:
                    for qy in range(2):
                        for qx in range(2):
                            d1 = rng.randint(1, 3)
                            s8 = (slice(cy * 8 + qy * 4, cy * 8 + qy * 4 + 4),
                                  slice(cx * 8 + qx * 4, cx * 8 + qx * 4 + 4))
                            depth8[s8] = d1
                            part8[s8] = rng.randint(0, 3)

        def walk(x0, y0, size, depth):
            d = depth8[y0 >> 3, x0 >> 3]
            if d > depth:
                h = size >> 1
                for (dx, dy) in ((0, 0), (h, 0), (0, h), (h, h)):
                    walk(x0 + dx, y0 + dy, h, depth + 1)
                return
            part = part8[y0 >> 3, x0 >> 3]

            def setpu(xs, ys, ws, hs):
                mv = rng.randint(-16, 17, 2)
                mvq8[ys >> 3:(ys + hs) >> 3, xs >> 3:(xs + ws) >> 3] = mv
                ref8[ys >> 3:(ys + hs) >> 3,
                     xs >> 3:(xs + ws) >> 3] = rng.randint(0, n_refs)

            if part == 0 or size == 8:
                part8[y0 >> 3:(y0 + size) >> 3,
                      x0 >> 3:(x0 + size) >> 3] = 0
                setpu(x0, y0, size, size)
            elif part == 1:
                setpu(x0, y0, size, size // 2)
                setpu(x0, y0 + size // 2, size, size // 2)
            else:
                setpu(x0, y0, size // 2, size)
                setpu(x0 + size // 2, y0, size // 2, size)

        for cy in range(H // 64):
            for cx in range(W // 64):
                walk(cx * 64, cy * 64, 64, 0)
        cy_ = ((rng.randint(0, 12, (H, W)) == 0)
               * rng.randint(-3, 4, (H, W))).astype(np.int32)
        cb_ = ((rng.randint(0, 16, (H // 2, W // 2)) == 0)
               * rng.randint(-2, 3, (H // 2, W // 2))).astype(np.int32)
        cr_ = ((rng.randint(0, 16, (H // 2, W // 2)) == 0)
               * rng.randint(-2, 3, (H // 2, W // 2))).astype(np.int32)
        return depth8, part8, mvq8, ref8, cy_, cb_, cr_

    W = H = 128
    for seed, is_b, n_refs in ((1, False, 1), (2, False, 4),
                               (3, True, 2)):
        d8, p8, mv, r8, cy_, cb_, cr_ = synth_maps(seed, W, H, n_refs)
        cfg = headers.EncoderConfig(width=W, height=H, qp=30,
                                    num_refs=n_refs)
        bw = (headers.start_b_slice(cfg, 30, 3, n_refs) if is_b
              else headers.start_p_slice(cfg, 30, 3, n_refs))
        hlen = len(bw.get_bytes())
        pse = PSliceEncoder(cfg, 30, slice_type="B" if is_b else "P",
                            n_refs=n_refs, poc=3)
        pse.encode(bw, d8, mv, cy_, cb_, cr_, ref8=r8, part8=p8)
        py = bw.get_bytes()[hlen:]
        cb2 = native.encode_slice_data_p(
            d8, mv, cy_, cb_, cr_, W, H, 30, is_b=is_b, ref8=r8,
            n_refs=n_refs, poc=3, part8=p8)
        assert cb2 == py, (seed, is_b, n_refs, len(cb2), len(py))


def test_native_dqp_matches_python():
    """cu_qp_delta syntax: native C++ == Python PSliceEncoder byte-for-
    byte on a per-CTB QP map with positive/negative/zero/large deltas
    (incl. the EG0 suffix) and an uncoded (all-skip-ish zero-coef) CTB
    inheriting qPY_PREV."""
    from hevc_tpu.entropy.slice_enc_p import PSliceEncoder

    rng = np.random.RandomState(4)
    W, H = 256, 64          # 4 CTUs in a row
    cfg = headers.EncoderConfig(width=W, height=H, qp=32,
                                cu_qp_delta=True)
    depth8 = np.zeros((H // 8, W // 8), np.int32)
    mvq8 = np.zeros((H // 8, W // 8, 2), np.int32)
    mvq8[..., 0] = 4        # non-zero motion so CUs aren't merge/skip
    coef_y = np.zeros((H, W), np.int32)
    # CTB 0: coefficients (delta +2); CTB 1: none (inherits); CTB 2:
    # big negative delta (EG0 path); CTB 3: delta 0
    for cx, nz in ((0, True), (1, False), (2, True), (3, True)):
        if nz:
            coef_y[8, cx * 64 + 5] = rng.randint(1, 9)
    coef_c = np.zeros((H // 2, W // 2), np.int32)
    qp_map = np.array([[34, 34, 26, 26]], np.int32)

    bw = headers.start_p_slice(cfg, cfg.qp, 1)
    hl = len(bw.get_bytes())
    pse = PSliceEncoder(cfg, cfg.qp)
    pse.encode(bw, depth8, mvq8, coef_y, coef_c, coef_c, qp_map=qp_map)
    py_bytes = bw.get_bytes()[hl:]

    c_bytes = native.encode_slice_data_p(
        depth8, mvq8, coef_y, coef_c, coef_c, W, H, cfg.qp,
        qp_map=qp_map)
    assert c_bytes == py_bytes

    # and the decoder round-trips the QP map (uncoded CTB 1 inherits 34)
    from hevc_tpu.decoder import headers_dec, slice_dec

    class _Sps:
        pad_width, pad_height, ctus_x, ctus_y = W, H, 4, 1

    dec = slice_dec.PSliceDecoder(_Sps, cfg.qp, False,
                                  cu_qp_delta=True).decode(py_bytes)
    np.testing.assert_array_equal(dec["qp_ctb"],
                                  np.array([[34, 34, 26, 26]]))
