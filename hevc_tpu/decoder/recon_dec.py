"""Decoder-side reconstruction from parsed decision tensors.

Counterpart of TDecCu::decompressCtu + TDecSlice loop-filter invocation
(TDecCu.cpp:128, TDecGop.cpp:145-150), built on the same normative ops
the encoder uses (ops/intra, ops/inter MC, ops/transforms, ops/quant,
ops/deblock, ops/sao) — one implementation of the normative math for
both directions.

Intra reconstruction is the sequential z-order walk (prediction needs
reconstructed neighbours); inter prediction is batched per CU size with
the jitted MC kernels.
"""

from __future__ import annotations

import numpy as np

from ..core import zorder
from ..core.yuv import Frame
from ..ops import quant, transforms
from ..pipeline.golden import _predict_tu


def _add_residual(recon, coef, x0, y0, n, qp, pred, use_dst=False):
    lvl = coef[y0:y0 + n, x0:x0 + n]
    if np.any(lvl):
        deq = quant.dequantize_np(lvl[None], qp)[0]
        rresi = transforms.inverse_transform_np(deq[None],
                                                use_dst=use_dst)[0]
    else:
        rresi = 0
    recon[y0:y0 + n, x0:x0 + n] = np.clip(pred + rresi, 0, 255)


def recon_intra_frame(dec: dict, W: int, H: int, qp: int) -> Frame:
    """Reconstruct an I picture from ISliceDecoder output (pre-filter)."""
    depth8 = dec["depth8"]
    modes4 = dec["modes4"]
    nxn8 = dec["nxn8"]
    coef_y, coef_cb, coef_cr = dec["coef_y"], dec["coef_cb"], dec["coef_cr"]
    zmap = zorder.frame_zmap(W, H)
    cqp = quant.chroma_qp(qp)

    recon_y = np.zeros((H, W), np.int32)
    recon_cb = np.zeros((H // 2, W // 2), np.int32)
    recon_cr = np.zeros((H // 2, W // 2), np.int32)

    def tu_intra(recon, coef, x0, y0, n, mode, q, component, scale=1,
                 use_dst=False):
        pw, ph = (W // scale, H // scale)
        pred = _predict_tu(recon, zmap, x0, y0, n, mode,
                           component=component, pad_w=pw, pad_h=ph,
                           scale=scale)
        _add_residual(recon, coef, x0, y0, n, q, pred, use_dst)

    def code_cu(x0, y0, size):
        if size == 8 and nxn8[y0 >> 3, x0 >> 3]:
            pu0 = int(modes4[y0 >> 2, x0 >> 2])
            for (dx, dy) in ((0, 0), (4, 0), (0, 4), (4, 4)):
                m = int(modes4[(y0 + dy) >> 2, (x0 + dx) >> 2])
                tu_intra(recon_y, coef_y, x0 + dx, y0 + dy, 4, m, qp,
                         "luma", use_dst=True)
            tu_intra(recon_cb, coef_cb, x0 >> 1, y0 >> 1, 4, pu0, cqp,
                     "chroma", scale=2)
            tu_intra(recon_cr, coef_cr, x0 >> 1, y0 >> 1, 4, pu0, cqp,
                     "chroma", scale=2)
            return
        mode = int(modes4[y0 >> 2, x0 >> 2])
        if size == 64:
            for (dx, dy) in ((0, 0), (32, 0), (0, 32), (32, 32)):
                tu_intra(recon_y, coef_y, x0 + dx, y0 + dy, 32, mode, qp,
                         "luma")
            for (dx, dy) in ((0, 0), (16, 0), (0, 16), (16, 16)):
                cx, cy = (x0 >> 1) + dx, (y0 >> 1) + dy
                tu_intra(recon_cb, coef_cb, cx, cy, 16, mode, cqp,
                         "chroma", scale=2)
                tu_intra(recon_cr, coef_cr, cx, cy, 16, mode, cqp,
                         "chroma", scale=2)
        else:
            tu_intra(recon_y, coef_y, x0, y0, size, mode, qp, "luma")
            half = size >> 1
            tu_intra(recon_cb, coef_cb, x0 >> 1, y0 >> 1, half, mode, cqp,
                     "chroma", scale=2)
            tu_intra(recon_cr, coef_cr, x0 >> 1, y0 >> 1, half, mode, cqp,
                     "chroma", scale=2)

    def walk(x0, y0, size, depth):
        if x0 >= W or y0 >= H:
            return
        inside = (x0 + size <= W) and (y0 + size <= H)
        split = (not inside and size > 8) or \
            (inside and depth8[y0 >> 3, x0 >> 3] > depth)
        if split:
            h = size >> 1
            for (dx, dy) in ((0, 0), (h, 0), (0, h), (h, h)):
                walk(x0 + dx, y0 + dy, h, depth + 1)
        else:
            code_cu(x0, y0, size)

    nx = -(-W // 64)
    ny = -(-H // 64)
    for ci in range(nx * ny):
        cy, cx = divmod(ci, nx)
        walk(cx * 64, cy * 64, 64, 0)

    return Frame(recon_y.astype(np.uint8), recon_cb.astype(np.uint8),
                 recon_cr.astype(np.uint8))


def _collect_cus(depth8, W, H):
    """[(x0, y0, size)] leaves of the coded quadtree, z-order."""
    out = []

    def walk(x0, y0, size, depth):
        if x0 >= W or y0 >= H:
            return
        inside = (x0 + size <= W) and (y0 + size <= H)
        split = (not inside and size > 8) or \
            (inside and depth8[y0 >> 3, x0 >> 3] > depth)
        if split:
            h = size >> 1
            for (dx, dy) in ((0, 0), (h, 0), (0, h), (h, h)):
                walk(x0 + dx, y0 + dy, h, depth + 1)
        else:
            out.append((x0, y0, size))

    nx = -(-W // 64)
    for ci in range(nx * (-(-H // 64))):
        cy, cx = divmod(ci, nx)
        walk(cx * 64, cy * 64, 64, 0)
    return out


def recon_inter_frame(dec: dict, refs, W: int, H: int,
                      qp: int) -> Frame:
    """Reconstruct a P picture: batched MC per CU size + residual add.
    refs: RefPicList0 (list of Frames, or a single Frame)."""
    import jax.numpy as jnp
    from ..ops import inter

    if isinstance(refs, Frame):
        refs = [refs]
    depth8 = dec["depth8"]
    mvq8 = dec["mvq8"]
    ref8 = dec.get("ref8")
    if ref8 is None:
        ref8 = np.zeros_like(depth8)
    coef_y, coef_cb, coef_cr = dec["coef_y"], dec["coef_cb"], dec["coef_cr"]
    cqp = quant.chroma_qp(qp)
    # per-CTB QP (cu_qp_delta streams, LCU rate control): dequantize
    # each CU at its CTB's signalled QP (8.6.1, diff_cu_qp_depth = 0)
    qp_ctb = dec.get("qp_ctb")

    def qp_at(x, y):
        return qp if qp_ctb is None else int(qp_ctb[y >> 6, x >> 6])

    def cqp_at(x, y):
        return (cqp if qp_ctb is None
                else quant.chroma_qp(int(qp_ctb[y >> 6, x >> 6])))

    recon_y = np.zeros((H, W), np.int32)
    recon_cb = np.zeros((H // 2, W // 2), np.int32)
    recon_cr = np.zeros((H // 2, W // 2), np.int32)

    cus = _collect_cus(depth8, W, H)
    intra8 = dec.get("intra8")
    if intra8 is not None and not intra8.any():
        intra8 = None
    part8 = dec.get("part8")
    if part8 is not None and not part8.any():
        part8 = None
    ref_y = jnp.asarray(np.stack([r.y.astype(np.int32) for r in refs]))
    ref_cb = jnp.asarray(np.stack([r.cb.astype(np.int32) for r in refs]))
    ref_cr = jnp.asarray(np.stack([r.cr.astype(np.int32) for r in refs]))

    if part8 is not None:
        # rectangular-PU CUs: MC per half (mvq8 already carries each
        # PU's motion; MC is translation-invariant so per-half windows
        # match the encoder's PU predictions exactly), residual per the
        # inferred TU split (TU = s/2 for 16/32 CUs, 32 for 64).
        for (x0, y0, size) in cus:
            part = int(part8[y0 >> 3, x0 >> 3])
            if part == 0 or (intra8 is not None
                             and intra8[y0 >> 3, x0 >> 3]):
                continue
            h = size >> 1
            pus = ([(x0, y0, size, h), (x0, y0 + h, size, h)]
                   if part == 1
                   else [(x0, y0, h, size), (x0 + h, y0, h, size)])
            pred_y = np.zeros((size, size), np.int32)
            pred_cb = np.zeros((size >> 1, size >> 1), np.int32)
            pred_cr = np.zeros((size >> 1, size >> 1), np.int32)
            for (xp, yp, wp, hp) in pus:
                mv = jnp.asarray(mvq8[yp >> 3, xp >> 3][None])
                ri = jnp.asarray(
                    np.array([ref8[yp >> 3, xp >> 3]], np.int32))
                org = jnp.asarray(np.array([[xp, yp]], np.int32))
                py = np.asarray(inter.predict_inter_blocks(
                    ref_y, org, mv, hp, is_luma=True, ref_idx=ri,
                    size_w=wp))[0]
                pcb = np.asarray(inter.predict_inter_blocks(
                    ref_cb, org // 2, mv, hp >> 1, is_luma=False,
                    ref_idx=ri, size_w=wp >> 1))[0]
                pcr = np.asarray(inter.predict_inter_blocks(
                    ref_cr, org // 2, mv, hp >> 1, is_luma=False,
                    ref_idx=ri, size_w=wp >> 1))[0]
                dy0, dx0 = yp - y0, xp - x0
                pred_y[dy0:dy0 + hp, dx0:dx0 + wp] = py
                pred_cb[dy0 >> 1:(dy0 + hp) >> 1,
                        dx0 >> 1:(dx0 + wp) >> 1] = pcb
                pred_cr[dy0 >> 1:(dy0 + hp) >> 1,
                        dx0 >> 1:(dx0 + wp) >> 1] = pcr
            tu = 32 if size == 64 else size >> 1
            ctu_ = tu >> 1
            for ty in range(size // tu):
                for tx in range(size // tu):
                    px, py_ = tx * tu, ty * tu
                    _add_residual(recon_y, coef_y, x0 + px, y0 + py_, tu,
                                  qp_at(x0, y0),
                                  pred_y[py_:py_ + tu, px:px + tu])
            half = size >> 1
            for ty in range(half // ctu_):
                for tx in range(half // ctu_):
                    px, py_ = tx * ctu_, ty * ctu_
                    _add_residual(recon_cb, coef_cb, (x0 >> 1) + px,
                                  (y0 >> 1) + py_, ctu_, cqp_at(x0, y0),
                                  pred_cb[py_:py_ + ctu_, px:px + ctu_])
                    _add_residual(recon_cr, coef_cr, (x0 >> 1) + px,
                                  (y0 >> 1) + py_, ctu_, cqp_at(x0, y0),
                                  pred_cr[py_:py_ + ctu_, px:px + ctu_])

    for size in (8, 16, 32, 64):
        group = [(x, y) for (x, y, s) in cus if s == size
                 and not (intra8 is not None and intra8[y >> 3, x >> 3])
                 and not (part8 is not None and part8[y >> 3, x >> 3])]
        if not group:
            continue
        org = np.array(group, np.int32)
        mv = np.stack([mvq8[y >> 3, x >> 3] for (x, y) in group])
        ri = jnp.asarray(np.array([ref8[y >> 3, x >> 3]
                                   for (x, y) in group], np.int32))
        pred_y = np.asarray(inter.predict_inter_blocks(
            ref_y, jnp.asarray(org), jnp.asarray(mv), size, is_luma=True,
            ref_idx=ri))
        pred_cb = np.asarray(inter.predict_inter_blocks(
            ref_cb, jnp.asarray(org // 2), jnp.asarray(mv), size >> 1,
            is_luma=False, ref_idx=ri))
        pred_cr = np.asarray(inter.predict_inter_blocks(
            ref_cr, jnp.asarray(org // 2), jnp.asarray(mv), size >> 1,
            is_luma=False, ref_idx=ri))
        tu = 32 if size == 64 else size
        ctu_ = 16 if size == 64 else size >> 1
        for i, (x0, y0) in enumerate(group):
            # luma TUs (CU 64 splits into 4 32x32, others TU == CU)
            for ty in range(size // tu):
                for tx in range(size // tu):
                    px, py = tx * tu, ty * tu
                    _add_residual(recon_y, coef_y, x0 + px, y0 + py, tu,
                                  qp_at(x0, y0),
                                  pred_y[i, py:py + tu, px:px + tu])
            half = size >> 1
            for ty in range(half // ctu_):
                for tx in range(half // ctu_):
                    px, py = tx * ctu_, ty * ctu_
                    _add_residual(recon_cb, coef_cb, (x0 >> 1) + px,
                                  (y0 >> 1) + py, ctu_, cqp_at(x0, y0),
                                  pred_cb[i, py:py + ctu_, px:px + ctu_])
                    _add_residual(recon_cr, coef_cr, (x0 >> 1) + px,
                                  (y0 >> 1) + py, ctu_, cqp_at(x0, y0),
                                  pred_cr[i, py:py + ctu_, px:px + ctu_])

    if intra8 is not None:
        # intra-in-P CUs: sequential z-order patch from reconstructed
        # neighbours (mirror of pipeline/intra_p.patch_intra_cus)
        imodes4 = dec["imodes4"]
        zmap = zorder.frame_zmap(W, H)

        def tu_intra(recon, coef, x0, y0, n, mode, q, component, scale=1):
            pw, ph = (W // scale, H // scale)
            pred = _predict_tu(recon, zmap, x0, y0, n, mode,
                               component=component, pad_w=pw, pad_h=ph,
                               scale=scale)
            _add_residual(recon, coef, x0, y0, n, q, pred)

        for (x0, y0, size) in cus:
            if not intra8[y0 >> 3, x0 >> 3]:
                continue
            mode = int(imodes4[y0 >> 2, x0 >> 2])
            if size == 64:
                for (dx, dy) in ((0, 0), (32, 0), (0, 32), (32, 32)):
                    tu_intra(recon_y, coef_y, x0 + dx, y0 + dy, 32, mode,
                             qp, "luma")
                for (dx, dy) in ((0, 0), (16, 0), (0, 16), (16, 16)):
                    cx, cy = (x0 >> 1) + dx, (y0 >> 1) + dy
                    tu_intra(recon_cb, coef_cb, cx, cy, 16, mode, cqp,
                             "chroma", scale=2)
                    tu_intra(recon_cr, coef_cr, cx, cy, 16, mode, cqp,
                             "chroma", scale=2)
            else:
                tu_intra(recon_y, coef_y, x0, y0, size, mode, qp, "luma")
                half = size >> 1
                tu_intra(recon_cb, coef_cb, x0 >> 1, y0 >> 1, half, mode,
                         cqp, "chroma", scale=2)
                tu_intra(recon_cr, coef_cr, x0 >> 1, y0 >> 1, half, mode,
                         cqp, "chroma", scale=2)

    return Frame(recon_y.astype(np.uint8), recon_cb.astype(np.uint8),
                 recon_cr.astype(np.uint8))


def apply_loop_filters(rec: Frame, dec: dict, qp: int, *,
                       deblock_on: bool, sao_on: bool,
                       inter_pic: bool) -> Frame:
    """In-loop filters in normative order: deblocking, then SAO."""
    y, cb, cr = rec.y, rec.cb, rec.cr
    if deblock_on:
        from ..ops import deblock as dbk
        if inter_pic:
            intra8 = dec.get("intra8")
            if intra8 is not None and not intra8.any():
                intra8 = None
            part8 = dec.get("part8")
            if part8 is not None and not part8.any():
                part8 = None
            y, cb, cr = dbk.deblock_frame_inter(
                y, cb, cr, dec["depth8"], dec["mvq8"], dec["coef_y"], qp,
                ref8=dec.get("ref8"), intra8=intra8, part8=part8)
        else:
            y, cb, cr = dbk.deblock_frame(y, cb, cr, dec["depth8"], qp)
    if sao_on and dec.get("sao") is not None:
        from ..ops import sao as sao_lib
        y, cb, cr = sao_lib.apply_frame(y, cb, cr, dec["sao"])
    return Frame(np.asarray(y).astype(np.uint8),
                 np.asarray(cb).astype(np.uint8),
                 np.asarray(cr).astype(np.uint8))
