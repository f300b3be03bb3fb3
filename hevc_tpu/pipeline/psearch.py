"""Batched P-frame CU-tree RDO search on TPU.

The inter analogue of pipeline/search.py: for every CTU of a P frame in
parallel, run motion estimation for all 85 quadtree nodes (1 + 4 + 16 +
64), compute leaf RD costs (reconstruction SSE + lambda * estimated
bits), and decide the CU tree bottom-up — with ETH-LSTM HCPM
probabilities gating the split decisions via the reference's three-way
rule (HM-16.5_Test_LDP/TEncCu.cpp:437-470 semantics, re-expressed as
masks; the `decide_tree` reducer is shared with the intra path).

TPU-first ME: one full integer-pel SAD *field* at 8x8 granularity per
CTU (ops/inter.sad_grid8) is aggregated bottom-up into exact SADs for
16/32/64 nodes (SAD is additive over sub-blocks at a fixed MV), so the
whole quadtree shares a single search pass — replacing HM's per-PU
sequential TZ search (TEncSearch.cpp:3663). Each node then gets its own
batched quarter-pel refinement with the normative MC filters.

Unlike intra, inter prediction has no in-frame dependency, so the final
reconstruction is pure selection: every depth's full coding (MC ->
residual -> transform -> RDOQ -> dequant -> inverse transform -> recon)
is computed batched, and the decided depth map gathers the surviving
leaves. MC is translation-invariant, so a leaf CU's prediction equals
the union of its 8x8 sub-blocks predicted at the same MV — per-8x8
selection is exact.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import inter, quant, rdoq as rdoq_lib, transforms
from . import search as search_lib


class PSearchResult(NamedTuple):
    depth8: jax.Array    # [B, 8, 8] int32 depth of each 8x8 unit
    mv8: jax.Array       # [B, 8, 8, 2] int32 quarter-pel MV per 8x8 unit
    ref8: jax.Array      # [B, 8, 8] int32 L0 refIdx per 8x8 unit
    coef_y: jax.Array    # [B, 64, 64] int16 quantized luma levels
    coef_cb: jax.Array   # [B, 32, 32] int16
    coef_cr: jax.Array   # [B, 32, 32] int16
    rec_y: jax.Array     # [B, 64, 64] uint8 reconstruction
    rec_cb: jax.Array    # [B, 32, 32] uint8
    rec_cr: jax.Array    # [B, 32, 32] uint8


def _node_blocks(tiles, depth: int):
    """[B, S, S] CTU-tiles -> [B * 4^depth, s, s] raster node blocks."""
    B, S, _ = tiles.shape
    n = 1 << depth
    s = S // n
    t = tiles.reshape(B, n, s, n, s).transpose(0, 1, 3, 2, 4)
    return t.reshape(B * n * n, s, s)


def _blocks_to_tiles(blocks, depth: int, B: int):
    """Inverse of _node_blocks."""
    n = 1 << depth
    s = blocks.shape[-1]
    t = blocks.reshape(B, n, n, s, s).transpose(0, 1, 3, 2, 4)
    return t.reshape(B, n * s, n * s)


def _node_origins(ctu_origins, depth: int, chroma: bool = False):
    """[B * 4^depth, 2] plane coords of every node at `depth`."""
    offx, offy = search_lib._node_offsets(depth)
    base = ctu_origins[:, None, :] + jnp.stack(
        [jnp.asarray(offx), jnp.asarray(offy)], -1)[None]
    o = base.reshape(-1, 2)
    return o // 2 if chroma else o


def _tu_transform(blocks, qp: int, tu: int, lam, use_rdoq: bool,
                  is_luma: bool = True):
    """[N, s, s] residual blocks -> (levels, recon_residual, bits) with
    TUs of size `tu` tiled in place. bits [N] = syntax-aware CABAC rate
    estimate summed over the node's TUs (ops/bits.py)."""
    N, s, _ = blocks.shape
    g = s // tu
    t = blocks.reshape(N, g, tu, g, tu).transpose(0, 1, 3, 2, 4)
    t = t.reshape(N * g * g, tu, tu)
    cf = transforms.forward_transform(t)
    if use_rdoq:
        lvl = rdoq_lib.rd_quantize(cf, qp, lam, is_intra=False,
                                   is_luma=is_luma)
    else:
        lvl = quant.quantize(cf, qp, is_intra=False)
    rr = transforms.inverse_transform(quant.dequantize(lvl, qp))
    if search_lib.BIT_MODEL == "exact":
        from ..ops import bits_exact
        bits = bits_exact.tu_bits_exact(lvl, qp=int(qp), is_luma=is_luma,
                                        init_type=1)
    else:
        from ..ops import bits as bits_lib
        bits = bits_lib.tu_bits(lvl, is_luma=is_luma)
    bits = bits.reshape(N, g * g).sum(-1)

    def back(x):
        x = x.reshape(N, g, g, tu, tu).transpose(0, 1, 3, 2, 4)
        return x.reshape(N, s, s)

    return back(lvl), back(rr), bits


def _mvd_bits(mv_q, pred_q):
    """Estimated MVD rate vs an approximate predictor (EG1-ish length)."""
    d = jnp.abs(mv_q - pred_q).astype(jnp.float32)
    return (1.0 + jnp.where(d > 0, 2.0 * jnp.log2(d + 1.0) + 1.0, 0.0)
            ).sum(-1)


def p_search_frame(cur_y, cur_cb, cur_cr, ref_y, ref_cb, ref_cr,
                   ctu_origins, *, qp: int, pad_w: int, pad_h: int,
                   hcpm_probs: Optional[jax.Array] = None,
                   thr_up=(1.1, 1.1, 1.1), thr_down=(-0.1, -0.1, -0.1),
                   radius: int = 8, use_rdoq: bool = True,
                   n_active_refs: int = 1, max_depth: int = 3):
    """Full quadtree inter search + coding of one P frame (jittable).

    cur_*: planes. ref_*: reference plane stacks [R, H, W] (RefPicList0
    order, newest first) or single planes [H, W]; the stack may repeat
    pictures to keep R static — `n_active_refs` (static) masks the
    invalid tail so only real references are ever selected, keeping one
    compiled program across the sequence ramp-up. ctu_origins: [B, 2].
    hcpm_probs: [B, 21] ETH-LSTM outputs or None (pure search).
    Returns PSearchResult (incl. the per-8x8 L0 refIdx map).

    Multi-reference ME (reference operating point: 4 active refs,
    encoder_lowdelay_P_main.cfg:24): one integer SAD field per
    reference, best (ref, mv) per node by SAD + approximate motion rate,
    then quarter-pel refinement and residual coding on the winner only
    (HM searches each ref fully, TEncSearch.cpp:2912; the
    winner-only residual pass keeps the transform work ref-count-
    independent).
    """
    B = ctu_origins.shape[0]
    cur_y = jnp.asarray(cur_y)
    ref_y = jnp.asarray(ref_y)
    ref_cb = jnp.asarray(ref_cb)
    ref_cr = jnp.asarray(ref_cr)
    if ref_y.ndim == 2:
        ref_y, ref_cb, ref_cr = ref_y[None], ref_cb[None], ref_cr[None]
    R = ref_y.shape[0]
    # dynamic (traced) active-ref count: one compiled program serves the
    # whole sequence ramp-up (1, 2, .., num_refs active references)
    n_act = jnp.minimum(jnp.asarray(n_active_refs, jnp.int32), R)
    lam = float(0.57 * 2.0 ** ((qp - 12) / 3.0))
    sqrt_lam = float(np.sqrt(lam))
    cqp = quant.chroma_qp(qp)
    # ref_idx_l0 TU bin count per value (cMax = n_act - 1)
    ref_ids = jnp.arange(R, dtype=jnp.int32)
    ref_bits_tab = jnp.where(
        n_act > 1,
        jnp.minimum(ref_ids + 1, jnp.maximum(n_act - 1, 1)),
        0).astype(jnp.float32)

    h, w = cur_y.shape
    ys = jnp.clip(ctu_origins[:, 1:2, None] + jnp.arange(64)[None, :, None],
                  0, h - 1)
    xs = jnp.clip(ctu_origins[:, 0:1, None] + jnp.arange(64)[None, None, :],
                  0, w - 1)
    cur_y_t = jnp.take(cur_y.reshape(-1), ys * w + xs, axis=0
                       ).astype(jnp.int32)

    def chroma_tiles(plane):
        p = jnp.asarray(plane)
        hc, wc = p.shape
        o = ctu_origins // 2
        ysc = jnp.clip(o[:, 1:2, None] + jnp.arange(32)[None, :, None],
                       0, hc - 1)
        xsc = jnp.clip(o[:, 0:1, None] + jnp.arange(32)[None, None, :],
                       0, wc - 1)
        return jnp.take(p.reshape(-1), ysc * wc + xsc, axis=0
                        ).astype(jnp.int32)

    cur_cb_t = chroma_tiles(cur_cb)
    cur_cr_t = chroma_tiles(cur_cr)

    # --- shared integer ME fields (one per reference) ---------------------
    n_side = 2 * radius + 1
    sad8 = jax.vmap(lambda r: inter.sad_grid8(cur_y_t, r, ctu_origins,
                                              radius=radius))(ref_y)
    # [R, n_cand, B, 8, 8] -> aggregate up the tree (SAD is additive)
    def pool(s):
        r_, c, b, n, _ = s.shape
        return s.reshape(r_, c, b, n // 2, 2, n // 2, 2).sum((4, 6))

    sad_by_depth = {3: sad8}
    for d in (2, 1, 0):
        sad_by_depth[d] = pool(sad_by_depth[d + 1])

    # --- per-depth node ME + coding --------------------------------------
    mv_maps = {}
    ref_maps = {}
    cost_maps = {}
    lvl_y_d, rr_y_d = {}, {}
    lvl_cb_d, rr_cb_d = {}, {}
    lvl_cr_d, rr_cr_d = {}, {}
    pred_y_d, pred_cb_d, pred_cr_d = {}, {}, {}

    max_depth = min(3, max(max_depth,
                           search_lib.forced_depth_floor(pad_w, pad_h)))
    for d in range(4):
        n = 1 << d
        s = 64 >> d
        nd = n * n
        if d > max_depth:
            # frame-level early exit (same contract as the intra
            # search_frame max_depth): never-selected placeholders
            mv_maps[d] = jnp.zeros((B, n, n, 2), jnp.int32)
            ref_maps[d] = jnp.zeros((B, n, n), jnp.int32)
            cost_maps[d] = jnp.full((B, nd), jnp.float32(3.4e38))
            sl = 64 // n
            cl = 32 // n
            z = jnp.zeros((B * nd, sl, sl), jnp.int32)
            zc = jnp.zeros((B * nd, cl, cl), jnp.int32)
            lvl_y_d[d] = rr_y_d[d] = pred_y_d[d] = z
            lvl_cb_d[d] = rr_cb_d[d] = pred_cb_d[d] = zc
            lvl_cr_d[d] = rr_cr_d[d] = pred_cr_d[d] = zc
            continue
        sads = sad_by_depth[d].reshape(R, n_side * n_side, B * nd)
        best = jnp.argmin(sads, axis=1)                # [R, B*nd]
        sad_best = jnp.min(sads, axis=1).astype(jnp.float32)
        mv_int_r = jnp.stack([best % n_side - radius,
                              best // n_side - radius],
                             -1).astype(jnp.int32)     # [R, B*nd, 2]
        # ref choice: SAD + sqrt(lambda) * (ref_idx bins + rough MV rate)
        mv_rate = (2.0 * jnp.log2(jnp.abs(mv_int_r).sum(-1) + 1.0) + 1.0)
        ref_cost = sad_best + sqrt_lam * (ref_bits_tab[:, None] + mv_rate)
        ref_cost = jnp.where((ref_ids < n_act)[:, None], ref_cost,
                             jnp.float32(3.4e38))
        ref_sel = jnp.argmin(ref_cost, axis=0).astype(jnp.int32)  # [B*nd]
        mv_int = jnp.take_along_axis(
            mv_int_r, ref_sel[None, :, None], axis=0)[0]

        node_org = _node_origins(ctu_origins, d)
        cur_blocks = _node_blocks(cur_y_t, d)
        mv_q, _ = inter.quarter_refine_blocks(cur_blocks, ref_y, node_org,
                                              mv_int, s, ref_idx=ref_sel)
        mv_maps[d] = mv_q.reshape(B, n, n, 2)
        ref_maps[d] = ref_sel.reshape(B, n, n)

        pred = inter.predict_inter_blocks(ref_y, node_org, mv_q, s,
                                          is_luma=True, ref_idx=ref_sel)
        resi = cur_blocks.astype(jnp.int32) - pred
        tu = min(s, 32)
        lvl, rr, bits_y = _tu_transform(resi, qp, tu, lam, use_rdoq)
        lvl_y_d[d], rr_y_d[d], pred_y_d[d] = lvl, rr, pred

        # chroma (4:2:0): node size s/2, TU = min(s, 32) / 2
        corg = _node_origins(ctu_origins, d, chroma=True)
        ctu_c = min(s, 32) // 2
        pred_cb = inter.predict_inter_blocks(ref_cb, corg, mv_q, s // 2,
                                             is_luma=False,
                                             ref_idx=ref_sel)
        pred_cr = inter.predict_inter_blocks(ref_cr, corg, mv_q, s // 2,
                                             is_luma=False,
                                             ref_idx=ref_sel)
        resi_cb = _node_blocks(cur_cb_t, d).astype(jnp.int32) - pred_cb
        resi_cr = _node_blocks(cur_cr_t, d).astype(jnp.int32) - pred_cr
        lvl_cb, rr_cb, bits_cb = _tu_transform(resi_cb, cqp, ctu_c, lam,
                                               use_rdoq, is_luma=False)
        lvl_cr, rr_cr, bits_cr = _tu_transform(resi_cr, cqp, ctu_c, lam,
                                               use_rdoq, is_luma=False)
        lvl_cb_d[d], rr_cb_d[d], pred_cb_d[d] = lvl_cb, rr_cb, pred_cb
        lvl_cr_d[d], rr_cr_d[d], pred_cr_d[d] = lvl_cr, rr_cr, pred_cr

        # leaf RD cost: luma + chroma SSE, coef bits, MVD bits, mode ovh
        rec = jnp.clip(pred + rr, 0, 255)
        dy_ = (rec - cur_blocks).astype(jnp.float32)
        sse = (dy_ * dy_).sum((-2, -1))
        rec_cb = jnp.clip(pred_cb + rr_cb, 0, 255)
        rec_cr = jnp.clip(pred_cr + rr_cr, 0, 255)
        dcb = (rec_cb - _node_blocks(cur_cb_t, d)).astype(jnp.float32)
        dcr = (rec_cr - _node_blocks(cur_cr_t, d)).astype(jnp.float32)
        sse = sse + (dcb * dcb).sum((-2, -1)) + (dcr * dcr).sum((-2, -1))

        bits = bits_y + bits_cb + bits_cr
        # approximate MVD predictor: zero at depth 0, else the CTU-level MV
        if d == 0:
            pred_mv = jnp.zeros_like(mv_q)
        else:
            pred_mv = jnp.broadcast_to(mv_maps[0].reshape(B, 1, 2),
                                       (B, nd, 2)).reshape(B * nd, 2)
        bits = (bits + _mvd_bits(mv_q, pred_mv) + 6.0   # flags overhead
                + ref_bits_tab[ref_sel])                # ref_idx_l0 bins
        cost_maps[d] = (sse + lam * bits).reshape(B, nd)

    split0, split1, split2, depth8 = search_lib.decide_tree(
        cost_maps, ctu_origins, pad_w=pad_w, pad_h=pad_h,
        split_bits=lam * 2.0, hcpm_probs=hcpm_probs, thr_up=thr_up,
        thr_down=thr_down)

    # --- select final coding per 8x8 unit ---------------------------------
    def select_plane(per_depth, S, unit):
        planes = jnp.stack([_blocks_to_tiles(per_depth[d], d, B)
                            for d in range(4)], -1)     # [B, S, S, 4]
        dmap = jnp.repeat(jnp.repeat(depth8, unit, 1), unit, 2)
        return jnp.take_along_axis(planes, dmap[..., None], axis=-1)[..., 0]

    coef_y = select_plane(lvl_y_d, 64, 8)
    rr_y = select_plane(rr_y_d, 64, 8)
    py = select_plane(pred_y_d, 64, 8)
    coef_cb = select_plane(lvl_cb_d, 32, 4)
    rr_cb = select_plane(rr_cb_d, 32, 4)
    pcb = select_plane(pred_cb_d, 32, 4)
    coef_cr = select_plane(lvl_cr_d, 32, 4)
    rr_cr = select_plane(rr_cr_d, 32, 4)
    pcr = select_plane(pred_cr_d, 32, 4)

    rec_y = jnp.clip(py + rr_y, 0, 255).astype(jnp.uint8)
    rec_cb = jnp.clip(pcb + rr_cb, 0, 255).astype(jnp.uint8)
    rec_cr = jnp.clip(pcr + rr_cr, 0, 255).astype(jnp.uint8)

    mv_stack = jnp.stack([
        jnp.repeat(jnp.repeat(mv_maps[d], 8 >> d, 1), 8 >> d, 2)
        for d in range(4)], -2)                         # [B, 8, 8, 4, 2]
    mv8 = jnp.take_along_axis(
        mv_stack, depth8[..., None, None].astype(jnp.int32),
        axis=-2)[..., 0, :]
    ref_stack = jnp.stack([
        jnp.repeat(jnp.repeat(ref_maps[d], 8 >> d, 1), 8 >> d, 2)
        for d in range(4)], -1)                         # [B, 8, 8, 4]
    ref8 = jnp.take_along_axis(
        ref_stack, depth8[..., None].astype(jnp.int32), axis=-1)[..., 0]

    return PSearchResult(depth8=depth8, mv8=mv8, ref8=ref8,
                         coef_y=coef_y.astype(jnp.int16),
                         coef_cb=coef_cb.astype(jnp.int16),
                         coef_cr=coef_cr.astype(jnp.int16),
                         rec_y=rec_y, rec_cb=rec_cb, rec_cr=rec_cr)
