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
    intra8: jax.Array    # [B, 8, 8] bool: CU coded intra (intra-in-P)
    imode8: jax.Array    # [B, 8, 8] int32 intra luma mode (where intra8)
    part8: jax.Array     # [B, 8, 8] int32 PU partition of the CU
    #                      (0 = 2Nx2N, 1 = 2NxN, 2 = Nx2N)


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


def _tu_transform(blocks, qp, tu: int, lam, use_rdoq: bool,
                  is_luma: bool = True, qp_set=None):
    """[N, s, s] residual blocks -> (levels, recon_residual, bits) with
    TUs of size `tu` tiled in place. bits [N] = syntax-aware CABAC rate
    estimate summed over the node's TUs (ops/bits.py). qp may be traced
    (with static qp_set) — one compiled program serves every frame QP."""
    N, s, _ = blocks.shape
    g = s // tu
    t = blocks.reshape(N, g, tu, g, tu).transpose(0, 1, 3, 2, 4)
    t = t.reshape(N * g * g, tu, tu)
    if jnp.ndim(qp) == 1:        # per-node QP -> per-TU expansion
        qp = jnp.repeat(qp, g * g)
        lam = jnp.repeat(lam, g * g)
    cf = transforms.forward_transform(t)
    if use_rdoq:
        lvl = rdoq_lib.rd_quantize(cf, qp, lam, is_intra=False,
                                   is_luma=is_luma)
    else:
        lvl = quant.quantize(cf, qp, is_intra=False)
    rr = transforms.inverse_transform(quant.dequantize(lvl, qp))
    if search_lib.BIT_MODEL == "exact":
        from ..ops import bits_exact
        bits = bits_exact.tu_bits_exact(
            lvl, qp=int(qp) if quant.is_static_qp(qp) else qp,
            is_luma=is_luma, init_type=1, qp_set=qp_set)
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


def _neighbor_motion(mv_map, ref_map, B, n, nx, shift):
    """Same-depth neighbour motion over the whole frame's node grid.

    mv_map [B, n, n, 2], ref_map [B, n, n] with B = nx*ny CTUs in raster
    order; shift = (0, 1) for the left neighbour, (1, 0) for above.
    Frame-edge nodes fall back to the zero-MV/ref-0 candidate (the
    normative zero-fill merge candidate, 8.5.3.2.3). Returns
    (mv [B*n*n, 2], ref [B*n*n]) in node-block order.
    """
    ny = B // nx
    # [B, n, n, ...] -> frame grid [ny*n, nx*n, ...]
    def to_frame(a):
        extra = a.shape[3:]
        g = a.reshape((ny, nx, n, n) + extra)
        g = jnp.moveaxis(g, 2, 1)          # [ny, n, nx, n, ...]
        return g.reshape((ny * n, nx * n) + extra)

    def to_blocks(g):
        extra = g.shape[2:]
        a = g.reshape((ny, n, nx, n) + extra)
        a = jnp.moveaxis(a, 1, 2)
        return a.reshape((B * n * n,) + extra)

    dy, dx = shift
    mv_g = to_frame(mv_map)
    ref_g = to_frame(ref_map)
    mv_s = jnp.roll(mv_g, (dy, dx), axis=(0, 1))
    ref_s = jnp.roll(ref_g, (dy, dx), axis=(0, 1))
    H, W = mv_g.shape[:2]
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    valid = (yy >= dy) & (xx >= dx)
    mv_s = jnp.where(valid[..., None], mv_s, 0)
    ref_s = jnp.where(valid, ref_s, 0)
    return to_blocks(mv_s), to_blocks(ref_s)


def p_search_frame(cur_y, cur_cb, cur_cr, ref_y, ref_cb, ref_cr,
                   ctu_origins, *, qp, pad_w: int, pad_h: int,
                   hcpm_probs: Optional[jax.Array] = None,
                   thr_up=(1.1, 1.1, 1.1), thr_down=(-0.1, -0.1, -0.1),
                   radius: int = 8, use_rdoq: bool = True,
                   n_active_refs: int = 1, max_depth: int = 3,
                   merge_rd: bool = True, intra_in_p: bool = True,
                   rect_pu: bool = True, qp_set=None):
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
    per_ctu = False
    if quant.is_static_qp(qp):
        lam = float(0.57 * 2.0 ** ((qp - 12) / 3.0))
        sqrt_lam = float(np.sqrt(lam))
    else:
        # traced frame QP: one compiled program serves every QP in
        # qp_set (GOP-4 offsets, LCU rate control) — reference keys a
        # full recompile per QP instead (HM re-inits per slice).
        lam = 0.57 * jnp.exp2((jnp.asarray(qp, jnp.float32) - 12.0)
                              / 3.0)
        sqrt_lam = jnp.sqrt(lam)
        assert qp_set is not None, "traced qp requires static qp_set"
        per_ctu = jnp.ndim(qp) == 1   # [B] per-CTU QP (LCU rate control)
        # chroma TUs estimate bits at the chroma QP -> the stacked
        # tables must cover the chroma-mapped values too
        qp_set = tuple(sorted({int(q) for q in qp_set}
                              | {quant.chroma_qp(int(q))
                                 for q in qp_set}))
        if per_ctu:
            assert qp.shape[0] == B, (qp.shape, B)
    cqp = quant.chroma_qp(qp)
    tu_transform = functools.partial(_tu_transform, qp_set=qp_set)
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
    nx_ctu = -(-pad_w // 64)
    mv_maps = {}
    ref_maps = {}
    intra_maps = {}
    imode_maps = {}
    part_maps = {}       # 0 = 2Nx2N, 1 = 2NxN, 2 = Nx2N
    mv2_maps = {}        # second PU's motion (valid where part != 0)
    ref2_maps = {}
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
            intra_maps[d] = jnp.zeros((B, n, n), bool)
            imode_maps[d] = jnp.ones((B, n, n), jnp.int32)
            part_maps[d] = jnp.zeros((B, n, n), jnp.int32)
            mv2_maps[d] = jnp.zeros((B, n, n, 2), jnp.int32)
            ref2_maps[d] = jnp.zeros((B, n, n), jnp.int32)
            cost_maps[d] = jnp.full((B, nd), jnp.float32(3.4e38))
            sl = 64 // n
            cl = 32 // n
            z = jnp.zeros((B * nd, sl, sl), jnp.int32)
            zc = jnp.zeros((B * nd, cl, cl), jnp.int32)
            lvl_y_d[d] = rr_y_d[d] = pred_y_d[d] = z
            lvl_cb_d[d] = rr_cb_d[d] = pred_cb_d[d] = zc
            lvl_cr_d[d] = rr_cr_d[d] = pred_cr_d[d] = zc
            continue
        # per-CTU QP (LCU rate control): expand the CTU-indexed qp /
        # lambda vectors to this depth's node batch ([B] -> [B*nd])
        if per_ctu:
            qp_d = jnp.repeat(qp, nd)
            cqp_d = jnp.repeat(cqp, nd)
            lam_d = jnp.repeat(lam, nd)
            sl_me = jnp.repeat(sqrt_lam, nd)[None]     # [1, B*nd]
        else:
            qp_d, cqp_d, lam_d, sl_me = qp, cqp, lam, sqrt_lam

        sads = sad_by_depth[d].reshape(R, n_side * n_side, B * nd)
        best = jnp.argmin(sads, axis=1)                # [R, B*nd]
        sad_best = jnp.min(sads, axis=1).astype(jnp.float32)
        mv_int_r = jnp.stack([best % n_side - radius,
                              best // n_side - radius],
                             -1).astype(jnp.int32)     # [R, B*nd, 2]
        # ref choice: SAD + sqrt(lambda) * (ref_idx bins + rough MV rate)
        mv_rate = (2.0 * jnp.log2(jnp.abs(mv_int_r).sum(-1) + 1.0) + 1.0)
        ref_cost = sad_best + sl_me * (ref_bits_tab[:, None] + mv_rate)
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
        lvl, rr, bits_y = tu_transform(resi, qp_d, tu, lam_d, use_rdoq)
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
        lvl_cb, rr_cb, bits_cb = tu_transform(resi_cb, cqp_d, ctu_c, lam_d,
                                               use_rdoq, is_luma=False)
        lvl_cr, rr_cr, bits_cr = tu_transform(resi_cr, cqp_d, ctu_c, lam_d,
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
        amvp_cost = sse + lam_d * bits

        if merge_rd:
            # --- RD-searched merge/skip (xCheckRDCostMerge2Nx2N,
            # TEncCu.cpp:1274 behavioral counterpart): the left/above
            # same-depth neighbours' (mv, ref) act as merge candidates,
            # evaluated both as full modes (candidate motion + coded
            # residual) and as zero-residual SKIP. The cheapest of
            # {AMVP, merge, skip} wins the node; the winning motion is
            # written to the motion maps, so the entropy stage's exact
            # normative candidate derivation then prices it as
            # skip/merge whenever the final neighbours agree.
            cands = []
            for shift in ((0, 1), (1, 0)):  # left, above
                mv_c, ref_c = _neighbor_motion(mv_maps[d], ref_maps[d],
                                               B, n, nx_ctu, shift)
                p_c = inter.predict_inter_blocks(ref_y, node_org, mv_c, s,
                                                 is_luma=True,
                                                 ref_idx=ref_c)
                pcb_c = inter.predict_inter_blocks(ref_cb, corg, mv_c,
                                                   s // 2, is_luma=False,
                                                   ref_idx=ref_c)
                pcr_c = inter.predict_inter_blocks(ref_cr, corg, mv_c,
                                                   s // 2, is_luma=False,
                                                   ref_idx=ref_c)
                dl = (cur_blocks - p_c).astype(jnp.float32)
                db = (_node_blocks(cur_cb_t, d) - pcb_c
                      ).astype(jnp.float32)
                dr = (_node_blocks(cur_cr_t, d) - pcr_c
                      ).astype(jnp.float32)
                sse_c = ((dl * dl).sum((-2, -1)) + (db * db).sum((-2, -1))
                         + (dr * dr).sum((-2, -1)))
                cands.append((mv_c, ref_c, p_c, pcb_c, pcr_c, sse_c))

            # better candidate by prediction SSE
            pick_a = cands[1][5] < cands[0][5]  # above beats left
            def sel(i):
                a, b = cands[0][i], cands[1][i]
                cond = pick_a.reshape((-1,) + (1,) * (a.ndim - 1))
                return jnp.where(cond, b, a)
            mv_m, ref_m = sel(0), sel(1)
            pm_y, pm_cb, pm_cr = sel(2), sel(3), sel(4)
            sse_skip = jnp.where(pick_a, cands[1][5], cands[0][5])

            # SKIP: zero residual; rate ~ skip_flag + merge_idx bins
            skip_cost = sse_skip + lam_d * 3.0

            # merge with residual: full coding at the candidate motion
            lvl_m, rr_m, mbits_y = tu_transform(
                cur_blocks.astype(jnp.int32) - pm_y, qp_d, tu, lam_d, use_rdoq)
            lvl_mcb, rr_mcb, mbits_cb = tu_transform(
                _node_blocks(cur_cb_t, d).astype(jnp.int32) - pm_cb, cqp_d,
                ctu_c, lam_d, use_rdoq, is_luma=False)
            lvl_mcr, rr_mcr, mbits_cr = tu_transform(
                _node_blocks(cur_cr_t, d).astype(jnp.int32) - pm_cr, cqp_d,
                ctu_c, lam_d, use_rdoq, is_luma=False)
            rec_m = jnp.clip(pm_y + rr_m, 0, 255)
            dm = (rec_m - cur_blocks).astype(jnp.float32)
            sse_m = (dm * dm).sum((-2, -1))
            rec_mcb = jnp.clip(pm_cb + rr_mcb, 0, 255)
            rec_mcr = jnp.clip(pm_cr + rr_mcr, 0, 255)
            dmb = (rec_mcb - _node_blocks(cur_cb_t, d)).astype(jnp.float32)
            dmr = (rec_mcr - _node_blocks(cur_cr_t, d)).astype(jnp.float32)
            sse_m = sse_m + (dmb * dmb).sum((-2, -1)) \
                + (dmr * dmr).sum((-2, -1))
            merge_cost = sse_m + lam_d * (mbits_y + mbits_cb + mbits_cr
                                          + 5.0)

            # cheapest of {AMVP, merge+resid, skip}
            all_costs = jnp.stack([amvp_cost, merge_cost, skip_cost], 0)
            choice = jnp.argmin(all_costs, axis=0)        # [B*nd]
            amvp_cost = jnp.min(all_costs, axis=0)
            use_cand = choice > 0
            is_skip = choice == 2

            def pick(orig, merged, skipped, ndim):
                c1 = use_cand.reshape((-1,) + (1,) * (ndim - 1))
                c2 = is_skip.reshape((-1,) + (1,) * (ndim - 1))
                return jnp.where(c2, skipped, jnp.where(c1, merged, orig))

            mv_q = pick(mv_q, mv_m, mv_m, 2)
            ref_sel = pick(ref_sel, ref_m, ref_m, 1)
            mv_maps[d] = mv_q.reshape(B, n, n, 2)
            ref_maps[d] = ref_sel.reshape(B, n, n)
            z = jnp.zeros_like(lvl)
            lvl_y_d[d] = pick(lvl, lvl_m, z, 3)
            rr_y_d[d] = pick(rr, rr_m, z, 3)
            pred_y_d[d] = pick(pred, pm_y, pm_y, 3)
            zc = jnp.zeros_like(lvl_cb)
            lvl_cb_d[d] = pick(lvl_cb, lvl_mcb, zc, 3)
            rr_cb_d[d] = pick(rr_cb, rr_mcb, zc, 3)
            pred_cb_d[d] = pick(pred_cb, pm_cb, pm_cb, 3)
            lvl_cr_d[d] = pick(lvl_cr, lvl_mcr, zc, 3)
            rr_cr_d[d] = pick(rr_cr, rr_mcr, zc, 3)
            pred_cr_d[d] = pick(pred_cr, pm_cr, pm_cr, 3)

        part_maps[d] = jnp.zeros((B, n, n), jnp.int32)
        mv2_maps[d] = mv_maps[d]
        ref2_maps[d] = ref_maps[d]
        if rect_pu and d <= 2 and d <= max_depth:
            # --- rectangular PUs (2NxN / Nx2N): HM predInterSearch
            # evaluates every partition per CU (TEncSearch.cpp:2912,
            # TEncCu.cpp:1399 xCheckRDCostInter SIZE_2NxN/SIZE_Nx2N).
            # TPU formulation: the shared SAD field is additive, so each
            # half's exact integer SAD pools from the depth+1 grid; the
            # halves then get their own ref choice, quarter-pel
            # refinement, and rectangular MC, and the CU codes the
            # assembled two-PU prediction with the inferred TU split
            # (max_transform_hierarchy_depth_inter == 0 => interSplitFlag,
            # 7.4.9.8: TU = s/2 for 16/32 CUs).
            sub = sad_by_depth[d + 1].reshape(
                R, n_side * n_side, B, n, 2, n, 2)
            halves_by_part = {
                1: (sub[:, :, :, :, 0].sum(-1),        # top (sum x-sub)
                    sub[:, :, :, :, 1].sum(-1)),       # bottom
                2: (sub[:, :, :, :, :, :, 0].sum(4),   # left (sum y-sub)
                    sub[:, :, :, :, :, :, 1].sum(4)),  # right
            }
            tu_r = 32 if s == 64 else s // 2
            ctu_r = tu_r // 2
            rect = {}
            for part, halves in halves_by_part.items():
                hh = s // 2 if part == 1 else s
                ww = s if part == 1 else s // 2
                offs = [(0, 0), (0, s // 2) if part == 1 else (s // 2, 0)]
                pu = []
                for k in (0, 1):
                    sads_h = halves[k].reshape(R, n_side * n_side, B * nd)
                    best_h = jnp.argmin(sads_h, axis=1)
                    sad_b = jnp.min(sads_h, axis=1).astype(jnp.float32)
                    mv_i_r = jnp.stack([best_h % n_side - radius,
                                        best_h // n_side - radius],
                                       -1).astype(jnp.int32)
                    mv_rate_h = (2.0 * jnp.log2(
                        jnp.abs(mv_i_r).sum(-1) + 1.0) + 1.0)
                    rc = sad_b + sl_me * (ref_bits_tab[:, None]
                                             + mv_rate_h)
                    rc = jnp.where((ref_ids < n_act)[:, None], rc,
                                   jnp.float32(3.4e38))
                    rsel = jnp.argmin(rc, axis=0).astype(jnp.int32)
                    mv_i = jnp.take_along_axis(
                        mv_i_r, rsel[None, :, None], axis=0)[0]
                    dx, dy = offs[k]
                    org_h = node_org + jnp.asarray([dx, dy], jnp.int32)
                    cur_h = cur_blocks[:, dy:dy + hh, dx:dx + ww]
                    mv_qh, _ = inter.quarter_refine_blocks(
                        cur_h, ref_y, org_h, mv_i, hh, ref_idx=rsel,
                        size_w=ww)
                    p_h = inter.predict_inter_blocks(
                        ref_y, org_h, mv_qh, hh, is_luma=True,
                        ref_idx=rsel, size_w=ww)
                    corg_h = corg + jnp.asarray([dx // 2, dy // 2],
                                                jnp.int32)
                    pcb_h = inter.predict_inter_blocks(
                        ref_cb, corg_h, mv_qh, hh // 2, is_luma=False,
                        ref_idx=rsel, size_w=ww // 2)
                    pcr_h = inter.predict_inter_blocks(
                        ref_cr, corg_h, mv_qh, hh // 2, is_luma=False,
                        ref_idx=rsel, size_w=ww // 2)
                    pu.append((mv_qh, rsel, p_h, pcb_h, pcr_h, mv_i))
                axis = 1 if part == 1 else 2
                pr_y = jnp.concatenate([pu[0][2], pu[1][2]], axis)
                pr_cb = jnp.concatenate([pu[0][3], pu[1][3]], axis)
                pr_cr = jnp.concatenate([pu[0][4], pu[1][4]], axis)
                lvl_r, rr_r, rb_y = tu_transform(
                    cur_blocks.astype(jnp.int32) - pr_y, qp_d, tu_r, lam_d,
                    use_rdoq)
                lvl_rcb, rr_rcb, rb_cb = tu_transform(
                    _node_blocks(cur_cb_t, d).astype(jnp.int32) - pr_cb,
                    cqp_d, ctu_r, lam_d, use_rdoq, is_luma=False)
                lvl_rcr, rr_rcr, rb_cr = tu_transform(
                    _node_blocks(cur_cr_t, d).astype(jnp.int32) - pr_cr,
                    cqp_d, ctu_r, lam_d, use_rdoq, is_luma=False)
                rec_r = jnp.clip(pr_y + rr_r, 0, 255)
                dr_ = (rec_r - cur_blocks).astype(jnp.float32)
                sse_r = (dr_ * dr_).sum((-2, -1))
                rcbq = jnp.clip(pr_cb + rr_rcb, 0, 255)
                rcrq = jnp.clip(pr_cr + rr_rcr, 0, 255)
                dcb_ = (rcbq - _node_blocks(cur_cb_t, d)
                        ).astype(jnp.float32)
                dcr_ = (rcrq - _node_blocks(cur_cr_t, d)
                        ).astype(jnp.float32)
                sse_r = sse_r + (dcb_ * dcb_).sum((-2, -1)) \
                    + (dcr_ * dcr_).sum((-2, -1))
                # rate: coefs + both PUs' MVD/ref + part bins (2) + flags
                mvb = (_mvd_bits(pu[0][0], pred_mv)
                       + _mvd_bits(pu[1][0], pred_mv))
                rbits = (rb_y + rb_cb + rb_cr + mvb + 10.0
                         + ref_bits_tab[pu[0][1]]
                         + ref_bits_tab[pu[1][1]])
                rect[part] = (sse_r + lam_d * rbits, pu, pr_y, pr_cb,
                              pr_cr, lvl_r, rr_r, lvl_rcb, rr_rcb,
                              lvl_rcr, rr_rcr)

            pick_2 = rect[2][0] < rect[1][0]
            best_part = jnp.where(pick_2, 2, 1).astype(jnp.int32)

            def rsel_(i, ndim):
                a, b = rect[1][i], rect[2][i]
                c = pick_2.reshape((-1,) + (1,) * (ndim - 1))
                return jnp.where(c, b, a)

            rcost = jnp.minimum(rect[1][0], rect[2][0])
            use_rect = rcost < amvp_cost
            amvp_cost = jnp.minimum(rcost, amvp_cost)

            def pickr(orig, rect_v, ndim):
                c = use_rect.reshape((-1,) + (1,) * (ndim - 1))
                return jnp.where(c, rect_v, orig)

            # PU motion per partition
            mv0 = jnp.where(pick_2[:, None], rect[2][1][0][0],
                            rect[1][1][0][0])
            rf0 = jnp.where(pick_2, rect[2][1][0][1], rect[1][1][0][1])
            mv1 = jnp.where(pick_2[:, None], rect[2][1][1][0],
                            rect[1][1][1][0])
            rf1 = jnp.where(pick_2, rect[2][1][1][1], rect[1][1][1][1])

            mv_q = pickr(mv_q, mv0, 2)
            ref_sel = pickr(ref_sel, rf0, 1)
            mv_maps[d] = mv_q.reshape(B, n, n, 2)
            ref_maps[d] = ref_sel.reshape(B, n, n)
            part_maps[d] = pickr(jnp.zeros((B * nd,), jnp.int32),
                                 best_part, 1).reshape(B, n, n)
            mv2_maps[d] = pickr(mv_q, mv1, 2).reshape(B, n, n, 2)
            ref2_maps[d] = pickr(ref_sel, rf1, 1).reshape(B, n, n)
            lvl_y_d[d] = pickr(lvl_y_d[d], rsel_(5, 3), 3)
            rr_y_d[d] = pickr(rr_y_d[d], rsel_(6, 3), 3)
            pred_y_d[d] = pickr(pred_y_d[d], rsel_(2, 3), 3)
            lvl_cb_d[d] = pickr(lvl_cb_d[d], rsel_(7, 3), 3)
            rr_cb_d[d] = pickr(rr_cb_d[d], rsel_(8, 3), 3)
            pred_cb_d[d] = pickr(pred_cb_d[d], rsel_(3, 3), 3)
            lvl_cr_d[d] = pickr(lvl_cr_d[d], rsel_(9, 3), 3)
            rr_cr_d[d] = pickr(rr_cr_d[d], rsel_(10, 3), 3)
            pred_cr_d[d] = pickr(pred_cr_d[d], rsel_(4, 3), 3)

        if intra_in_p:
            # --- intra escape inside P frames (TEncCu.cpp:1438 /
            # HM-16.5_Test_LDP TEncCu.cpp:746-803): the AI search's
            # SATD-best mode + refined RD cost (original-pixel refs, the
            # same approximation as the AI path) competes per node with
            # the inter modes. Winning nodes are re-coded normatively
            # (recon-neighbour prediction) by the host patch pass
            # (pframe.patch_intra_cus); their motion is zeroed so the
            # motion maps stay well-defined.
            m_i, _ = search_lib._best_mode_per_node(
                cur_y, ctu_origins, d, pad_w, pad_h, nx_ctu)
            icost = search_lib._refined_costs(
                cur_y, ctu_origins, d, m_i, qp, lam, pad_w=pad_w,
                pad_h=pad_h, n_ctu_x=nx_ctu, qp_set=qp_set)
            dist_w = jnp.exp2((jnp.asarray(qp, jnp.float32)
                               - jnp.asarray(cqp, jnp.float32)) / 3.0)
            for cp in (cur_cb, cur_cr):
                icost = icost + search_lib._refined_chroma_costs(
                    jnp.asarray(cp), ctu_origins, d, m_i, cqp, lam,
                    dist_w, pad_w=pad_w, pad_h=pad_h, n_ctu_x=nx_ctu,
                    bits_qp=qp, qp_set=qp_set)
            # intra-in-P overhead: pred_mode + part + intra dir + cbfs
            icost = icost.reshape(-1) + lam_d * 11.5
            is_intra = icost < amvp_cost
            amvp_cost = jnp.minimum(icost, amvp_cost)
            intra_maps[d] = is_intra.reshape(B, n, n)
            imode_maps[d] = m_i.reshape(B, n, n)
            zero_i = is_intra.reshape(-1, 1, 1)
            mv_maps[d] = jnp.where(zero_i[..., None].reshape(B, n, n, 1),
                                   0, mv_maps[d])
            ref_maps[d] = jnp.where(is_intra.reshape(B, n, n), 0,
                                    ref_maps[d])
            part_maps[d] = jnp.where(is_intra.reshape(B, n, n), 0,
                                     part_maps[d])
        else:
            intra_maps[d] = jnp.zeros((B, n, n), bool)
            imode_maps[d] = jnp.ones((B, n, n), jnp.int32)

        cost_maps[d] = amvp_cost.reshape(B, nd)

    sb = (lam * 2.0)[:, None, None] if per_ctu else lam * 2.0
    split0, split1, split2, depth8 = search_lib.decide_tree(
        cost_maps, ctu_origins, pad_w=pad_w, pad_h=pad_h,
        split_bits=sb, hcpm_probs=hcpm_probs, thr_up=thr_up,
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

    def unit_mv_maps(d):
        """Full-res per-8x8 (mv, ref) at depth d, PU-aware: units in the
        second PU of a 2NxN (bottom) / Nx2N (right) CU take mv2."""
        u = 8 >> d
        mv_f = jnp.repeat(jnp.repeat(mv_maps[d], u, 1), u, 2)
        rf_f = jnp.repeat(jnp.repeat(ref_maps[d], u, 1), u, 2)
        if u > 1:
            mv2_f = jnp.repeat(jnp.repeat(mv2_maps[d], u, 1), u, 2)
            rf2_f = jnp.repeat(jnp.repeat(ref2_maps[d], u, 1), u, 2)
            pt_f = jnp.repeat(jnp.repeat(part_maps[d], u, 1), u, 2)
            uy = jnp.arange(8)[None, :, None] % u
            ux = jnp.arange(8)[None, None, :] % u
            in_pu1 = ((pt_f == 1) & (uy >= u // 2)) \
                | ((pt_f == 2) & (ux >= u // 2))
            mv_f = jnp.where(in_pu1[..., None], mv2_f, mv_f)
            rf_f = jnp.where(in_pu1, rf2_f, rf_f)
        return mv_f, rf_f

    per_d = [unit_mv_maps(d) for d in range(4)]
    mv_stack = jnp.stack([m for (m, _) in per_d], -2)   # [B, 8, 8, 4, 2]
    mv8 = jnp.take_along_axis(
        mv_stack, depth8[..., None, None].astype(jnp.int32),
        axis=-2)[..., 0, :]
    ref_stack = jnp.stack([r for (_, r) in per_d], -1)  # [B, 8, 8, 4]
    ref8 = jnp.take_along_axis(
        ref_stack, depth8[..., None].astype(jnp.int32), axis=-1)[..., 0]
    part_stack = jnp.stack([
        jnp.repeat(jnp.repeat(part_maps[d], 8 >> d, 1), 8 >> d, 2)
        for d in range(4)], -1)
    part8 = jnp.take_along_axis(
        part_stack, depth8[..., None].astype(jnp.int32), axis=-1)[..., 0]
    intra_stack = jnp.stack([
        jnp.repeat(jnp.repeat(intra_maps[d], 8 >> d, 1), 8 >> d, 2)
        for d in range(4)], -1)
    intra8 = jnp.take_along_axis(
        intra_stack, depth8[..., None].astype(jnp.int32), axis=-1)[..., 0]
    imode_stack = jnp.stack([
        jnp.repeat(jnp.repeat(imode_maps[d], 8 >> d, 1), 8 >> d, 2)
        for d in range(4)], -1)
    imode8 = jnp.take_along_axis(
        imode_stack, depth8[..., None].astype(jnp.int32), axis=-1)[..., 0]

    return PSearchResult(depth8=depth8, mv8=mv8, ref8=ref8,
                         coef_y=coef_y.astype(jnp.int16),
                         coef_cb=coef_cb.astype(jnp.int16),
                         coef_cr=coef_cr.astype(jnp.int16),
                         rec_y=rec_y, rec_cb=rec_cb, rec_cr=rec_cr,
                         intra8=intra8, imode8=imode8, part8=part8)
