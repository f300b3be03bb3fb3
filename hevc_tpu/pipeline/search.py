"""Batched All-Intra mode/partition search on TPU.

Phase A of the AI pipeline: for every CTU of a frame *in parallel*,
evaluate all 35 intra modes at every CU node of the quadtree (1 + 4 + 16
+ 64 nodes) against original-pixel references, reduce to per-node best
modes by SATD, then decide the CU tree bottom-up — with ETH-CNN HCPM
probabilities gating the split decisions exactly like the reference's
three-way rule (TEncCu.cpp:419-463, re-expressed as masks).

Everything is jit-compiled with static shapes; there is no sequential
dependency because search predictions use original pixels (the normative
reconstruction path recomputes prediction from reconstructed samples).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import hcpm as hcpm_lib
from ..ops import cost, intra, intra_mm, refs


class SearchResult(NamedTuple):
    depth8: jax.Array    # [B, 8, 8] int32 depth of each 8x8 unit
    modes8: jax.Array    # [B, 8, 8] int32 luma mode of each 8x8 unit
    split0: jax.Array    # [B] bool
    split1: jax.Array    # [B, 2, 2] bool
    split2: jax.Array    # [B, 4, 4] bool
    modes4: jax.Array    # [B, 16, 16] int32 luma mode per 4x4 unit
    nxn8: jax.Array      # [B, 8, 8] bool: NxN part mode (depth-3 CUs)


@functools.lru_cache(maxsize=None)
def _node_offsets(depth: int):
    """Raster-ordered (x, y) offsets of the 4^depth nodes at a depth."""
    n = 1 << depth
    size = 64 >> depth
    ys, xs = np.mgrid[0:n, 0:n]
    return (xs.reshape(-1) * size).astype(np.int32), \
        (ys.reshape(-1) * size).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _filter_mask(n: int) -> np.ndarray:
    return np.array([intra.ref_filter_flag(m, n) for m in range(35)],
                    bool)


def _best_mode_per_node(y_plane, ctu_origins, depth, pad_w, pad_h, n_ctu_x):
    """For all CTUs x all nodes at `depth`: best mode + SATD.

    Returns (best_mode [B, nd], best_satd [B, nd]) with nd = 4^depth.
    """
    B = ctu_origins.shape[0]
    size = 64 >> depth
    offx, offy = _node_offsets(depth)
    nd = offx.shape[0]
    origins = (ctu_origins[:, None, :]
               + jnp.stack([jnp.asarray(offx), jnp.asarray(offy)], -1)[None]
               ).reshape(B * nd, 2)

    r = refs.prepare_refs(y_plane, origins, size, pad_w, pad_h, n_ctu_x)
    rf = intra.filter_refs(r)

    # original blocks
    h, w = y_plane.shape
    ys = jnp.clip(origins[:, 1:2, None] + jnp.arange(size)[None, :, None],
                  0, h - 1)
    xs = jnp.clip(origins[:, 0:1, None] + jnp.arange(size)[None, None, :],
                  0, w - 1)
    orig = jnp.take(y_plane.reshape(-1), ys * w + xs, axis=0
                    ).astype(jnp.int32)

    if size <= 16 and os.environ.get("HEVC_TPU_INTRA_MM", "1") != "0":
        # MXU weight-matrix formulation (+ Pallas fusion on TPU),
        # bit-exact vs the gather path: tests/test_intra_mm.py
        satds = intra_mm.satd_all_modes(r, rf, orig, size)
    elif size >= 32 and os.environ.get("HEVC_TPU_MODE_GROUP", "0") == "1":
        # mode-grouped evaluation: materializing all 35 predictions at
        # 32/64 costs [B*nd, 35, n, n] (several GB per frame at 1080p);
        # groups of 7 bound the peak at 1/5 with identical results
        # (verified) — but OFF by default: combined with the chroma+NxN
        # search in one program it triggers a reproducible TPU runtime
        # fault (XLA miscompile; each half works alone). Opt in with
        # HEVC_TPU_MODE_GROUP=1 for memory-bound large frame batches.
        block = 8
        parts = []
        for g0 in range(0, 35, 7):
            gm = list(range(g0, min(g0 + 7, 35)))
            k = len(gm)
            m_ids = jnp.broadcast_to(
                jnp.asarray(gm, jnp.int32)[None],
                (r.shape[0], k)).reshape(-1)
            r_rep = jnp.repeat(r, k, axis=0)
            rf_rep = jnp.repeat(rf, k, axis=0)
            r_use = intra.select_filtered_batch(r_rep, rf_rep, m_ids,
                                                size)
            preds = intra.predict_selected_modes(r_use, m_ids, size)
            preds = preds.reshape(r.shape[0], k, size, size)
            parts.append(cost.satd(orig[:, None], preds, block=block))
        satds = jnp.concatenate(parts, axis=1)            # [B*nd, 35]
    else:
        preds_u = intra.predict_all_modes(r, size, component="luma")
        preds_f = intra.predict_all_modes(rf, size, component="luma")
        fmask = jnp.asarray(_filter_mask(size))
        preds = jnp.where(fmask[None, :, None, None], preds_f, preds_u)
        block = 4 if size == 4 else 8
        satds = cost.satd(orig[:, None], preds, block=block)  # [B*nd, 35]
    best_mode = jnp.argmin(satds, axis=1).astype(jnp.int32)
    best_satd = jnp.min(satds, axis=1)
    return (best_mode.reshape(B, nd), best_satd.reshape(B, nd))


#: coefficient-rate model for the RD leaf costs: "weights" = calibrated
#: per-event-class costs (ops/bits), "exact" = per-bin fractional-bit
#: costs at slice-init context states (ops/bits_exact, the HM
#: estBitsSbac analogue). Measured QP22-37 A/B on the synthetic eval:
#: weights -14.9% BD-rate vs HM, exact -13.1% — the frozen *init*
#: states overprice bins relative to adapted reality, so the
#: empirically calibrated costs make better RD decisions until the
#: exact tables are re-derived from adapted states (ROADMAP).
BIT_MODEL = os.environ.get("HEVC_TPU_BIT_MODEL", "weights")


def _bits_estimate(levels, qp, is_luma=True, qp_set=None):
    """Coefficient-rate estimate. levels: [..., n, n] -> [...] float32.
    qp = slice QP (context-table selector; static, or traced with the
    static qp_set tuple of possible values)."""
    if BIT_MODEL == "exact":
        from ..ops import bits_exact
        from ..ops.quant import is_static_qp
        return bits_exact.tu_bits_exact(
            levels, qp=int(qp) if is_static_qp(qp) else qp,
            is_luma=is_luma, qp_set=qp_set)
    from ..ops import bits as bits_lib
    return bits_lib.tu_bits(levels, is_luma=is_luma)


def _refined_costs(y_plane, ctu_origins, depth, modes, qp, lam, *,
                   pad_w, pad_h, n_ctu_x, use_dst=False, qp_set=None):
    """RD cost of each node coded as a leaf with its chosen mode:
    SSE(reconstruction) + lambda * estimated bits (HM J = D + lambda*R,
    TComRdCost::calcRdCost behavioral equivalent on original-pixel refs).
    depth 4 = the 4x4 sub-PUs of NxN 8x8 CUs (use_dst=True: intra luma
    4x4 codes DST-VII). Returns [B, nd] float32."""
    from ..ops import quant as quant_lib, transforms

    B = ctu_origins.shape[0]
    size = 64 >> depth
    tu = 32 if size == 64 else size
    offx, offy = _node_offsets(depth)
    nd = offx.shape[0]
    h, w = y_plane.shape

    # TU origins: 4 TUs per 64-node, else 1
    if size == 64:
        tu_off = np.array([[0, 0], [32, 0], [0, 32], [32, 32]], np.int32)
    else:
        tu_off = np.array([[0, 0]], np.int32)
    n_tu = tu_off.shape[0]
    base = (ctu_origins[:, None, :]
            + jnp.stack([jnp.asarray(offx), jnp.asarray(offy)], -1)[None])
    origins = (base[:, :, None, :] + jnp.asarray(tu_off)[None, None]
               ).reshape(B * nd * n_tu, 2)
    modes_t = jnp.broadcast_to(modes.reshape(B, nd, 1),
                               (B, nd, n_tu)).reshape(-1)

    r = refs.prepare_refs(y_plane, origins, tu, pad_w, pad_h, n_ctu_x)
    rf = intra.filter_refs(r)
    r_use = intra.select_filtered_batch(r, rf, modes_t, tu)
    pred = intra.predict_selected_modes(r_use, modes_t, tu)

    ys = jnp.clip(origins[:, 1:2, None] + jnp.arange(tu)[None, :, None],
                  0, h - 1)
    xs = jnp.clip(origins[:, 0:1, None] + jnp.arange(tu)[None, None, :],
                  0, w - 1)
    orig = jnp.take(y_plane.reshape(-1), ys * w + xs, axis=0
                    ).astype(jnp.int32)

    resi = orig - pred
    if jnp.ndim(qp) == 1:        # per-CTU QP -> per-TU-block expansion
        qp = jnp.repeat(qp, nd * n_tu)
        lam = jnp.repeat(lam, nd * n_tu)
    lvl = quant_lib.quantize(
        transforms.forward_transform(resi, use_dst=use_dst), qp)
    rresi = transforms.inverse_transform(quant_lib.dequantize(lvl, qp),
                                         use_dst=use_dst)
    rec = jnp.clip(pred + rresi, 0, 255)
    d = (rec - orig).astype(jnp.float32)
    sse = (d * d).sum((-2, -1))
    bits = _bits_estimate(lvl, qp, qp_set=qp_set)
    cost = sse + lam * bits
    return cost.reshape(B, nd, n_tu).sum(-1)


def _refined_chroma_costs(c_plane, ctu_origins, depth, modes, cqp, lam,
                          dist_w, *, pad_w, pad_h, n_ctu_x,
                          bits_qp=None, qp_set=None):
    """Chroma-component leaf RD contribution per node: weighted SSE +
    lambda * bits of the DM-mode (= luma mode) chroma TB(s). Mirrors the
    reconstruction tiling (pipeline/recon.code_ctu): one TB of size
    luma_size/2 per CU, except the 64 CU which codes four 16x16 chroma
    TBs. dist_w = HM chroma distortion weight 2^((qp-qp_c)/3)
    (TComRdCost::setCbDistortionWeight behavioral twin).
    Returns [B, nd] float32."""
    from ..ops import quant as quant_lib, transforms

    B = ctu_origins.shape[0]
    size = 64 >> depth
    tu = 16 if size == 64 else size >> 1
    offx, offy = _node_offsets(depth)
    nd = offx.shape[0]
    pad_wc, pad_hc = pad_w // 2, pad_h // 2
    h, w = c_plane.shape

    if size == 64:
        tu_off = np.array([[0, 0], [16, 0], [0, 16], [16, 16]], np.int32)
    else:
        tu_off = np.array([[0, 0]], np.int32)
    n_tu = tu_off.shape[0]
    base = (ctu_origins[:, None, :] // 2
            + jnp.stack([jnp.asarray(offx), jnp.asarray(offy)], -1)[None]
            // 2)
    origins = (base[:, :, None, :] + jnp.asarray(tu_off)[None, None]
               ).reshape(B * nd * n_tu, 2)
    modes_t = jnp.broadcast_to(modes.reshape(B, nd, 1),
                               (B, nd, n_tu)).reshape(-1)

    r = refs.prepare_refs(c_plane, origins, tu, pad_wc, pad_hc, n_ctu_x,
                          scale=2)
    pred = intra.predict_selected_modes(r, modes_t, tu, component="chroma")

    ys = jnp.clip(origins[:, 1:2, None] + jnp.arange(tu)[None, :, None],
                  0, h - 1)
    xs = jnp.clip(origins[:, 0:1, None] + jnp.arange(tu)[None, None, :],
                  0, w - 1)
    orig = jnp.take(c_plane.reshape(-1), ys * w + xs, axis=0
                    ).astype(jnp.int32)

    resi = orig - pred
    bqp = cqp if bits_qp is None else bits_qp
    if jnp.ndim(cqp) == 1:       # per-CTU QP -> per-TU-block expansion
        cqp = jnp.repeat(cqp, nd * n_tu)
        lam = jnp.repeat(lam, nd * n_tu)
        dist_w = jnp.repeat(dist_w, nd * n_tu)
        if jnp.ndim(bqp) == 1:
            bqp = jnp.repeat(bqp, nd * n_tu)
    lvl = quant_lib.quantize(transforms.forward_transform(resi), cqp)
    rresi = transforms.inverse_transform(quant_lib.dequantize(lvl, cqp))
    rec = jnp.clip(pred + rresi, 0, 255)
    d = (rec - orig).astype(jnp.float32)
    sse = (d * d).sum((-2, -1))
    bits = _bits_estimate(lvl, bqp, is_luma=False, qp_set=qp_set)
    cost = dist_w * sse + lam * bits
    return cost.reshape(B, nd, n_tu).sum(-1)


def forced_split_mask(ctu_origins, depth: int, pad_w: int, pad_h: int):
    """[B, n, n] bool: CUs crossing the padded-frame boundary must split
    (TEncCu.cpp:424-428 semantics)."""
    B = ctu_origins.shape[0]
    size = 64 >> depth
    offx, offy = _node_offsets(depth)
    gx = ctu_origins[:, 0:1] + jnp.asarray(offx)[None]
    gy = ctu_origins[:, 1:2] + jnp.asarray(offy)[None]
    n = 1 << depth
    inside = (gx + size <= pad_w) & (gy + size <= pad_h)
    started = (gx < pad_w) & (gy < pad_h)
    return (~inside & started).reshape(B, n, n)


def decide_tree(costs, ctu_origins, *, pad_w, pad_h, split_bits,
                hcpm_probs=None, thr_up=(1.1, 1.1, 1.1),
                thr_down=(-0.1, -0.1, -0.1)):
    """Bottom-up gated CU-tree reduction shared by the intra and inter
    searches (TEncCu.cpp:419-463 three-way rule as masks).

    costs: {depth: [B, 4^depth]} leaf RD costs.
    Returns (split0 [B], split1 [B,2,2], split2 [B,4,4], depth8 [B,8,8]).
    """
    B = ctu_origins.shape[0]
    cost3 = costs[3].reshape(B, 8, 8)
    cost2 = costs[2].reshape(B, 4, 4)
    cost1 = costs[1].reshape(B, 2, 2)
    cost0 = costs[0].reshape(B, 1, 1)

    if hcpm_probs is not None:
        thr = hcpm_lib.Thresholds(up=tuple(thr_up), down=tuple(thr_down))
        chk_cur, chk_split = hcpm_lib.split_gates(hcpm_probs, thr)
        cur0, split_ok0 = chk_cur[:, 0], chk_split[:, 0]
        cur1 = chk_cur[:, 1:5].reshape(B, 2, 2)
        split_ok1 = chk_split[:, 1:5].reshape(B, 2, 2)
        cur2 = chk_cur[:, 5:21].reshape(B, 4, 4)
        split_ok2 = chk_split[:, 5:21].reshape(B, 4, 4)
    else:
        tr = lambda *s: jnp.ones(s, bool)
        cur0, split_ok0 = tr(B), tr(B)
        cur1 = split_ok1 = tr(B, 2, 2)
        cur2 = split_ok2 = tr(B, 4, 4)

    def pool4(c):
        b, n, _ = c.shape
        return c.reshape(b, n // 2, 2, n // 2, 2).sum((2, 4))

    # level 2 (16 -> 8)
    sub3 = pool4(cost3) + split_bits
    f2 = forced_split_mask(ctu_origins, 2, pad_w, pad_h)
    choose2 = f2 | (split_ok2 & (~cur2 | (sub3 < cost2)))
    best2 = jnp.where(choose2, sub3, cost2)
    # level 1 (32 -> 16)
    sub2 = pool4(best2) + split_bits
    f1 = forced_split_mask(ctu_origins, 1, pad_w, pad_h)
    choose1 = f1 | (split_ok1 & (~cur1 | (sub2 < cost1)))
    best1 = jnp.where(choose1, sub2, cost1)
    # level 0 (64 -> 32)
    sub1 = pool4(best1) + split_bits
    f0 = forced_split_mask(ctu_origins, 0, pad_w, pad_h).reshape(B)
    choose0 = f0 | (split_ok0 & (~cur0 | (sub1[:, 0, 0] < cost0[:, 0, 0])))

    split0 = choose0
    split1 = choose1 & split0[:, None, None]
    split2 = choose2 & jnp.repeat(jnp.repeat(split1, 2, 1), 2, 2)

    depth4 = hcpm_lib.depth_map_from_decisions(split0, split1, split2)
    depth8 = jnp.repeat(jnp.repeat(depth4, 2, 1), 2, 2)  # [B, 8, 8]
    return split0, split1, split2, depth8


def forced_depth_floor(pad_w: int, pad_h: int) -> int:
    """Smallest depth whose CU size tiles the padded frame exactly —
    boundary CTUs are force-split down to this depth (TEncCu.cpp:424-428),
    so a frame-level max-depth early exit can never go shallower."""
    for d in range(4):
        if pad_w % (64 >> d) == 0 and pad_h % (64 >> d) == 0:
            return d
    return 3


def search_frame(y_plane, ctu_origins, *, pad_w, pad_h, n_ctu_x, qp,
                 hcpm_probs: Optional[jax.Array] = None,
                 thr_up=(1.1, 1.1, 1.1), thr_down=(-0.1, -0.1, -0.1),
                 rd_refine: bool = True, cb_plane=None, cr_plane=None,
                 nxn: bool = True, max_depth: int = 3):
    """Run the partition/mode search for all CTUs of one frame.

    y_plane: [pad_h, pad_w] luma (uint8/int32).
    ctu_origins: [B, 2] (x, y) top-left of each CTU.
    hcpm_probs: [B, 21] ETH-CNN outputs, or None (no gating: thresholds
      default to always-check-both, i.e. pure search — used for label
      extraction).
    cb_plane/cr_plane: optional [pad_h//2, pad_w//2] chroma; when given
      (and rd_refine) the tree decisions include the DM-mode chroma RD
      contribution (HM weighs all three components in xCheckBestMode).
    max_depth (static): do not evaluate CU depths beyond this — the
      TPU analogue of the reference's RD-check skipping (TEncCu.cpp:
      862-873 bCheckSub): the caller narrows whole frames to a shallower
      compiled program when the HCPM gates rule the deep levels out
      (AIEncoder.max_depth_exit). Clamped up to the forced-split floor.
    Returns SearchResult.
    """
    B = ctu_origins.shape[0]
    y_plane = jnp.asarray(y_plane)
    lam = jnp.float32(0.57 * 2.0 ** ((qp - 12) / 3.0))
    lam_sqrt = jnp.sqrt(lam)

    max_depth = min(3, max(max_depth, forced_depth_floor(pad_w, pad_h)))
    INF = jnp.float32(3.4e38)
    modes = {}
    satds = {}
    for d in range(4):
        if d > max_depth:
            # never selected (infinite cost below); shape placeholders
            modes[d] = jnp.zeros((B, 4 ** d), jnp.int32)
            satds[d] = jnp.full((B, 4 ** d), INF)
            continue
        m, s = _best_mode_per_node(y_plane, ctu_origins, d, pad_w, pad_h,
                                   n_ctu_x)
        modes[d] = m
        satds[d] = s.astype(jnp.float32)

    nxn8 = jnp.zeros((B, 8, 8), bool)
    modes4_nxn = None
    if rd_refine:
        # true RD leaf costs (SSE + lambda*bits) for the SATD-chosen mode;
        # per-CU overhead: intra dir ~5.5 bits + flags/cbfs ~4 bits
        ovh = lam * 9.5
        costs = {d: (_refined_costs(y_plane, ctu_origins, d, modes[d], qp,
                                    lam, pad_w=pad_w, pad_h=pad_h,
                                    n_ctu_x=n_ctu_x) + ovh
                     if d <= max_depth else satds[d])
                 for d in range(4)}
        chroma_cost = None
        if cb_plane is not None:
            from ..ops import quant as quant_lib
            cqp = quant_lib.chroma_qp(qp)
            dist_w = jnp.float32(2.0 ** ((qp - cqp) / 3.0))

            def chroma_cost(d, m):
                out = 0.0
                for cp in (jnp.asarray(cb_plane), jnp.asarray(cr_plane)):
                    out = out + _refined_chroma_costs(
                        cp, ctu_origins, d, m, cqp, lam, dist_w,
                        pad_w=pad_w, pad_h=pad_h, n_ctu_x=n_ctu_x,
                        bits_qp=qp)
                return out

            for d in range(max_depth + 1):
                costs[d] = costs[d] + chroma_cost(d, modes[d])
        if nxn and max_depth == 3:
            # NxN candidate at depth 3: four 4x4 PUs/TUs (DST), competing
            # against 2Nx2N per 8x8 CU (HM xCheckRDCostIntra SIZE_NxN).
            m4, _ = _best_mode_per_node(y_plane, ctu_origins, 4, pad_w,
                                        pad_h, n_ctu_x)
            modes4_nxn = m4
            cost4 = _refined_costs(y_plane, ctu_origins, 4, m4, qp, lam,
                                   pad_w=pad_w, pad_h=pad_h,
                                   n_ctu_x=n_ctu_x, use_dst=True)
            # pool the 16x16 grid of 4x4 leaves into 8x8-CU sums
            c4 = cost4.reshape(B, 8, 2, 8, 2).sum((2, 4)).reshape(B, 64)
            # overhead: part bit + 3 extra intra dirs + extra cbf coding
            nxn_cost = c4 + lam * 27.0
            if chroma_cost is not None:
                m4_tl = m4.reshape(B, 8, 2, 8, 2)[:, :, 0, :, 0]
                nxn_cost = nxn_cost + chroma_cost(
                    3, m4_tl.reshape(B, 64))
            pick_nxn = nxn_cost < costs[3]
            costs[3] = jnp.where(pick_nxn, nxn_cost, costs[3])
            nxn8 = pick_nxn.reshape(B, 8, 8)
        split_bits = lam * 2.0
    else:
        ovh = lam_sqrt * 9.5
        costs = {d: satds[d] + ovh for d in range(4)}
        split_bits = lam_sqrt * 2.0
    split0, split1, split2, depth8 = decide_tree(
        costs, ctu_origins, pad_w=pad_w, pad_h=pad_h,
        split_bits=split_bits, hcpm_probs=hcpm_probs, thr_up=thr_up,
        thr_down=thr_down)

    # scatter modes: per 8x8 unit pick by its depth
    m0 = jnp.broadcast_to(modes[0].reshape(B, 1, 1), (B, 8, 8))
    m1 = jnp.repeat(jnp.repeat(modes[1].reshape(B, 2, 2), 4, 1), 4, 2)
    m2 = jnp.repeat(jnp.repeat(modes[2].reshape(B, 4, 4), 2, 1), 2, 2)
    m3 = modes[3].reshape(B, 8, 8)
    stacked = jnp.stack([m0, m1, m2, m3], axis=-1)
    modes8 = jnp.take_along_axis(stacked, depth8[..., None],
                                 axis=-1)[..., 0]

    # 4x4-granularity modes: NxN leaves use their per-PU modes, everything
    # else repeats the CU mode; nxn8 only applies where depth == 3
    nxn8 = nxn8 & (depth8 == 3)
    modes4 = jnp.repeat(jnp.repeat(modes8, 2, 1), 2, 2)
    if modes4_nxn is not None:
        m4g = modes4_nxn.reshape(B, 8, 2, 8, 2).transpose(0, 1, 3, 2, 4)
        m4g = m4g.reshape(B, 8, 8, 4)  # per 8x8 unit: its 4 sub-modes
        nxn_rep = nxn8[..., None]
        m4sel = jnp.where(nxn_rep, m4g, modes8[..., None])
        # back to [B, 16, 16]
        m4sel = m4sel.reshape(B, 8, 8, 2, 2).transpose(0, 1, 3, 2, 4)
        modes4 = m4sel.reshape(B, 16, 16)
        # keep modes8 = the PU0 mode (chroma DM + neighbour derivation)
        modes8 = modes4[:, ::2, ::2]

    return SearchResult(depth8=depth8, modes8=modes8, split0=split0,
                        split1=split1, split2=split2, modes4=modes4,
                        nxn8=nxn8)


def ctu_grid(pad_w: int, pad_h: int, ctu: int = 64):
    """[B, 2] raster-ordered CTU origins for a padded frame."""
    nx = -(-pad_w // ctu)
    ny = -(-pad_h // ctu)
    ys, xs = np.mgrid[0:ny, 0:nx]
    return np.stack([xs.reshape(-1) * ctu, ys.reshape(-1) * ctu],
                    -1).astype(np.int32)
