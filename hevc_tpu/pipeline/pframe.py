"""P/B-frame coding (device compute): ME + MC + residual transform + recon.

Two device paths:
  - `tree="flat"`: every CTU one inter 2Nx2N 64x64 CU vs the previous
    reconstruction (the reference pre-encode shape,
    HM-16.5_Resi_Pre/TEncCu.cpp:388-397) — used for the LDP pre-encode
    stage and as a fast operating point.
  - `tree="quadtree"` (default): full inter CU-tree RDO via
    pipeline/psearch.py (HM TEncCu.cpp:375 xCompressCU analogue), with
    optional HCPM gating from the LDP predictor.

Unlike intra, inter reconstruction has no spatial dependency, so the
whole frame batches in one jitted program. Entropy:
entropy/slice_enc_p.py (P) / B contexts per slice_mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import inter, quant, transforms
from . import ldp as ldp_lib
from . import search as search_lib


def _tile_tu_transform(tiles, qp, tu: int, rdoq=True, is_luma=True):
    """[B, S, S] residual tiles -> (levels, recon_resi) per TU of size tu."""
    B, S, _ = tiles.shape
    g = S // tu
    t = tiles.reshape(B, g, tu, g, tu).transpose(0, 1, 3, 2, 4)
    t = t.reshape(B * g * g, tu, tu)
    cf = transforms.forward_transform(t)
    if rdoq:
        from ..ops import rdoq as rdoq_lib
        lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
        lvl = rdoq_lib.rd_quantize(cf, qp, lam, is_intra=False,
                                   is_luma=is_luma)
    else:
        lvl = quant.quantize(cf, qp, is_intra=False)
    rr = transforms.inverse_transform(quant.dequantize(lvl, qp))

    def back(x):
        x = x.reshape(B, g, g, tu, tu).transpose(0, 1, 3, 2, 4)
        return x.reshape(B, S, S)

    return back(lvl), back(rr)


def encode_p_frame_device(cur_y, cur_cb, cur_cr, ref_y, ref_cb, ref_cr, *,
                          qp: int, pad_w: int, pad_h: int):
    """Jittable P-frame coding vs the reconstructed reference frame.

    Returns (coef tiles y/cb/cr, recon tiles y/cb/cr, mv_q [B, 2])."""
    origins = jnp.asarray(search_lib.ctu_grid(pad_w, pad_h))
    cqp = quant.chroma_qp(qp)

    def tiles_of(plane, s):
        h, w = plane.shape
        o = origins if s == 64 else origins // 2
        ys = jnp.clip(o[:, 1:2, None] + jnp.arange(s)[None, :, None],
                      0, h - 1)
        xs = jnp.clip(o[:, 0:1, None] + jnp.arange(s)[None, None, :],
                      0, w - 1)
        return jnp.take(plane.reshape(-1), ys * w + xs, axis=0
                        ).astype(jnp.int32)

    cur_y_t = tiles_of(jnp.asarray(cur_y), 64)
    mv_int, _ = inter.integer_search_ctu(cur_y_t, jnp.asarray(ref_y),
                                         origins, radius=8)
    mv_q, _ = ldp_lib._quarter_refine(cur_y_t, jnp.asarray(ref_y), origins,
                                      mv_int)

    pred_y = inter.predict_inter_ctu(jnp.asarray(ref_y), origins, mv_q,
                                     is_luma=True)
    pred_cb = inter.predict_inter_ctu(jnp.asarray(ref_cb), origins // 2,
                                      mv_q, is_luma=False)
    pred_cr = inter.predict_inter_ctu(jnp.asarray(ref_cr), origins // 2,
                                      mv_q, is_luma=False)

    resi_y = cur_y_t - pred_y
    resi_cb = tiles_of(jnp.asarray(cur_cb), 32) - pred_cb
    resi_cr = tiles_of(jnp.asarray(cur_cr), 32) - pred_cr

    lvl_y, rr_y = _tile_tu_transform(resi_y, qp, 32)
    lvl_cb, rr_cb = _tile_tu_transform(resi_cb, cqp, 16, is_luma=False)
    lvl_cr, rr_cr = _tile_tu_transform(resi_cr, cqp, 16, is_luma=False)

    rec_y = jnp.clip(pred_y + rr_y, 0, 255)
    rec_cb = jnp.clip(pred_cb + rr_cb, 0, 255)
    rec_cr = jnp.clip(pred_cr + rr_cr, 0, 255)
    return (lvl_y.astype(jnp.int16), lvl_cb.astype(jnp.int16),
            lvl_cr.astype(jnp.int16),
            rec_y.astype(jnp.uint8), rec_cb.astype(jnp.uint8),
            rec_cr.astype(jnp.uint8), mv_q)


def _gate_max_depth(hcpm_probs, thr, pad_w, pad_h) -> int:
    """Deepest CU level any HCPM gate leaves open this frame, floored at
    the forced-split depth (shared contract with AIEncoder
    ._gate_max_depth; host-side scalar selecting a narrower compiled
    inter-search program)."""
    import numpy as np
    from ..models import hcpm as hcpm_lib
    from . import search as search_lib
    cs = np.asarray(hcpm_lib.split_gates(hcpm_probs, thr)[1])
    if cs[:, 5:21].any():
        md = 3
    elif cs[:, 1:5].any():
        md = 2
    elif cs[:, 0].any():
        md = 1
    else:
        md = 0
    return max(md, search_lib.forced_depth_floor(pad_w, pad_h))


class LDPEncoder:
    """Low-Delay-P sequence encoder: IDR + full CU-tree P frames.

    Replaces the reference's two-binary lockstep (SURVEY.md 3.2) with a
    single program per frame: (1) optional forced-64x64 pre-encode
    against the previous reconstruction producing the residue frame, (2)
    ETH-CNN+ETH-LSTM HCPM prediction with resident state, (3) HCPM-gated
    quadtree inter search + coding (pipeline/psearch), (4) merge/skip-
    aware P-slice CABAC. GOP-4 per-frame QP offsets follow the reference
    encoder_lowdelay_P_main.cfg operating point.

    tree='full' runs pipeline/psearch (quadtree + merge/skip entropy);
    tree='flat' keeps the v0 single-64x64-CU path (kept for parity
    tests and as the fastest operating point).
    """

    def __init__(self, cfg, cnn_params=None, lstm_params=None,
                 thresholds=None, tree: str = "full",
                 use_gop_qp: bool = True, slice_mode: str = "P",
                 max_depth_exit: bool = False, rect_pu: bool = True):
        if cfg.pad_width % 64 or cfg.pad_height % 64:
            # LDP codes whole CTUs only; pad to 64-multiples and crop via
            # the SPS conformance window (reference 416x240 cfg works).
            import dataclasses
            cfg = dataclasses.replace(cfg, pad_align=64)
        assert slice_mode in ("P", "B")
        self.cfg = cfg
        self.tree = tree
        self.rect_pu = rect_pu
        self.use_gop_qp = use_gop_qp
        self.slice_mode = slice_mode  # "B" = low-delay B operating point
        # frame-level max-depth program narrowing from the HCPM gates
        # (same contract as AIEncoder.max_depth_exit)
        self.max_depth_exit = max_depth_exit and lstm_params is not None
        from .ai import AIEncoder
        from . import ldp as ldp_mod, psearch as psearch_mod
        self.intra = AIEncoder(cfg, cnn_params=cnn_params)
        self.predictor = None
        if lstm_params is not None:
            self.predictor = ldp_mod.LDPPredictor(cfg, lstm_params,
                                                  thresholds)
        self._pre_jit = jax.jit(functools.partial(
            ldp_mod.pre_encode, pad_w=cfg.pad_width,
            pad_h=cfg.pad_height))
        self._p_jit = {}        # frame_qp -> jitted search
        self._psearch = psearch_mod.p_search_frame

    def _frame_qp(self, poc: int) -> int:
        offsets = self.cfg.gop_qp_offsets
        if poc == 0 or not self.use_gop_qp or not offsets:
            return self.cfg.qp
        off = offsets[(poc - 1) % len(offsets)]
        return min(51, self.cfg.qp + off)

    def _qp_set(self):
        """Static tuple of every frame QP this sequence can use: the
        base QP plus the GOP-offset QPs (and the rate-control window
        when enabled via cfg). One compiled psearch serves them all."""
        qps = {self.cfg.qp}
        if self.use_gop_qp and self.cfg.gop_qp_offsets:
            qps |= {min(51, self.cfg.qp + o)
                    for o in self.cfg.gop_qp_offsets}
        qps |= set(getattr(self, "extra_qps", ()))
        return tuple(sorted(qps))

    def _search_fn(self, frame_qp: int, gated: bool, max_depth: int = 3):
        """tree='full': ONE jitted program per (gated, max_depth) with
        the frame QP as a traced argument — GOP-4 QP offsets and
        rate-control QP changes reuse the same compile (the round-4
        harness disabled GOP offsets because each distinct QP keyed a
        multi-minute recompile). tree='flat' keeps per-QP compiles."""
        cfg = self.cfg
        if self.tree == "flat":
            key = ("flat", frame_qp)
            if key not in self._p_jit:
                self._p_jit[key] = jax.jit(functools.partial(
                    encode_p_frame_device, qp=frame_qp,
                    pad_w=cfg.pad_width, pad_h=cfg.pad_height))
            return self._p_jit[key]
        per_ctu = isinstance(frame_qp, np.ndarray)
        qp_set = self._qp_set()
        if per_ctu:
            qp_set = tuple(sorted(set(qp_set)
                                  | set(getattr(self, "rc_qp_window",
                                                ()))))
        elif frame_qp not in qp_set:     # rate control outside the set
            qp_set = tuple(sorted(set(qp_set) | {frame_qp}))
            self.extra_qps = tuple(sorted(
                set(getattr(self, "extra_qps", ())) | {frame_qp}))
        key = (qp_set, gated, max_depth, per_ctu)
        if key not in self._p_jit:
            thr = (self.predictor.thr if (gated and self.predictor)
                   else None)
            kw = dict(pad_w=cfg.pad_width, pad_h=cfg.pad_height,
                      use_rdoq=cfg.rdoq, max_depth=max_depth,
                      rect_pu=self.rect_pu, qp_set=qp_set)
            if per_ctu:
                # intra-in-P re-codes on host at the slice QP, which
                # would desync per-CTB dequant -> off under LCU RC
                kw.update(intra_in_p=False)
            if thr is not None:
                kw.update(thr_up=thr.up, thr_down=thr.down)
            self._p_jit[key] = jax.jit(functools.partial(
                self._psearch, **kw))
        fn = self._p_jit[key]
        qp_arg = (jnp.asarray(frame_qp, jnp.int32) if per_ctu
                  else jnp.int32(frame_qp))
        return functools.partial(fn, qp=qp_arg)

    def encode(self, frames, with_hash_sei: bool = True,
               rate_control=None, collect=None):
        """collect: optional list; when given, per-P-frame training data
        is appended as {"poc", "depth4" [B,4,4], "resi" [B,64,64]} — the
        ground-truth labels (reference Extract_Data TEncSlice.cpp:880-888)
        and pre-encode residues (Resi_Pre TEncSearch.cpp:4500-4570) in one
        pass, with residues against the previous *reconstruction* exactly
        as the gated eval path sees them."""
        from ..core.yuv import Frame, crop_frame, pad_frame
        from ..entropy import headers
        from ..entropy.slice_enc_p import PSliceEncoder
        from . import golden, ldp as ldp_mod
        from . import search as search_lib

        cfg = self.cfg
        W, H = cfg.pad_width, cfg.pad_height
        chunks = [headers.write_vps(cfg), headers.write_sps(cfg),
                  headers.write_pps(cfg)]
        recons = []
        dpb = []                  # padded recons, newest first
        origins = jnp.asarray(search_lib.ctu_grid(W, H))
        if self.predictor is not None:
            self.predictor.reset()
        self.frame_qps = []  # actual per-picture QPs (for the CLI log)
        for poc, frame in enumerate(frames):
            pf = pad_frame(frame, cfg.pad_width, cfg.pad_height)
            frame_qp = (rate_control.pre_frame() if rate_control
                        else self._frame_qp(poc))
            self.frame_qps.append(frame_qp)
            n_chunks0 = len(chunks)
            if poc == 0:
                d8, m8, m4, nxn = self.intra.decide_frame_full(
                    pf.y, frame_qp, pf.cb, pf.cr)
                decisions, rec = self.intra.reconstruct(
                    pf, d8, m8, frame_qp, modes4=m4, nxn8=nxn)
                chunks.append(self.intra._entropy_encode(decisions,
                                                         frame_qp))
            elif self.tree == "flat":
                rec, chunk = self._encode_flat(pf, dpb[0], poc, frame_qp)
                chunks.append(chunk)
            else:
                prev = dpb[0]
                n_act = min(poc, cfg.num_refs)
                lcu_rc = (rate_control is not None
                          and hasattr(rate_control, "pre_frame_lcu"))
                if lcu_rc:
                    assert cfg.cu_qp_delta, \
                        "LCU rate control needs cfg.cu_qp_delta"
                    self.rc_qp_window = rate_control.qp_window
                hcpm = None
                ry = None
                if (self.predictor is not None or collect is not None
                        or lcu_rc):
                    # pre-encode always vs the previous reconstruction
                    # (reference Resi_Pre behavior)
                    ry, _, _, _ = self._pre_jit(
                        pf.y.astype(np.int32), prev.y.astype(np.int32),
                        pf.cb.astype(np.int32), prev.cb.astype(np.int32),
                        pf.cr.astype(np.int32), prev.cr.astype(np.int32))
                if self.predictor is not None:
                    hcpm = self.predictor.step(ry, poc)
                qp_map = None
                search_qp = frame_qp
                if lcu_rc:
                    # per-LCU bit allocation weighted by the pre-encode
                    # residue MAD (TEncRCPic::getLCUTargetBpp analogue)
                    mad = np.asarray(
                        jnp.abs(jnp.asarray(ry, jnp.int32) - 128)
                        .mean(axis=(1, 2)))
                    search_qp = rate_control.pre_frame_lcu(mad, frame_qp)
                    qp_map = search_qp.reshape(cfg.ctus_y, cfg.ctus_x)
                # static-shape ref stacks (newest first): pad by
                # repeating the oldest; psearch masks the invalid tail
                rl = (dpb + [dpb[-1]] * cfg.num_refs)[:cfg.num_refs]
                ref_y = np.stack([r.y for r in rl]).astype(np.int32)
                ref_cb = np.stack([r.cb for r in rl]).astype(np.int32)
                ref_cr = np.stack([r.cr for r in rl]).astype(np.int32)
                md = 3
                if self.max_depth_exit and hcpm is not None:
                    md = _gate_max_depth(hcpm, self.predictor.thr,
                                         cfg.pad_width, cfg.pad_height)
                res = self._search_fn(search_qp, hcpm is not None, md)(
                    pf.y.astype(np.int32), pf.cb.astype(np.int32),
                    pf.cr.astype(np.int32),
                    ref_y, ref_cb, ref_cr, origins,
                    hcpm_probs=hcpm,
                    n_active_refs=jnp.int32(n_act))
                if collect is not None:
                    # depth per 16x16 unit: within one unit all 8x8 depths
                    # agree (8x8 CUs only exist at depth 3), so ::2 strides
                    collect.append({
                        "poc": poc,
                        "depth4": np.asarray(res.depth8)[:, ::2, ::2]
                        .astype(np.uint8),
                        "resi": np.asarray(ry).astype(np.uint8),
                    })
                rec, chunk = self.finish_p_frame(pf, res, poc, frame_qp,
                                                 n_act, qp_map=qp_map)
                chunks.append(chunk)
            if rate_control:
                rate_control.post_frame(
                    8 * sum(len(c) for c in chunks[n_chunks0:]))
            if with_hash_sei:
                tid, hs = golden.pic_hashes(rec, cfg.hash_type)
                chunks.append(headers.write_hash_sei(*hs, hash_type=tid))
            # returned recon = decoder-output view (conformance-cropped);
            # referencing and the hash SEI use the full padded picture
            recons.append(crop_frame(rec, cfg.width, cfg.height))
            dpb.insert(0, rec)
            del dpb[max(self.cfg.num_refs, 1):]
        return b"".join(chunks), recons

    def finish_p_frame(self, pf, res, poc, frame_qp, n_act, qp_map=None):
        """Host finish of one searched P frame: tile->plane assembly,
        intra-in-P normative re-code, loop filters, slice NAL. Returns
        (padded reconstruction Frame, NAL bytes). Shared by the
        sequential encoder above and parallel.frames.ChainParallelLDP
        so the lockstep path cannot drift."""
        from ..core.yuv import Frame
        from ..entropy import headers
        from . import ldp as ldp_mod

        cfg = self.cfg
        W, H = cfg.pad_width, cfg.pad_height
        coef_y = ldp_mod.tiles_to_plane(res.coef_y, W, H, 64)
        coef_cb = ldp_mod.tiles_to_plane(res.coef_cb, W // 2, H // 2, 32)
        coef_cr = ldp_mod.tiles_to_plane(res.coef_cr, W // 2, H // 2, 32)
        rec = Frame(
            ldp_mod.tiles_to_plane(res.rec_y, W, H, 64),
            ldp_mod.tiles_to_plane(res.rec_cb, W // 2, H // 2, 32),
            ldp_mod.tiles_to_plane(res.rec_cr, W // 2, H // 2, 32))
        depth8 = ldp_mod.tiles_to_plane(res.depth8, W // 8, H // 8, 8)
        mvx = ldp_mod.tiles_to_plane(res.mv8[..., 0], W // 8, H // 8, 8)
        mvy = ldp_mod.tiles_to_plane(res.mv8[..., 1], W // 8, H // 8, 8)
        mvq8 = np.stack([mvx, mvy], -1).astype(np.int32)
        ref8 = ldp_mod.tiles_to_plane(res.ref8, W // 8,
                                      H // 8, 8).astype(np.int32)
        intra8 = ldp_mod.tiles_to_plane(
            res.intra8, W // 8, H // 8, 8).astype(bool)
        imode8 = ldp_mod.tiles_to_plane(
            res.imode8, W // 8, H // 8, 8).astype(np.int32)
        part8 = ldp_mod.tiles_to_plane(
            res.part8, W // 8, H // 8, 8).astype(np.int32)
        if not part8.any():
            part8 = None
        if intra8.any():
            # normative re-code of intra CUs from reconstructed
            # neighbours, patching recon + coef planes in z-order
            from . import intra_p
            ry_p = np.asarray(rec.y, np.int32)
            rcb_p = np.asarray(rec.cb, np.int32)
            rcr_p = np.asarray(rec.cr, np.int32)
            coef_y = np.asarray(coef_y, np.int32)
            coef_cb = np.asarray(coef_cb, np.int32)
            coef_cr = np.asarray(coef_cr, np.int32)
            intra_p.patch_intra_cus(
                pf.y, pf.cb, pf.cr, ry_p, rcb_p, rcr_p,
                coef_y, coef_cb, coef_cr,
                np.asarray(depth8), intra8, imode8, frame_qp,
                W, H, rdoq=cfg.rdoq)
            rec = Frame(ry_p.astype(np.uint8), rcb_p.astype(np.uint8),
                        rcr_p.astype(np.uint8))
        else:
            intra8 = None
        sao_params = None
        if cfg.deblock or cfg.sao:
            yy, cb_, cr_ = rec.y, rec.cb, rec.cr
            if cfg.deblock:
                from ..ops import deblock as dbk
                yy, cb_, cr_ = dbk.deblock_frame_inter(
                    yy, cb_, cr_, depth8, mvq8, coef_y, frame_qp,
                    ref8=ref8, intra8=intra8, part8=part8)
            if cfg.sao:
                from ..ops import sao as sao_lib
                sao_params = sao_lib.estimate_frame(
                    pf.y, pf.cb, pf.cr, yy, cb_, cr_, frame_qp)
                yy, cb_, cr_ = sao_lib.apply_frame(yy, cb_, cr_,
                                                   sao_params)
            rec = Frame(np.asarray(yy).astype(np.uint8),
                        np.asarray(cb_).astype(np.uint8),
                        np.asarray(cr_).astype(np.uint8))

        bw = (headers.start_b_slice(cfg, frame_qp, poc, n_act)
              if self.slice_mode == "B"
              else headers.start_p_slice(cfg, frame_qp, poc, n_act))
        chunk = self._p_slice_nal(
            bw, depth8, mvq8, coef_y, coef_cb, coef_cr, frame_qp,
            sao_params, ref8=ref8, n_refs=n_act, poc=poc,
            intra8=intra8, imode8=imode8, part8=part8, qp_map=qp_map)
        return rec, chunk

    def _p_slice_nal(self, bw, depth8, mvq8, coef_y, coef_cb, coef_cr,
                     frame_qp, sao_params=None, ref8=None, n_refs=1,
                     poc=1, intra8=None, imode8=None, part8=None,
                     qp_map=None):
        """P slice data: native C++ CABAC (SAO + multi-ref + intra-in-P
        + rect-PU capable), Python PSliceEncoder fallback —
        byte-identical paths (tests/test_native_entropy.py)."""
        from ..entropy import headers
        from ..entropy.slice_enc_p import PSliceEncoder
        cfg = self.cfg
        if qp_map is None and getattr(cfg, "cu_qp_delta", False):
            # PPS flag without an RC map: uniform map -> delta-0 syntax
            qp_map = np.full((cfg.ctus_y, cfg.ctus_x), frame_qp,
                             np.int32)
        try:
            from .. import native
            data = native.encode_slice_data_p(
                depth8, mvq8, coef_y, coef_cb, coef_cr,
                cfg.pad_width, cfg.pad_height, frame_qp,
                is_b=self.slice_mode == "B", ref8=ref8,
                n_refs=n_refs, poc=poc, sao=sao_params,
                intra8=intra8, imode8=imode8, part8=part8,
                qp_map=qp_map)
            from ..entropy.bitstream import nal_unit, NAL_TRAIL_R
            return nal_unit(NAL_TRAIL_R, bw.get_bytes() + data)
        except NotImplementedError:
            pass                 # deliberate Python-path toolsets
        except Exception:
            import logging
            logging.getLogger(__name__).warning(
                "native P entropy failed; falling back to Python "
                "CABAC", exc_info=True)
        pse = PSliceEncoder(cfg, frame_qp, slice_type=self.slice_mode,
                            n_refs=n_refs, poc=poc)
        pse.encode(bw, depth8, mvq8, coef_y, coef_cb, coef_cr,
                   sao=sao_params, ref8=ref8, intra8=intra8,
                   imode8=imode8, part8=part8, qp_map=qp_map)
        return headers.finish_p_slice_nal(bw)

    def _encode_flat(self, pf, prev, poc, frame_qp):
        from ..core.yuv import Frame
        from ..entropy import headers
        from ..entropy.slice_enc_p import PSliceEncoder
        from . import ldp as ldp_mod

        cfg = self.cfg
        W, H = cfg.pad_width, cfg.pad_height
        (cy, ccb, ccr, ry, rcb, rcr, mvq) = self._search_fn(
            frame_qp, False)(
            pf.y.astype(np.int32), pf.cb.astype(np.int32),
            pf.cr.astype(np.int32),
            prev.y.astype(np.int32), prev.cb.astype(np.int32),
            prev.cr.astype(np.int32))
        coef_y = ldp_mod.tiles_to_plane(cy, W, H, 64)
        coef_cb = ldp_mod.tiles_to_plane(ccb, W // 2, H // 2, 32)
        coef_cr = ldp_mod.tiles_to_plane(ccr, W // 2, H // 2, 32)
        rec = Frame(ldp_mod.tiles_to_plane(ry, W, H, 64),
                    ldp_mod.tiles_to_plane(rcb, W // 2, H // 2, 32),
                    ldp_mod.tiles_to_plane(rcr, W // 2, H // 2, 32))
        mvq = np.asarray(mvq)
        h8, w8 = H // 8, W // 8
        mvq8 = np.zeros((h8, w8, 2), np.int32)
        nx = cfg.ctus_x
        for b in range(mvq.shape[0]):
            by, bx = divmod(b, nx)
            mvq8[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = mvq[b]
        depth8 = np.zeros((h8, w8), np.int32)
        sao_params = None
        if cfg.deblock or cfg.sao:
            yy, cb_, cr_ = rec.y, rec.cb, rec.cr
            if cfg.deblock:
                from ..ops import deblock as dbk
                yy, cb_, cr_ = dbk.deblock_frame_inter(
                    yy, cb_, cr_, depth8, mvq8, coef_y, frame_qp)
            if cfg.sao:
                from ..ops import sao as sao_lib
                sao_params = sao_lib.estimate_frame(
                    pf.y, pf.cb, pf.cr, yy, cb_, cr_, frame_qp)
                yy, cb_, cr_ = sao_lib.apply_frame(yy, cb_, cr_,
                                                   sao_params)
            rec = Frame(np.asarray(yy).astype(np.uint8),
                        np.asarray(cb_).astype(np.uint8),
                        np.asarray(cr_).astype(np.uint8))

        bw = headers.start_p_slice(cfg, frame_qp, poc)
        return rec, self._p_slice_nal(bw, depth8, mvq8, coef_y, coef_cb,
                                      coef_cr, frame_qp, sao_params)
