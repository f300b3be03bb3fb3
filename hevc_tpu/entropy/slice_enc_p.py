"""P-slice entropy encoding: inter CUs with skip/merge + AMVP/MVD.

Conformant low-delay coding layer: every CU is inter 2Nx2N, uni-L0,
with up to `n_refs` active reference pictures (the reference LDP
operating point uses 4, encoder_lowdelay_P_main.cfg:24). Motion is
coded opportunistically in z-order: if a CU's (mv, refIdx) equals a
normative merge candidate it is coded as cu_skip (when the CU has no
residual — rqt_root_cbf is *inferred* 1 for 2Nx2N merge, 7.3.8.5) or
merge_flag=1; otherwise ref_idx_l0 + AMVP/MVD with the cheaper of the
two normative predictors selected via mvp_l0_flag (8.5.3.2.6-8,
entropy/motion.py).

Behavioral counterparts: HM TEncSbac codeSkipFlag/codeMergeFlag/
codeMergeIndex/codeRefFrmIdx/codeMvd/codeQtRootCbf;
TComDataCU::fillMvpCand/getInterMergeCandidates.

Decisions consumed per frame:
  depth8 [H8, W8]   CU depths (quadtree from pipeline/psearch)
  mvq8   [H8, W8, 2] quarter-pel MVs per 8x8 unit
  ref8   [H8, W8]   L0 reference indices (None = all 0)
  coef_y/cb/cr      quantized coefficient planes (TUs in place)
"""

from __future__ import annotations

import numpy as np

from ..core import zorder
from . import motion, residual, scan as scanlib
from .cabac import CabacEncoder
from .contexts import ContextModels


class PSliceEncoder:
    """Inter-slice CABAC syntax writer. slice_type 'P' (default) or 'B':
    the low-delay B variant codes the same uni-L0 motion but signals
    inter_pred_idc per PU and initialises contexts with initType 2."""

    def __init__(self, cfg, frame_qp: int, slice_type: str = "P",
                 n_refs: int = 1, poc: int = 1, ref_pocs=None):
        self.cfg = cfg
        self.qp = frame_qp
        self.is_b = slice_type == "B"
        self.n_refs = n_refs
        self.poc = poc
        self.ref_pocs = (list(ref_pocs) if ref_pocs is not None
                         else [poc - 1 - i for i in range(n_refs)])
        self._dqp_pending = False
        self.qp_map = None

    def encode(self, bw, depth8, mvq8, coef_y, coef_cb, coef_cr,
               sao=None, ref8=None, intra8=None, imode8=None,
               part8=None, qp_map=None):
        """intra8/imode8: optional [H8, W8] intra-in-P decision maps
        (TEncCu.cpp:1438 escape): intra8 marks intra-coded CUs, imode8
        their luma mode. Intra CUs are excluded from the motion field
        (6.4.1 inter availability).

        part8: optional [H8, W8] PU partition per cell (0 = 2Nx2N,
        1 = 2NxN, 2 = Nx2N); rectangular CUs code part_mode + two PUs
        with per-PU merge/AMVP and the inferred TU split (7.4.9.8
        interSplitFlag with max_transform_hierarchy_depth_inter = 0).
        The per-8x8 mvq8/ref8 maps already carry each PU's motion."""
        self.depth8 = np.asarray(depth8)
        self.mvq8 = np.asarray(mvq8)
        self.part8 = None if part8 is None else np.asarray(part8)
        self.ref8 = None if ref8 is None else np.asarray(ref8)
        self.intra8 = None if intra8 is None else np.asarray(intra8)
        if imode8 is not None and self.intra8 is not None:
            # 4x4-granularity mode map for MPM derivation: DC (mode 1)
            # at non-intra positions (HM candIntraPredMode rule)
            m = np.where(self.intra8, np.asarray(imode8), 1)
            self.imodes4 = np.repeat(np.repeat(m, 2, 0), 2, 1)
        else:
            self.imodes4 = None
        self.coef_y = np.asarray(coef_y)
        self.coef_cb = np.asarray(coef_cb)
        self.coef_cr = np.asarray(coef_cr)
        self.W = self.cfg.pad_width
        self.H = self.cfg.pad_height
        self.zmap = zorder.frame_zmap(self.W, self.H)
        inter8 = None if self.intra8 is None else ~self.intra8
        self.field = motion.MotionField(self.mvq8, self.ref8, self.W,
                                        self.H, self.zmap, inter8=inter8)

        ctx = ContextModels(init_type=2 if self.is_b else 1, qp=self.qp)
        enc = CabacEncoder(bw)
        self.ctx = ctx
        self.enc = enc
        self.skip8 = np.zeros((self.H >> 3, self.W >> 3), np.uint8)

        # cu_qp_delta (LCU rate control): one delta per CTB-sized QG at
        # its first coded TU; QGs with no coded coefficients inherit
        # qPY_PREV (8.6.1 with diff_cu_qp_depth = 0: both spatial
        # predictors fall outside the CTB -> predictor == previous QG's
        # QP in decoding order, slice QP at slice start).
        if qp_map is None and getattr(self.cfg, "cu_qp_delta", False):
            # PPS flag on but uniform QP: code delta-0 per coded CTB
            qp_map = np.full((self.cfg.ctus_y, self.cfg.ctus_x),
                             self.qp, np.int32)
        self.qp_map = None if qp_map is None else np.asarray(qp_map)
        self._qp_prev = self.qp
        self._dqp_pending = False

        nx, ny = self.cfg.ctus_x, self.cfg.ctus_y
        n_ctu = nx * ny
        for ci in range(n_ctu):
            cy, cx = divmod(ci, nx)
            if sao is not None:
                from . import sao_syntax
                sao_syntax.code_sao_ctu(enc, ctx, sao, ci, cx, cy, nx)
            self._dqp_pending = self.qp_map is not None
            self._coding_quadtree(cx * 64, cy * 64, 64, 0)
            enc.encode_terminate(1 if ci == n_ctu - 1 else 0)

    def _cu_depth_at(self, x, y):
        return int(self.depth8[y >> 3, x >> 3])

    def _coding_quadtree(self, x0, y0, size, depth):
        inside = (x0 + size <= self.W) and (y0 + size <= self.H)
        split = self._cu_depth_at(x0, y0) > depth
        if inside and size > 8:
            inc = 0
            if x0 > 0:
                inc += int(self._cu_depth_at(x0 - 1, y0) > depth)
            if y0 > 0:
                inc += int(self._cu_depth_at(x0, y0 - 1) > depth)
            self.enc.encode_bin(self.ctx, self.ctx.idx("split_cu", inc),
                                int(split))
        if (inside and split) or (not inside and size > 8):
            h = size >> 1
            for (dx, dy) in ((0, 0), (h, 0), (0, h), (h, h)):
                x1, y1 = x0 + dx, y0 + dy
                if x1 < self.W and y1 < self.H:
                    self._coding_quadtree(x1, y1, h, depth + 1)
        else:
            self._coding_unit(x0, y0, size)

    def _write_eg1(self, v):
        """Exp-Golomb k=1 bypass (abs_mvd_minus2)."""
        count = 1
        while v >= (1 << count):
            self.enc.encode_bypass(1)
            v -= (1 << count)
            count += 1
        self.enc.encode_bypass(0)
        self.enc.encode_bypass_bins(v, count)

    def _write_merge_idx(self, idx):
        """merge_idx: TU cMax = MaxNumMergeCand-1 = 4; first bin
        context-coded, remaining bypass (9.3.3.7)."""
        enc, ctx = self.enc, self.ctx
        enc.encode_bin(ctx, ctx.idx("merge_idx"), int(idx > 0))
        if idx > 0:
            for _ in range(1, idx):
                enc.encode_bypass(1)
            if idx < 4:
                enc.encode_bypass(0)

    def _write_ref_idx(self, ref):
        """ref_idx_l0: TU cMax = n_refs-1; bin0/bin1 context-coded
        ("ref_pic" 0/1), rest bypass (HM codeRefFrmIdx)."""
        enc, ctx = self.enc, self.ctx
        enc.encode_bin(ctx, ctx.idx("ref_pic", 0), int(ref > 0))
        if ref > 0:
            # remaining TU over cMax-1 values, value ref-1
            rem, cmax = ref - 1, self.n_refs - 2
            for i in range(cmax):
                bit = 0 if i == rem else 1
                if i == 0:
                    enc.encode_bin(ctx, ctx.idx("ref_pic", 1), bit)
                else:
                    enc.encode_bypass(bit)
                if bit == 0:
                    break

    def _skip_ctx_inc(self, x0, y0):
        inc = 0
        if x0 > 0:
            inc += int(self.skip8[y0 >> 3, (x0 - 1) >> 3])
        if y0 > 0:
            inc += int(self.skip8[(y0 - 1) >> 3, x0 >> 3])
        return inc

    # ---- intra-in-P CU (pred_mode_flag = 1; 2Nx2N only) --------------
    def _mpm_for4_p(self, x, y):
        from .slice_enc import mpm_list
        cand_a = 1 if x == 0 else int(self.imodes4[y >> 2, (x - 1) >> 2])
        cand_b = 1
        if y > 0 and (y - 1) >> 6 == y >> 6:
            cand_b = int(self.imodes4[(y - 1) >> 2, x >> 2])
        return mpm_list(cand_a, cand_b)

    def _intra_coding_unit(self, x0, y0, size):
        enc, ctx = self.enc, self.ctx
        enc.encode_bin(ctx, ctx.idx("skip_flag",
                                    self._skip_ctx_inc(x0, y0)), 0)
        enc.encode_bin(ctx, ctx.idx("pred_mode"), 1)
        if size == 8:
            # part_mode coded at min CU size only (7.3.8.5); 2Nx2N
            enc.encode_bin(ctx, ctx.idx("part_mode", 0), 1)
        mode = int(self.imodes4[y0 >> 2, x0 >> 2])
        mpm = self._mpm_for4_p(x0, y0)
        if mode in mpm:
            enc.encode_bin(ctx, ctx.idx("prev_intra_luma_pred"), 1)
            idx = mpm.index(mode)
            enc.encode_bypass(0 if idx == 0 else 1)
            if idx:
                enc.encode_bypass(idx - 1)
        else:
            enc.encode_bin(ctx, ctx.idx("prev_intra_luma_pred"), 0)
            rem = mode
            for m in sorted(mpm, reverse=True):
                if mode > m:
                    rem -= 1
            enc.encode_bypass_bins(rem, 5)
        enc.encode_bin(ctx, ctx.idx("chroma_pred_mode"), 0)  # DM
        self._intra_transform_tree(x0, y0, size, 0, mode)

    def _intra_transform_tree(self, x0, y0, size, trafo_depth, mode):
        enc, ctx = self.enc, self.ctx
        split = size > 32
        log2 = size.bit_length() - 1
        cbf_cb = self._tu_cbf(1, x0, y0, size)
        cbf_cr = self._tu_cbf(2, x0, y0, size)
        if log2 > 2:
            enc.encode_bin(ctx, ctx.idx("qt_cbf_chroma", trafo_depth),
                           cbf_cb)
            enc.encode_bin(ctx, ctx.idx("qt_cbf_chroma", trafo_depth),
                           cbf_cr)
        if split:
            h = size >> 1
            for (dx, dy) in ((0, 0), (h, 0), (0, h), (h, h)):
                x1, y1 = x0 + dx, y0 + dy
                ccb = self._tu_cbf(1, x1, y1, h) if cbf_cb else 0
                ccr = self._tu_cbf(2, x1, y1, h) if cbf_cr else 0
                if cbf_cb:
                    enc.encode_bin(ctx, ctx.idx("qt_cbf_chroma",
                                                trafo_depth + 1), ccb)
                if cbf_cr:
                    enc.encode_bin(ctx, ctx.idx("qt_cbf_chroma",
                                                trafo_depth + 1), ccr)
                cl = self._tu_cbf(0, x1, y1, h)
                enc.encode_bin(ctx, ctx.idx("qt_cbf_luma", 0), cl)
                self._intra_transform_unit(x1, y1, h, cl, ccb, ccr, mode)
            return
        cl = self._tu_cbf(0, x0, y0, size)
        enc.encode_bin(ctx, ctx.idx("qt_cbf_luma",
                                    1 if trafo_depth == 0 else 0), cl)
        self._intra_transform_unit(x0, y0, size, cl, cbf_cb, cbf_cr, mode)

    def _intra_transform_unit(self, x0, y0, size, cl, ccb, ccr, mode):
        if not (cl or ccb or ccr):
            return
        self._maybe_code_dqp(x0, y0)
        if cl:
            blk = self.coef_y[y0:y0 + size, x0:x0 + size]
            st = scanlib.scan_type_for(mode, size, True)
            residual.code_residual(self.enc, self.ctx, blk, is_luma=True,
                                   scan_type=st)
        half = size >> 1
        for (cbf, plane) in ((ccb, self.coef_cb), (ccr, self.coef_cr)):
            if cbf:
                blk = plane[y0 >> 1:(y0 >> 1) + half,
                            x0 >> 1:(x0 >> 1) + half]
                st = scanlib.scan_type_for(mode, half, False)
                residual.code_residual(self.enc, self.ctx, blk,
                                       is_luma=False, scan_type=st)

    def _coding_unit(self, x0, y0, size):
        if self.intra8 is not None and self.intra8[y0 >> 3, x0 >> 3]:
            self._intra_coding_unit(x0, y0, size)
            return
        part = (0 if self.part8 is None
                else int(self.part8[y0 >> 3, x0 >> 3]))
        if part:
            self._rect_coding_unit(x0, y0, size, part)
            return
        enc, ctx = self.enc, self.ctx
        mv = (int(self.mvq8[y0 >> 3, x0 >> 3, 0]),
              int(self.mvq8[y0 >> 3, x0 >> 3, 1]))
        ref = (0 if self.ref8 is None
               else int(self.ref8[y0 >> 3, x0 >> 3]))
        mot = (mv[0], mv[1], ref)
        cands = motion.merge_candidates(self.field, x0, y0, size,
                                        self.n_refs)
        merge_idx = cands.index(mot) if mot in cands else -1
        cbf_l = self._tu_cbf(0, x0, y0, size)
        cbf_cb = self._tu_cbf(1, x0, y0, size)
        cbf_cr = self._tu_cbf(2, x0, y0, size)
        root_cbf = int(cbf_l or cbf_cb or cbf_cr)

        skip = merge_idx >= 0 and not root_cbf
        enc.encode_bin(ctx, ctx.idx("skip_flag", self._skip_ctx_inc(x0, y0)),
                       int(skip))
        if skip:
            self._write_merge_idx(merge_idx)
            self.skip8[y0 >> 3:(y0 + size) >> 3,
                       x0 >> 3:(x0 + size) >> 3] = 1
            return
        # pred_mode_flag: inter
        enc.encode_bin(ctx, ctx.idx("pred_mode"), 0)
        # part_mode: 2Nx2N
        enc.encode_bin(ctx, ctx.idx("part_mode", 0), 1)
        enc.encode_bin(ctx, ctx.idx("merge_flag"), int(merge_idx >= 0))
        if merge_idx >= 0:
            self._write_merge_idx(merge_idx)
            # rqt_root_cbf inferred 1 for 2Nx2N merge (7.3.8.5)
            self._transform_tree(x0, y0, size, cbf_cb, cbf_cr)
            return
        if self.is_b:
            # inter_pred_idc = PRED_L0 (9.3.3.7: bin0 "bi?" at ctx
            # CtDepth, bin1 "L1?" at ctx 4)
            depth = 6 - (size.bit_length() - 1)
            enc.encode_bin(ctx, ctx.idx("inter_dir", depth), 0)
            enc.encode_bin(ctx, ctx.idx("inter_dir", 4), 0)
        if self.n_refs > 1:
            self._write_ref_idx(ref)
        mvps = motion.amvp_candidates(self.field, x0, y0, size, size,
                                      ref, self.ref_pocs, self.poc)

        def mvd_cost(p):
            return abs(mv[0] - p[0]) + abs(mv[1] - p[1])

        # single-ref keeps the historical mvp_l0_flag=0 choice so the
        # native C++ CABAC twin stays byte-identical; multi-ref picks
        # the cheaper of the two normative predictors
        mvp_idx = (0 if self.n_refs == 1
                   else int(mvd_cost(mvps[1]) < mvd_cost(mvps[0])))
        mvp = mvps[mvp_idx]
        self._write_mvd(mv, mvp)
        enc.encode_bin(ctx, ctx.idx("mvp_idx"), mvp_idx)

        enc.encode_bin(ctx, ctx.idx("qt_root_cbf"), root_cbf)
        if not root_cbf:
            return
        self._transform_tree(x0, y0, size, cbf_cb, cbf_cr)

    def _write_mvd(self, mv, mvp):
        """abs_mvd_greater0/1 + abs_mvd_minus2 + sign (7.3.8.9)."""
        enc, ctx = self.enc, self.ctx
        mvd = (mv[0] - mvp[0], mv[1] - mvp[1])
        ax, ay = abs(mvd[0]), abs(mvd[1])
        enc.encode_bin(ctx, ctx.idx("mvd", 0), int(ax > 0))
        enc.encode_bin(ctx, ctx.idx("mvd", 0), int(ay > 0))
        if ax > 0:
            enc.encode_bin(ctx, ctx.idx("mvd", 1), int(ax > 1))
        if ay > 0:
            enc.encode_bin(ctx, ctx.idx("mvd", 1), int(ay > 1))
        if ax > 0:
            if ax > 1:
                self._write_eg1(ax - 2)
            enc.encode_bypass(int(mvd[0] < 0))
        if ay > 0:
            if ay > 1:
                self._write_eg1(ay - 2)
            enc.encode_bypass(int(mvd[1] < 0))

    def _rect_coding_unit(self, x0, y0, size, part):
        """Inter CU with two rectangular PUs (2NxN part=1 / Nx2N part=2):
        skip=0, part_mode '01'/'00' (amp off, 9.3.3.5), per-PU
        merge-or-AMVP motion, rqt_root_cbf, inferred TU split for
        16/32 CUs (7.4.9.8 interSplitFlag)."""
        enc, ctx = self.enc, self.ctx
        enc.encode_bin(ctx, ctx.idx("skip_flag",
                                    self._skip_ctx_inc(x0, y0)), 0)
        enc.encode_bin(ctx, ctx.idx("pred_mode"), 0)
        enc.encode_bin(ctx, ctx.idx("part_mode", 0), 0)
        enc.encode_bin(ctx, ctx.idx("part_mode", 1), int(part == 1))
        h = size >> 1
        pus = ([(x0, y0, size, h), (x0, y0 + h, size, h)] if part == 1
               else [(x0, y0, h, size), (x0 + h, y0, h, size)])
        for pidx, (xp, yp, wp, hp) in enumerate(pus):
            mv = (int(self.mvq8[yp >> 3, xp >> 3, 0]),
                  int(self.mvq8[yp >> 3, xp >> 3, 1]))
            ref = (0 if self.ref8 is None
                   else int(self.ref8[yp >> 3, xp >> 3]))
            mot = (mv[0], mv[1], ref)
            cands = motion.merge_candidates(
                self.field, xp, yp, size, self.n_refs, w=wp, h=hp,
                part_mode=part, part_idx=pidx)
            merge_idx = cands.index(mot) if mot in cands else -1
            enc.encode_bin(ctx, ctx.idx("merge_flag"),
                           int(merge_idx >= 0))
            if merge_idx >= 0:
                self._write_merge_idx(merge_idx)
                continue
            if self.is_b:
                depth = 6 - (size.bit_length() - 1)
                enc.encode_bin(ctx, ctx.idx("inter_dir", depth), 0)
                enc.encode_bin(ctx, ctx.idx("inter_dir", 4), 0)
            if self.n_refs > 1:
                self._write_ref_idx(ref)
            mvps = motion.amvp_candidates(self.field, xp, yp, wp, hp,
                                          ref, self.ref_pocs, self.poc,
                                          cu_size=size, part_mode=part,
                                          part_idx=pidx)

            def mvd_cost(p):
                return abs(mv[0] - p[0]) + abs(mv[1] - p[1])

            mvp_idx = int(mvd_cost(mvps[1]) < mvd_cost(mvps[0]))
            self._write_mvd(mv, mvps[mvp_idx])
            enc.encode_bin(ctx, ctx.idx("mvp_idx"), mvp_idx)
        cbf_cb = self._tu_cbf(1, x0, y0, size)
        cbf_cr = self._tu_cbf(2, x0, y0, size)
        root_cbf = int(self._tu_cbf(0, x0, y0, size) or cbf_cb or cbf_cr)
        enc.encode_bin(ctx, ctx.idx("qt_root_cbf"), root_cbf)
        if root_cbf:
            self._transform_tree(x0, y0, size, cbf_cb, cbf_cr,
                                 force_split=True)

    def _tu_cbf(self, plane, x0, y0, size):
        if plane == 0:
            blk = self.coef_y[y0:y0 + size, x0:x0 + size]
        elif plane == 1:
            blk = self.coef_cb[y0 >> 1:(y0 + size) >> 1,
                               x0 >> 1:(x0 + size) >> 1]
        else:
            blk = self.coef_cr[y0 >> 1:(y0 + size) >> 1,
                               x0 >> 1:(x0 + size) >> 1]
        return int(np.any(blk != 0))

    def _transform_tree(self, x0, y0, size, cbf_cb, cbf_cr,
                        force_split=False):
        enc, ctx = self.enc, self.ctx
        split = size > 32 or force_split
        enc.encode_bin(ctx, ctx.idx("qt_cbf_chroma", 0), cbf_cb)
        enc.encode_bin(ctx, ctx.idx("qt_cbf_chroma", 0), cbf_cr)
        if split:
            h = size >> 1
            for (dx, dy) in ((0, 0), (h, 0), (0, h), (h, h)):
                x1, y1 = x0 + dx, y0 + dy
                ccb = self._tu_cbf(1, x1, y1, h) if cbf_cb else 0
                ccr = self._tu_cbf(2, x1, y1, h) if cbf_cr else 0
                if cbf_cb:
                    enc.encode_bin(ctx, ctx.idx("qt_cbf_chroma", 1), ccb)
                if cbf_cr:
                    enc.encode_bin(ctx, ctx.idx("qt_cbf_chroma", 1), ccr)
                cl = self._tu_cbf(0, x1, y1, h)
                enc.encode_bin(ctx, ctx.idx("qt_cbf_luma", 0), cl)
                self._transform_unit(x1, y1, h, cl, ccb, ccr)
        else:
            cl = self._tu_cbf(0, x0, y0, size)
            if cbf_cb or cbf_cr:
                # inter leaf at trafoDepth 0: cbf_luma coded
                enc.encode_bin(ctx, ctx.idx("qt_cbf_luma", 1), cl)
            # else: cbf_luma inferred 1 (rqt_root_cbf was 1)
            self._transform_unit(x0, y0, size, cl, cbf_cb, cbf_cr)

    def _maybe_code_dqp(self, x0, y0):
        """cu_qp_delta at the first coded TU of the CTB-sized QG
        (7.3.8.12; the encoder's per-CTB QP comes from qp_map)."""
        if not self._dqp_pending:
            return
        self._dqp_pending = False
        qpn = int(self.qp_map[y0 >> 6, x0 >> 6])
        self._write_dqp(qpn - self._qp_prev)
        self._qp_prev = qpn

    def _write_dqp(self, delta):
        """cu_qp_delta_abs (TR cMax 5, ctx dqp[0]/dqp[1] + EG0 bypass
        suffix) + cu_qp_delta_sign_flag (9.3.3; HM codeDeltaQP)."""
        enc, ctx = self.enc, self.ctx
        a = abs(delta)
        prefix = min(a, 5)
        enc.encode_bin(ctx, ctx.idx("dqp", 0), int(a > 0))
        if a > 0:
            for _ in range(1, prefix):
                enc.encode_bin(ctx, ctx.idx("dqp", 1), 1)
            if prefix < 5:
                enc.encode_bin(ctx, ctx.idx("dqp", 1), 0)
            else:
                v, k = a - 5, 0             # EG0 (xWriteEpExGolomb)
                while v >= (1 << k):
                    enc.encode_bypass(1)
                    v -= 1 << k
                    k += 1
                enc.encode_bypass(0)
                for i in reversed(range(k)):
                    enc.encode_bypass((v >> i) & 1)
            enc.encode_bypass(int(delta < 0))

    def _transform_unit(self, x0, y0, size, cl, ccb, ccr):
        if not (cl or ccb or ccr):
            return
        self._maybe_code_dqp(x0, y0)
        if cl:
            blk = self.coef_y[y0:y0 + size, x0:x0 + size]
            residual.code_residual(self.enc, self.ctx, blk, is_luma=True,
                                   scan_type=scanlib.SCAN_DIAG)
        half = size >> 1
        if ccb:
            blk = self.coef_cb[y0 >> 1:(y0 >> 1) + half,
                               x0 >> 1:(x0 >> 1) + half]
            residual.code_residual(self.enc, self.ctx, blk, is_luma=False,
                                   scan_type=scanlib.SCAN_DIAG)
        if ccr:
            blk = self.coef_cr[y0 >> 1:(y0 >> 1) + half,
                               x0 >> 1:(x0 >> 1) + half]
            residual.code_residual(self.enc, self.ctx, blk, is_luma=False,
                                   scan_type=scanlib.SCAN_DIAG)
