"""Slice-data entropy encoding: CTU quadtree, intra CUs, transform trees.

Host-side CABAC driver consuming the per-frame decision tensors produced
by the TPU pipeline:

  depth8   [H/8, W/8]   CU depth (0..3) at 8x8 granularity (padded frame)
  modes8   [H/8, W/8]   luma intra mode (0..34) at 8x8 granularity
  coef_y   [H, W]       quantized luma coefficients, TUs in place
  coef_cb  [H/2, W/2]   quantized Cb coefficients
  coef_cr  [H/2, W/2]   quantized Cr coefficients

Behavioral counterparts: HM TEncSbac codeSplitFlag/codeIntraDirLumaAng/
codeIntraDirChroma/codeQtCbf + TEncCu::encodeCtu; re-derived from
H.265 7.3.8 here.
"""

from __future__ import annotations

import numpy as np

from . import residual, scan as scanlib
from .cabac import CabacEncoder
from .contexts import ContextModels

PLANAR, DC, HOR, VER = 0, 1, 10, 26


def mpm_list(cand_a: int, cand_b: int):
    """3-entry most-probable-mode list (H.265 8.4.2)."""
    if cand_a == cand_b:
        if cand_a < 2:
            return [PLANAR, DC, VER]
        return [cand_a,
                2 + ((cand_a + 29) % 32),
                2 + ((cand_a - 2 + 1) % 32)]
    mpm = [cand_a, cand_b]
    if PLANAR not in mpm:
        mpm.append(PLANAR)
    elif DC not in mpm:
        mpm.append(DC)
    else:
        mpm.append(VER)
    return mpm


class SliceEncoder:
    def __init__(self, cfg, frame_qp: int):
        self.cfg = cfg
        self.qp = frame_qp

    def encode(self, bw, depth8, modes8, coef_y, coef_cb, coef_cr,
               sao=None, modes4=None, nxn8=None):
        """Encode all CTUs of the frame into BitWriter bw (slice data).
        sao: optional ops/sao.SaoParams (coded per CTU, 7.3.8.3).
        modes4/nxn8: intra NxN decisions (per-4x4 modes + per-8x8 part
        flags); None = all CUs 2Nx2N."""
        self.depth8 = np.asarray(depth8)
        self.modes8 = np.asarray(modes8)
        self.modes4 = (np.asarray(modes4) if modes4 is not None
                       else np.repeat(np.repeat(self.modes8, 2, 0), 2, 1))
        self.nxn8 = (np.asarray(nxn8) if nxn8 is not None
                     else np.zeros_like(self.modes8, bool))
        self.coef_y = np.asarray(coef_y)
        self.coef_cb = np.asarray(coef_cb)
        self.coef_cr = np.asarray(coef_cr)
        self.W = self.cfg.pad_width
        self.H = self.cfg.pad_height

        ctx = ContextModels(init_type=0, qp=self.qp)
        enc = CabacEncoder(bw)
        self.ctx = ctx
        self.enc = enc

        # cu_qp_delta presence: when the PPS enables per-CTB QP (LCU
        # rate control on the P frames), the syntax element exists in I
        # slices too — coded as delta 0 at each CTB's first coded TU
        # (the intra pictures stay at the slice QP).
        self._dqp_pending = False

        n_ctu_x, n_ctu_y = self.cfg.ctus_x, self.cfg.ctus_y
        n_ctu = n_ctu_x * n_ctu_y
        for ci in range(n_ctu):
            cy, cx = divmod(ci, n_ctu_x)
            if sao is not None:
                from . import sao_syntax
                sao_syntax.code_sao_ctu(enc, ctx, sao, ci, cx, cy, n_ctu_x)
            self._dqp_pending = bool(getattr(self.cfg, "cu_qp_delta",
                                             False))
            self._coding_quadtree(cx * 64, cy * 64, 64, 0)
            last = ci == n_ctu - 1
            enc.encode_terminate(1 if last else 0)

    # ------------------------------------------------------------------
    def _cu_depth_at(self, x, y):
        return int(self.depth8[y >> 3, x >> 3])

    def _mode_at(self, x, y):
        return int(self.modes8[y >> 3, x >> 3])

    def _coding_quadtree(self, x0, y0, size, depth):
        inside = (x0 + size <= self.W) and (y0 + size <= self.H)
        cur_depth = self._cu_depth_at(x0, y0)
        split = cur_depth > depth
        if inside and size > 8:
            # split_cu_flag ctx: neighbours deeper than current depth
            ctx_inc = 0
            if x0 > 0:
                ctx_inc += int(self._cu_depth_at(x0 - 1, y0) > depth)
            if y0 > 0:
                ctx_inc += int(self._cu_depth_at(x0, y0 - 1) > depth)
            self.enc.encode_bin(self.ctx, self.ctx.idx("split_cu", ctx_inc),
                                int(split))
        # outside picture or size 8: split inferred (boundary: 1, size 8: 0)
        if (inside and split) or (not inside and size > 8):
            h = size >> 1
            for (dx, dy) in ((0, 0), (h, 0), (0, h), (h, h)):
                x1, y1 = x0 + dx, y0 + dy
                if x1 < self.W and y1 < self.H:
                    self._coding_quadtree(x1, y1, h, depth + 1)
        else:
            self._coding_unit(x0, y0, size)

    def _mode4_at(self, x, y):
        return int(self.modes4[y >> 2, x >> 2])

    def _mpm_for4(self, x, y):
        """MPM candidates with 4x4-granularity neighbour modes (needed
        for NxN PUs; identical to the 8x8 rule for 2Nx2N CUs)."""
        cand_a = DC if x == 0 else self._mode4_at(x - 1, y)
        cand_b = DC
        if y > 0 and (y - 1) >> 6 == y >> 6:  # above inside same CTU row
            cand_b = self._mode4_at(x, y - 1)
        return mpm_list(cand_a, cand_b)

    def _code_luma_mode(self, mode, mpm):
        if mode in mpm:
            self.enc.encode_bin(self.ctx,
                                self.ctx.idx("prev_intra_luma_pred"), 1)
            idx = mpm.index(mode)
            self.enc.encode_bypass(0 if idx == 0 else 1)
            if idx:
                self.enc.encode_bypass(idx - 1)
        else:
            self.enc.encode_bin(self.ctx,
                                self.ctx.idx("prev_intra_luma_pred"), 0)
            rem = mode
            for m in sorted(mpm, reverse=True):
                if mode > m:
                    rem -= 1
            self.enc.encode_bypass_bins(rem, 5)

    def _coding_unit(self, x0, y0, size):
        # I slice: pred mode inferred intra; part_mode only at min CU size.
        nxn = size == 8 and bool(self.nxn8[y0 >> 3, x0 >> 3])
        if size == 8:
            # part_mode: bin 1 = 2Nx2N, 0 = NxN (9.3.3.7, intra case)
            self.enc.encode_bin(self.ctx, self.ctx.idx("part_mode", 0),
                                0 if nxn else 1)

        if nxn:
            # 7.3.8.5: the four prev_intra_luma_pred_flags first, then the
            # four mpm_idx / rem_intra payloads. MPM derivation uses
            # already-reconstructed (z-order earlier) 4x4 neighbours, so
            # flags can be derived before any payload is written.
            pus = ((x0, y0), (x0 + 4, y0), (x0, y0 + 4), (x0 + 4, y0 + 4))
            modes = [self._mode4_at(x, y) for (x, y) in pus]
            mpms = [self._mpm_for4(x, y) for (x, y) in pus]
            for m, mpm in zip(modes, mpms):
                self.enc.encode_bin(
                    self.ctx, self.ctx.idx("prev_intra_luma_pred"),
                    1 if m in mpm else 0)
            for m, mpm in zip(modes, mpms):
                if m in mpm:
                    idx = mpm.index(m)
                    self.enc.encode_bypass(0 if idx == 0 else 1)
                    if idx:
                        self.enc.encode_bypass(idx - 1)
                else:
                    rem = m
                    for c in sorted(mpm, reverse=True):
                        if m > c:
                            rem -= 1
                    self.enc.encode_bypass_bins(rem, 5)
            # intra_chroma_pred_mode: DM (derived from PU0) -> single 0 bin
            self.enc.encode_bin(self.ctx,
                                self.ctx.idx("chroma_pred_mode"), 0)
            self._transform_tree_nxn(x0, y0, modes)
            return

        mode = self._mode_at(x0, y0)
        mpm = self._mpm_for4(x0, y0)
        self._code_luma_mode(mode, mpm)

        # intra_chroma_pred_mode: DM (derived) -> single 0 bin
        self.enc.encode_bin(self.ctx, self.ctx.idx("chroma_pred_mode"), 0)

        self._transform_tree(x0, y0, size, 0, mode)

    # ------------------------------------------------------------------
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

    def _transform_tree(self, x0, y0, size, trafo_depth, luma_mode):
        # Our toolset: TU = CU (split only implicit at 64).
        split = size > 32
        log2 = size.bit_length() - 1

        cbf_cb = self._tu_cbf(1, x0, y0, size)
        cbf_cr = self._tu_cbf(2, x0, y0, size)
        if log2 > 2:
            # chroma cbfs coded at this level (parent cbf always "present"
            # here because we only reach depth>0 under a 64 root)
            self.enc.encode_bin(
                self.ctx, self.ctx.idx("qt_cbf_chroma", trafo_depth), cbf_cb)
            self.enc.encode_bin(
                self.ctx, self.ctx.idx("qt_cbf_chroma", trafo_depth), cbf_cr)

        if split:
            h = size >> 1
            for (dx, dy) in ((0, 0), (h, 0), (0, h), (h, h)):
                self._transform_tree_child(x0 + dx, y0 + dy, h,
                                           trafo_depth + 1, luma_mode,
                                           cbf_cb, cbf_cr)
            return

        cbf_luma = self._tu_cbf(0, x0, y0, size)
        self.enc.encode_bin(
            self.ctx,
            self.ctx.idx("qt_cbf_luma", 1 if trafo_depth == 0 else 0),
            cbf_luma)
        self._transform_unit(x0, y0, size, cbf_luma, cbf_cb, cbf_cr,
                             luma_mode)

    def _transform_tree_child(self, x0, y0, size, trafo_depth, luma_mode,
                              parent_cbf_cb, parent_cbf_cr):
        cbf_cb = self._tu_cbf(1, x0, y0, size) if parent_cbf_cb else 0
        cbf_cr = self._tu_cbf(2, x0, y0, size) if parent_cbf_cr else 0
        if parent_cbf_cb:
            self.enc.encode_bin(
                self.ctx, self.ctx.idx("qt_cbf_chroma", trafo_depth), cbf_cb)
        if parent_cbf_cr:
            self.enc.encode_bin(
                self.ctx, self.ctx.idx("qt_cbf_chroma", trafo_depth), cbf_cr)

        cbf_luma = self._tu_cbf(0, x0, y0, size)
        self.enc.encode_bin(
            self.ctx,
            self.ctx.idx("qt_cbf_luma", 0),
            cbf_luma)
        self._transform_unit(x0, y0, size, cbf_luma, cbf_cb, cbf_cr,
                             luma_mode)

    def _transform_tree_nxn(self, x0, y0, pu_modes):
        """8x8 intra-NxN transform tree: split inferred (IntraSplitFlag),
        chroma cbfs at the parent, four 4x4 luma TUs (per-PU scan), the
        4x4 chroma residuals after the last child (7.3.8.10 blkIdx==3)."""
        cbf_cb = self._tu_cbf(1, x0, y0, 8)
        cbf_cr = self._tu_cbf(2, x0, y0, 8)
        self.enc.encode_bin(
            self.ctx, self.ctx.idx("qt_cbf_chroma", 0), cbf_cb)
        self.enc.encode_bin(
            self.ctx, self.ctx.idx("qt_cbf_chroma", 0), cbf_cr)
        for i, (dx, dy) in enumerate(((0, 0), (4, 0), (0, 4), (4, 4))):
            x1, y1 = x0 + dx, y0 + dy
            cl = self._tu_cbf(0, x1, y1, 4)
            self.enc.encode_bin(
                self.ctx, self.ctx.idx("qt_cbf_luma", 0), cl)
            if self._dqp_pending and (cl or (i == 3
                                            and (cbf_cb or cbf_cr))):
                self._dqp_pending = False
                self.enc.encode_bin(self.ctx, self.ctx.idx("dqp", 0), 0)
            if cl:
                blk = self.coef_y[y1:y1 + 4, x1:x1 + 4]
                st = scanlib.scan_type_for(pu_modes[i], 4, True)
                residual.code_residual(self.enc, self.ctx, blk,
                                       is_luma=True, scan_type=st)
            if i == 3:
                st = scanlib.scan_type_for(pu_modes[0], 4, False)
                if cbf_cb:
                    blk = self.coef_cb[y0 >> 1:(y0 >> 1) + 4,
                                       x0 >> 1:(x0 >> 1) + 4]
                    residual.code_residual(self.enc, self.ctx, blk,
                                           is_luma=False, scan_type=st)
                if cbf_cr:
                    blk = self.coef_cr[y0 >> 1:(y0 >> 1) + 4,
                                       x0 >> 1:(x0 >> 1) + 4]
                    residual.code_residual(self.enc, self.ctx, blk,
                                           is_luma=False, scan_type=st)

    def _transform_unit(self, x0, y0, size, cbf_luma, cbf_cb, cbf_cr,
                        luma_mode):
        if not (cbf_luma or cbf_cb or cbf_cr):
            return
        if self._dqp_pending:
            # cu_qp_delta_abs = 0: single bin on ctx dqp[0] (7.3.8.12)
            self._dqp_pending = False
            self.enc.encode_bin(self.ctx, self.ctx.idx("dqp", 0), 0)
        if cbf_luma:
            blk = self.coef_y[y0:y0 + size, x0:x0 + size]
            st = scanlib.scan_type_for(luma_mode, size, True)
            residual.code_residual(self.enc, self.ctx, blk, is_luma=True,
                                   scan_type=st)
        half = size >> 1
        if cbf_cb:
            blk = self.coef_cb[y0 >> 1:(y0 >> 1) + half,
                               x0 >> 1:(x0 >> 1) + half]
            st = scanlib.scan_type_for(luma_mode, half, False)
            residual.code_residual(self.enc, self.ctx, blk, is_luma=False,
                                   scan_type=st)
        if cbf_cr:
            blk = self.coef_cr[y0 >> 1:(y0 >> 1) + half,
                               x0 >> 1:(x0 >> 1) + half]
            st = scanlib.scan_type_for(luma_mode, half, False)
            residual.code_residual(self.enc, self.ctx, blk, is_luma=False,
                                   scan_type=st)
