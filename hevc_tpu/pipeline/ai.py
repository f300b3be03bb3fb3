"""All-Intra encoder pipeline: ETH-CNN HCPM -> TPU search -> coding -> CABAC.

Replaces the reference's file-based handoff (video_to_cu_depth.py ->
cu_depth.dat -> TEncCu HCPM gating) with on-device tensors: the predictor
and the partition search run jitted per frame; the normative
reconstruction runs on the TPU wavefront engine (pipeline/recon.py,
bit-exact vs pipeline/golden.py); CABAC packs on host.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.yuv import Frame, crop_frame, pad_frame
from ..entropy import headers
from ..entropy.slice_enc import SliceEncoder
from ..models import eth_cnn, hcpm
from . import golden, recon, search


class AIEncoder:
    def __init__(self, cfg: headers.EncoderConfig,
                 cnn_params=None,
                 thresholds: Optional[hcpm.Thresholds] = None,
                 recon_backend: str = "tpu",
                 max_depth_exit: bool = False):
        if recon_backend == "tu" and cfg.nxn:
            # the TU-wavefront backend codes TU == CU (no NxN support)
            import dataclasses
            cfg = dataclasses.replace(cfg, nxn=False)
        self.cfg = cfg
        self.cnn_params = cnn_params
        self.thr = thresholds or hcpm.DEFAULT_AI
        self.recon_backend = recon_backend
        # Frame-level early exit: when the HCPM gates close every split
        # at some level frame-wide, dispatch a narrower compiled search
        # that never evaluates the deeper CU levels — the TPU analogue
        # of the reference's per-CU RD-check skipping (TEncCu.cpp:
        # 862-873), realized as host program selection instead of
        # data-dependent branching inside jit.
        self.max_depth_exit = max_depth_exit and cnn_params is not None
        self.golden = golden.GoldenEncoder(cfg)
        self._search_cache = {}
        self._origins = jnp.asarray(
            search.ctu_grid(cfg.pad_width, cfg.pad_height))

    def _search_fn(self, qp: int, gated: bool, chroma: bool,
                   max_depth: int = 3):
        key = (qp, gated, chroma, max_depth)
        if key not in self._search_cache:
            cfg = self.cfg
            kw = dict(pad_w=cfg.pad_width, pad_h=cfg.pad_height,
                      n_ctu_x=cfg.ctus_x, qp=qp, nxn=cfg.nxn,
                      max_depth=max_depth)
            if gated:
                kw.update(thr_up=self.thr.up, thr_down=self.thr.down)
            if gated and chroma:
                fn = jax.jit(lambda y, orig, probs, cb, cr:
                             search.search_frame(y, orig, hcpm_probs=probs,
                                                 cb_plane=cb, cr_plane=cr,
                                                 **kw))
            elif gated:
                fn = jax.jit(lambda y, orig, probs: search.search_frame(
                    y, orig, hcpm_probs=probs, **kw))
            elif chroma:
                fn = jax.jit(lambda y, orig, cb, cr: search.search_frame(
                    y, orig, hcpm_probs=None, cb_plane=cb, cr_plane=cr,
                    **kw))
            else:
                fn = jax.jit(lambda y, orig: search.search_frame(
                    y, orig, hcpm_probs=None, **kw))
            self._search_cache[key] = fn
        return self._search_cache[key]

    def predict_hcpm(self, y_pad: np.ndarray, qp=None):
        """ETH-CNN inference over the frame's CTUs -> [B, 21] probs."""
        from ..core.yuv import extract_ctus
        ctus = extract_ctus(y_pad)
        qpv = jnp.full((ctus.shape[0],),
                       float(self.cfg.qp if qp is None else qp),
                       jnp.float32)
        return eth_cnn.apply_jit(self.cnn_params, jnp.asarray(ctus), qpv,
                                 self.thr.l1_lower, self.thr.l2_lower)

    def decide_frame(self, y_pad: np.ndarray, qp=None, cb_pad=None,
                     cr_pad=None):
        """Run (CNN +) search; returns frame-level depth8/modes8 maps.
        cb_pad/cr_pad: optional chroma planes — tree decisions then
        include the chroma RD contribution."""
        d8, m8, _, _ = self.decide_frame_full(y_pad, qp, cb_pad, cr_pad)
        return d8, m8

    def decide_frame_full(self, y_pad: np.ndarray, qp=None, cb_pad=None,
                          cr_pad=None):
        """decide_frame + the NxN decisions: returns (depth8, modes8,
        modes4, nxn8) frame-level maps."""
        y = jnp.asarray(y_pad)
        qp = self.cfg.qp if qp is None else qp
        chroma = cb_pad is not None
        extra = ((jnp.asarray(cb_pad), jnp.asarray(cr_pad)) if chroma
                 else ())
        if self.cnn_params is not None:
            probs = self.predict_hcpm(y_pad, qp)
            md = 3
            if self.max_depth_exit:
                md = self._gate_max_depth(probs)
            res = self._search_fn(qp, True, chroma, md)(y, self._origins,
                                                        probs, *extra)
        else:
            res = self._search_fn(qp, False, chroma)(y, self._origins,
                                                     *extra)
        return self._assemble(res)

    def _gate_max_depth(self, probs) -> int:
        """Deepest CU level any gate leaves open this frame (host-side
        scalar -> compiled-program selection), floored at the
        forced-split depth of the padded frame."""
        cs = np.asarray(hcpm.split_gates(probs, self.thr)[1])
        if cs[:, 5:21].any():
            md = 3
        elif cs[:, 1:5].any():
            md = 2
        elif cs[:, 0].any():
            md = 1
        else:
            md = 0
        return max(md, search.forced_depth_floor(self.cfg.pad_width,
                                                 self.cfg.pad_height))

    def _assemble(self, res: search.SearchResult):
        cfg = self.cfg
        nx, ny = cfg.ctus_x, cfg.ctus_y

        def grid(t, u):
            a = np.asarray(t).reshape(ny, nx, u, u)
            a = a.transpose(0, 2, 1, 3).reshape(ny * u, nx * u)
            return a[:cfg.pad_height * u // 64, :cfg.pad_width * u // 64]

        d = grid(res.depth8, 8).astype(np.int32)
        m = grid(res.modes8, 8).astype(np.int32)
        m4 = grid(res.modes4, 16).astype(np.int32)
        nxn = grid(res.nxn8, 8).astype(bool)
        return d, m, m4, nxn

    def encode(self, frames, with_hash_sei: bool = True,
               rate_control=None):
        """Encode a sequence; returns (annexb bytes, recons, stats).
        rate_control: optional pipeline/ratectrl.RateController — picks
        a per-picture QP and is updated with actual bits."""
        cfg = self.cfg
        chunks = [headers.write_vps(cfg), headers.write_sps(cfg),
                  headers.write_pps(cfg)]
        recons = []
        stats = {"decide_s": 0.0, "recon_s": 0.0, "entropy_s": 0.0}
        self.frame_qps = []  # actual per-picture QPs (for the CLI log)
        for frame in frames:
            pf = pad_frame(frame, cfg.pad_width, cfg.pad_height)
            qp = rate_control.pre_frame() if rate_control else cfg.qp
            self.frame_qps.append(qp)
            t0 = time.perf_counter()
            depth8, modes8, modes4, nxn8 = self.decide_frame_full(
                pf.y, qp, pf.cb, pf.cr)
            t1 = time.perf_counter()
            decisions, rec = self.reconstruct(pf, depth8, modes8, qp,
                                              modes4=modes4, nxn8=nxn8)
            t2 = time.perf_counter()
            chunks.append(self._entropy_encode(decisions, qp))
            if rate_control:
                rate_control.post_frame(8 * len(chunks[-1]))
            if with_hash_sei:
                tid, hs = golden.pic_hashes(rec, cfg.hash_type)
                chunks.append(headers.write_hash_sei(*hs, hash_type=tid))
            t3 = time.perf_counter()
            stats["decide_s"] += t1 - t0
            stats["recon_s"] += t2 - t1
            stats["entropy_s"] += t3 - t2
            # returned recon = decoder-output view (conformance-cropped);
            # the hash SEI above covers the full padded picture, like HM
            recons.append(crop_frame(rec, cfg.width, cfg.height))
        return b"".join(chunks), recons, stats

    def _entropy_encode(self, decisions, qp=None) -> bytes:
        return entropy_encode_slice(self.cfg, decisions, qp=qp)

    def reconstruct(self, pf, depth8, modes8, qp=None, modes4=None,
                    nxn8=None):
        """Normative reconstruction + coefficients (TPU wavefront by
        default; 'golden' NumPy backend as oracle/fallback).
        modes4/nxn8: NxN decisions; None = all CUs 2Nx2N."""
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        if modes4 is None:
            modes4 = np.repeat(np.repeat(modes8, 2, 0), 2, 1)
        if nxn8 is None:
            nxn8 = np.zeros_like(np.asarray(depth8), bool)
        if self.recon_backend == "golden":
            return self.golden.encode_frame(pf, depth8, modes8,
                                            modes4=modes4, nxn8=nxn8)
        if self.recon_backend == "tu":
            from . import recon_tu
            planes = recon_tu.reconstruct_tu(
                pf.y, pf.cb, pf.cr, depth8, modes8,
                qp=qp, pad_w=cfg.pad_width, pad_h=cfg.pad_height)
        else:
            planes = recon.encode_frame_planes_jit(
                pf.y, pf.cb, pf.cr, depth8, modes4, nxn8,
                qp=qp, pad_w=cfg.pad_width, pad_h=cfg.pad_height,
                rdoq=cfg.rdoq)
        decisions = dict(depth8=depth8, modes8=modes8, modes4=modes4,
                         nxn8=nxn8,
                         coef_y=np.asarray(planes.coef_y),
                         coef_cb=np.asarray(planes.coef_cb),
                         coef_cr=np.asarray(planes.coef_cr))
        y, cb, cr = planes.recon_y, planes.recon_cb, planes.recon_cr
        if cfg.deblock:
            from ..ops import deblock as dbk
            y, cb, cr = dbk.deblock_frame(y, cb, cr, depth8, qp)
        if cfg.sao:
            from ..ops import sao as sao_lib
            params = sao_lib.estimate_frame(pf.y, pf.cb, pf.cr, y, cb, cr,
                                            qp)
            y, cb, cr = sao_lib.apply_frame(y, cb, cr, params)
            decisions["sao"] = params
        rec = Frame(np.asarray(y).astype(np.uint8),
                    np.asarray(cb).astype(np.uint8),
                    np.asarray(cr).astype(np.uint8))
        return decisions, rec


def entropy_encode_slice(cfg, decisions, qp=None) -> bytes:
    """Slice NAL: header (Python) + CABAC slice data (native C++ with
    Python fallback, byte-identical - tests/test_native_entropy.py)."""
    qp = cfg.qp if qp is None else qp
    bw = headers.start_idr_slice(cfg, qp)
    sao = decisions.get("sao")
    modes4 = decisions.get("modes4")
    nxn8 = decisions.get("nxn8")
    try:
        if getattr(cfg, "cu_qp_delta", False):
            # native coder has no cu_qp_delta syntax yet -> Python CABAC
            raise NotImplementedError("cu_qp_delta: python path")
        from .. import native
        data = native.encode_slice_data(
            decisions["depth8"], decisions["modes8"],
            decisions["coef_y"], decisions["coef_cb"],
            decisions["coef_cr"], cfg.pad_width, cfg.pad_height,
            qp, modes4=modes4, nxn8=nxn8, sao=sao)
        rbsp = bw.get_bytes() + data
        from ..entropy.bitstream import nal_unit, NAL_IDR_W_RADL
        return nal_unit(NAL_IDR_W_RADL, rbsp)
    except Exception:
        import logging
        logging.getLogger(__name__).warning(
            "native entropy failed; falling back to Python CABAC",
            exc_info=True)
    se = SliceEncoder(cfg, qp)
    se.encode(bw, decisions["depth8"], decisions["modes8"],
              decisions["coef_y"], decisions["coef_cb"],
              decisions["coef_cr"], sao=sao, modes4=modes4, nxn8=nxn8)
    return headers.finish_slice_nal(bw)
