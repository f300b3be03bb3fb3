"""Low-Delay-P pipeline: pre-encode (residue) + ETH-CNN+LSTM prediction.

Reference flow (SURVEY.md 3.2): per P frame, a fast pre-encode with all
CUs/PUs forced to 64x64 produces an inter residue frame; the residue
feeds the ETH-CNN whose per-level FC1 vectors drive three ETH-LSTMs that
emit the HCPM for the real encode. The reference round-trips residue and
LSTM state through files (resi.yuv/state.dat, TEncGOP.cpp:1420-1524);
here both stay resident on device.

The pre-encode here is TPU-native: batched full integer-pel SAD search
(+-8) followed by a batched 49-candidate quarter-pel sweep per CTU using
the normative MC filters, referencing the previous reconstructed (or
original) frame; residue is clipped to uint8 around 128 exactly like the
reference dump (HM-16.5_Resi_Pre/TEncSearch.cpp:4550-4556).

The full P-slice RDO/entropy encoder (merge/AMVP, MVD coding, inter
recon) is the next build stage; this module already provides the
residue + HCPM chain that the reference's training and per-frame
prediction pipelines require.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.yuv import Frame
from ..models import eth_lstm, hcpm
from ..ops import inter
from ..pipeline import search as search_lib


def _quarter_refine(cur_tiles, ref_plane, origins, mv_int):
    """Quarter-pel sweep: mv_q = 4*mv_int + (dx, dy), dx/dy in [-3, 3]."""
    return inter.quarter_refine_blocks(cur_tiles, ref_plane, origins,
                                       mv_int, 64)


def pre_encode(cur: np.ndarray, ref: np.ndarray, cur_cb, ref_cb, cur_cr,
               ref_cr, *, pad_w: int, pad_h: int):
    """Forced-64x64 inter pre-encode of one frame (jittable core).

    Returns (resi_y, resi_cb, resi_cr [u8-range, +128 centered], mv_q).
    """
    origins = jnp.asarray(search_lib.ctu_grid(pad_w, pad_h))
    B = origins.shape[0]
    h, w = cur.shape
    ys = jnp.clip(origins[:, 1:2, None] + jnp.arange(64)[None, :, None],
                  0, h - 1)
    xs = jnp.clip(origins[:, 0:1, None] + jnp.arange(64)[None, None, :],
                  0, w - 1)
    cur_tiles = jnp.take(jnp.asarray(cur).reshape(-1), ys * w + xs, axis=0)

    mv_int, _ = inter.integer_search_ctu(cur_tiles, jnp.asarray(ref),
                                         origins, radius=8)
    mv_q, _ = _quarter_refine(cur_tiles, jnp.asarray(ref), origins, mv_int)

    pred_y = inter.predict_inter_ctu(jnp.asarray(ref), origins, mv_q,
                                     is_luma=True)
    resi_y_t = jnp.clip(cur_tiles.astype(jnp.int32) - pred_y + 128, 0, 255)

    corg = origins // 2
    hc, wc = cur_cb.shape
    ysc = jnp.clip(corg[:, 1:2, None] + jnp.arange(32)[None, :, None],
                   0, hc - 1)
    xsc = jnp.clip(corg[:, 0:1, None] + jnp.arange(32)[None, None, :],
                   0, wc - 1)

    def chroma_resi(cur_c, ref_c):
        tiles = jnp.take(jnp.asarray(cur_c).reshape(-1), ysc * wc + xsc,
                         axis=0)
        pred = inter.predict_inter_ctu(jnp.asarray(ref_c), corg, mv_q,
                                       is_luma=False)
        return jnp.clip(tiles.astype(jnp.int32) - pred + 128, 0, 255)

    resi_cb_t = chroma_resi(cur_cb, ref_cb)
    resi_cr_t = chroma_resi(cur_cr, ref_cr)
    return resi_y_t, resi_cb_t, resi_cr_t, mv_q


def tiles_to_plane(tiles, pad_w, pad_h, size):
    """[B, s, s] raster CTU tiles -> [pad_h, pad_w] plane (numpy)."""
    nx = -(-pad_w // size)
    ny = -(-pad_h // size)
    t = np.asarray(tiles).reshape(ny, nx, size, size)
    plane = t.transpose(0, 2, 1, 3).reshape(ny * size, nx * size)
    return plane[:pad_h, :pad_w]


class LDPPredictor:
    """Per-frame LDP HCPM prediction with resident LSTM state.

    Replaces the reference daemon (resi_to_cu_depth_LDP.py) and its
    file/poll protocol: call step(residue_frame, poc) per P frame.
    """

    def __init__(self, cfg, lstm_params,
                 thresholds: Optional[hcpm.Thresholds] = None):
        self.cfg = cfg
        self.params = lstm_params
        self.thr = thresholds or hcpm.DEFAULT_LDP
        n_ctu = cfg.ctus_x * cfg.ctus_y
        self.state = eth_lstm.zero_state(n_ctu)

    def reset(self):
        self.state = eth_lstm.zero_state(self.state.shape[0])

    def step(self, resi_tiles, poc: int):
        """resi_tiles: [B, 64, 64] residue (128-centered). Returns
        [B, 21] HCPM probs; LSTM state advances in place."""
        B = resi_tiles.shape[0]
        qp = jnp.full((B,), float(self.cfg.qp), jnp.float32)
        fig = jnp.full((B,), poc % eth_lstm.GOP_LENGTH, jnp.int32)
        probs, self.state = eth_lstm.step_jit(
            self.params, jnp.asarray(resi_tiles), qp, fig, self.state,
            self.thr.l1_lower, self.thr.l2_lower)
        return probs


class LDPPipeline:
    """Pre-encode + predict chain over a sequence (the reference's
    two-process per-frame lockstep, single-program on device)."""

    def __init__(self, cfg, lstm_params=None, thresholds=None,
                 ref_mode: str = "original"):
        self.cfg = cfg
        self.predictor = (LDPPredictor(cfg, lstm_params, thresholds)
                          if lstm_params is not None else None)
        self.ref_mode = ref_mode
        self._pre = jax.jit(functools.partial(
            pre_encode, pad_w=cfg.pad_width, pad_h=cfg.pad_height))

    def run(self, frames):
        """Returns per-frame dicts: residue planes, MVs, HCPM (if model)."""
        cfg = self.cfg
        from ..core.yuv import pad_frame
        out = []
        prev = None
        for poc, frame in enumerate(frames):
            pf = pad_frame(frame, cfg.pad_width, cfg.pad_height)
            rec = {"poc": poc}
            if poc > 0:
                ry, rcb, rcr, mv = self._pre(
                    pf.y.astype(np.int32), prev.y.astype(np.int32),
                    pf.cb.astype(np.int32), prev.cb.astype(np.int32),
                    pf.cr.astype(np.int32), prev.cr.astype(np.int32))
                rec["resi_y"] = tiles_to_plane(ry, cfg.pad_width,
                                               cfg.pad_height, 64)
                rec["resi_cb"] = tiles_to_plane(rcb, cfg.pad_width // 2,
                                                cfg.pad_height // 2, 32)
                rec["resi_cr"] = tiles_to_plane(rcr, cfg.pad_width // 2,
                                                cfg.pad_height // 2, 32)
                rec["mv_q"] = np.asarray(mv)
                if self.predictor is not None:
                    rec["hcpm"] = np.asarray(self.predictor.step(ry, poc))
            out.append(rec)
            prev = pf
        return out
