"""SAO — sample adaptive offset (H.265 8.7.3), TPU-vectorized.

Behavioral counterpart: HM TComSampleAdaptiveOffset.cpp (normative
apply, SAOProcess :614) + TEncSampleAdaptiveOffset.cpp (statistics and
parameter decision, 1284 LoC) — re-designed as whole-plane tensor ops:

- statistics: per-CTU edge-offset category counts/sums for all 4 EO
  classes and 32-band histograms in one batched pass over the deblocked
  picture (the encoder-side stats HM gathers per-CTU sequentially);
- decision: tiny per-CTU arrays -> host numpy picks per-CTU
  (type, class/band, offsets) minimizing D + lambda*R with HM's fast
  delta-distortion form  dD = sum_cat(count*off^2 - 2*off*sum);
- apply: normative per-pixel offsets as a masked whole-plane op (every
  EO class is computed batched, per-pixel selection by the CTU's
  decided class).

SAO reads the *deblocked* picture and produces the final reference/
output picture.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# EO class -> (neighbor 0, neighbor 1) offsets (dy, dx); 8.7.3 Table 8-16
EO_NEIGH = ((0, -1, 0, 1), (-1, 0, 1, 0), (-1, -1, 1, 1), (-1, 1, 1, -1))

SAO_NONE, SAO_BAND, SAO_EDGE = 0, 1, 2
MAX_ABS = 7   # (1 << (min(bitDepth,10) - 5)) - 1 for 8-bit


class SaoParams(NamedTuple):
    """Per-CTU decided parameters, one set per component (numpy)."""
    type_idx: np.ndarray   # [3, B] int32 (0 none / 1 band / 2 edge)
    eo_class: np.ndarray   # [3, B] int32 0..3 (valid when edge)
    band_pos: np.ndarray   # [3, B] int32 0..31 (valid when band)
    offsets: np.ndarray    # [3, B, 4] int32 signed


def _shift(plane, dy, dx):
    """Shifted copy with edge replication; validity handled separately."""
    return jnp.roll(plane, (-dy, -dx), axis=(0, 1))


def _eo_cat(plane, cls: int):
    """Per-pixel EO category (0 = none, 1..4) + validity mask."""
    dy0, dx0, dy1, dx1 = EO_NEIGH[cls]
    H, W = plane.shape
    n0 = _shift(plane, dy0, dx0)
    n1 = _shift(plane, dy1, dx1)
    s0 = jnp.sign(plane - n0)
    s1 = jnp.sign(plane - n1)
    edge = (2 + s0 + s1).astype(jnp.int32)
    # edgeIdx 0->cat1, 1->cat2, 2->none(0), 3->cat3, 4->cat4
    cat = jnp.asarray([1, 2, 0, 3, 4], jnp.int32)[edge]
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    valid = ((ys + dy0 >= 0) & (ys + dy0 < H) & (xs + dx0 >= 0)
             & (xs + dx0 < W) & (ys + dy1 >= 0) & (ys + dy1 < H)
             & (xs + dx1 >= 0) & (xs + dx1 < W))
    return cat, valid


def _ctu_sum(vals, ctu: int):
    """[H, W] -> [B] per-CTU sums (pads to CTU multiples with zeros)."""
    H, W = vals.shape
    ph = -(-H // ctu) * ctu
    pw = -(-W // ctu) * ctu
    v = jnp.pad(vals, ((0, ph - H), (0, pw - W)))
    v = v.reshape(ph // ctu, ctu, pw // ctu, ctu)
    return v.sum((1, 3)).reshape(-1)


def sao_stats(orig, rec, ctu: int):
    """Per-CTU SAO statistics of one component plane.

    orig/rec: [H, W] int32 (rec = deblocked). ctu: CTU span in this
    plane's units (64 luma, 32 chroma 4:2:0).
    Returns (eo_cnt [B,4,4], eo_sum [B,4,4], b_cnt [B,32], b_sum [B,32]).
    """
    orig = jnp.asarray(orig, jnp.int32)
    rec = jnp.asarray(rec, jnp.int32)
    diff = orig - rec
    eo_cnt, eo_sum = [], []
    for cls in range(4):
        cat, valid = _eo_cat(rec, cls)
        cnts, sums = [], []
        for c in (1, 2, 3, 4):
            m = (cat == c) & valid
            cnts.append(_ctu_sum(m.astype(jnp.int32), ctu))
            sums.append(_ctu_sum(jnp.where(m, diff, 0), ctu))
        eo_cnt.append(jnp.stack(cnts, -1))
        eo_sum.append(jnp.stack(sums, -1))
    band = rec >> 3
    b_cnt, b_sum = [], []
    for b in range(32):
        m = band == b
        b_cnt.append(_ctu_sum(m.astype(jnp.int32), ctu))
        b_sum.append(_ctu_sum(jnp.where(m, diff, 0), ctu))
    return (jnp.stack(eo_cnt, 1), jnp.stack(eo_sum, 1),
            jnp.stack(b_cnt, -1), jnp.stack(b_sum, -1))


def _best_offset(cnt, sm, lo, hi, lam):
    """Per-element best integer offset in [lo, hi] minimizing
    cnt*off^2 - 2*off*sum + lam*|off| bits-ish; vectorized numpy."""
    best_off = np.zeros_like(sm, np.int64)
    best_d = np.zeros_like(sm, np.float64)
    for off in range(lo, hi + 1):
        if off == 0:
            continue
        d = cnt * off * off - 2.0 * off * sm + lam * (abs(off) + 1)
        take = d < best_d
        best_off = np.where(take, off, best_off)
        best_d = np.where(take, d, best_d)
    return best_off, best_d


def sao_decide(eo_cnt, eo_sum, b_cnt, b_sum, lam: float):
    """Per-CTU (type, class/band, offsets) for one component (numpy).

    Returns (type_idx [B], eo_class [B], band_pos [B], offsets [B,4],
    cost [B]) where cost is the delta-J vs SAO-off (<= 0).
    """
    eo_cnt = np.asarray(eo_cnt, np.float64)
    eo_sum = np.asarray(eo_sum, np.float64)
    b_cnt = np.asarray(b_cnt, np.float64)
    b_sum = np.asarray(b_sum, np.float64)
    B = eo_cnt.shape[0]

    # EO: cat 1,2 offsets in [0,7]; cat 3,4 in [-7,0]
    off12, d12 = _best_offset(eo_cnt[:, :, :2], eo_sum[:, :, :2], 0,
                              MAX_ABS, lam)
    off34, d34 = _best_offset(eo_cnt[:, :, 2:], eo_sum[:, :, 2:],
                              -MAX_ABS, 0, lam)
    eo_off = np.concatenate([off12, off34], -1)          # [B, 4cls, 4cat]
    eo_d = d12.sum(-1) + d34.sum(-1) + lam * 4.0         # [B, 4cls]
    best_cls = np.argmin(eo_d, axis=1)
    eo_best_d = eo_d[np.arange(B), best_cls]
    eo_best_off = eo_off[np.arange(B), best_cls]

    # BO: best 4-consecutive-band window (wrapped)
    boff, bd = _best_offset(b_cnt, b_sum, -MAX_ABS, MAX_ABS, lam)  # [B,32]
    wins = np.stack([np.take(bd, (np.arange(4) + s) % 32, axis=1).sum(1)
                     for s in range(32)], 1)             # [B, 32]
    best_pos = np.argmin(wins, axis=1)
    bo_best_d = wins[np.arange(B), best_pos] + lam * 7.0
    bo_best_off = np.stack(
        [boff[np.arange(B), (best_pos + k) % 32] for k in range(4)], -1)

    type_idx = np.zeros(B, np.int32)
    cost = np.zeros(B, np.float64)
    use_eo = (eo_best_d < 0) & (eo_best_d <= bo_best_d)
    use_bo = (bo_best_d < 0) & ~use_eo
    type_idx[use_eo] = SAO_EDGE
    type_idx[use_bo] = SAO_BAND
    cost = np.where(use_eo, eo_best_d, np.where(use_bo, bo_best_d, 0.0))

    offsets = np.zeros((B, 4), np.int32)
    offsets[use_eo] = eo_best_off[use_eo].astype(np.int32)
    offsets[use_bo] = bo_best_off[use_bo].astype(np.int32)
    return (type_idx, best_cls.astype(np.int32),
            best_pos.astype(np.int32), offsets, cost)


def sao_apply(rec, type_idx, eo_class, band_pos, offsets, ctu: int):
    """Normative SAO apply for one plane (jittable).

    rec: [H, W] int32 deblocked samples. Per-CTU params as arrays
    indexed by raster CTU id ([B], [B], [B], [B,4]).
    """
    rec = jnp.asarray(rec, jnp.int32)
    H, W = rec.shape
    nx = -(-W // ctu)
    cy = jnp.arange(H)[:, None] // ctu
    cx = jnp.arange(W)[None, :] // ctu
    ci = cy * nx + cx                                    # [H, W] CTU id

    t = jnp.asarray(type_idx, jnp.int32)[ci]             # [H, W]
    cls_map = jnp.asarray(eo_class, jnp.int32)[ci]
    pos_map = jnp.asarray(band_pos, jnp.int32)[ci]
    offs = jnp.asarray(offsets, jnp.int32)[ci]           # [H, W, 4]

    # EO: category map of every class, select by the CTU's class
    cats = []
    for cls in range(4):
        cat, valid = _eo_cat(rec, cls)
        cats.append(jnp.where(valid, cat, 0))
    cat_sel = jnp.take_along_axis(jnp.stack(cats, -1), cls_map[..., None],
                                  axis=-1)[..., 0]       # [H, W] 0..4
    eo_off = jnp.where(
        cat_sel > 0,
        jnp.take_along_axis(offs, jnp.maximum(cat_sel - 1, 0)[..., None],
                            axis=-1)[..., 0],
        0)

    # BO: bandTable[(pos + k) & 31] = k+1
    band = rec >> 3
    k = (band - pos_map) & 31
    bo_off = jnp.where(k < 4,
                       jnp.take_along_axis(offs, jnp.minimum(k, 3)[..., None],
                                           axis=-1)[..., 0],
                       0)

    off = jnp.where(t == SAO_EDGE, eo_off,
                    jnp.where(t == SAO_BAND, bo_off, 0))
    return jnp.clip(rec + off, 0, 255)


def estimate_frame(orig_y, orig_cb, orig_cr, rec_y, rec_cb, rec_cr,
                   qp: int) -> SaoParams:
    """Decide per-CTU SAO parameters for all components.

    Chroma (cb, cr) shares type_idx and eo_class per the syntax
    (7.3.8.3): the joint decision minimizes the summed cb+cr cost.
    """
    lam = float(0.57 * 2.0 ** ((qp - 12) / 3.0))
    sy = sao_stats(orig_y, rec_y, 64)
    scb = sao_stats(orig_cb, rec_cb, 32)
    scr = sao_stats(orig_cr, rec_cr, 32)

    ty, cy_, py, oy, _ = sao_decide(*[np.asarray(s) for s in sy], lam)

    # joint chroma: evaluate both components under each candidate
    lam_c = lam
    tcb, ccb, pcb, ocb, dcb = sao_decide(*[np.asarray(s) for s in scb],
                                         lam_c)
    tcr, ccr, pcr, ocr, dcr = sao_decide(*[np.asarray(s) for s in scr],
                                         lam_c)
    B = ty.shape[0]
    tc = np.zeros(B, np.int32)
    cc = np.zeros(B, np.int32)
    # keep it simple: chroma SAO on only when both best types agree
    agree = (tcb == tcr) & (tcb > 0) & ((tcb != SAO_EDGE) | (ccb == ccr))
    tc[agree] = tcb[agree]
    cc[agree] = ccb[agree]
    ocb2 = np.where(agree[:, None], ocb, 0).astype(np.int32)
    ocr2 = np.where(agree[:, None], ocr, 0).astype(np.int32)

    return SaoParams(
        type_idx=np.stack([ty, tc, tc]),
        eo_class=np.stack([cy_, cc, cc]),
        band_pos=np.stack([py, pcb, pcr]),
        offsets=np.stack([oy, ocb2, ocr2]))


def apply_frame(rec_y, rec_cb, rec_cr, p: SaoParams):
    y = sao_apply(rec_y, p.type_idx[0], p.eo_class[0], p.band_pos[0],
                  p.offsets[0], 64)
    cb = sao_apply(rec_cb, p.type_idx[1], p.eo_class[1], p.band_pos[1],
                   p.offsets[1], 32)
    cr = sao_apply(rec_cr, p.type_idx[2], p.eo_class[2], p.band_pos[2],
                   p.offsets[2], 32)
    return y, cb, cr
