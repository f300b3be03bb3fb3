"""Inter prediction: HEVC interpolation filters + batched motion search.

Normative MC filters (H.265 8.5.4.2): 8-tap luma quarter-pel, 4-tap
chroma eighth-pel, two-stage (horizontal then vertical) with 14-bit
intermediates. Behavioral counterpart: TComInterpolationFilter.cpp.

Motion estimation is TPU-first: full integer search over a +-R window as
one batched SAD reduction over all candidates (replaces HM's sequential
TZ search, TEncSearch.cpp:3663), followed by half/quarter-pel refinement
using the normative filters. Used by the LDP pre-encode (forced 64x64,
inter 2Nx2N — reference HM-16.5_Resi_Pre/TEncCu.cpp:388-397) and later
by the full P-slice encoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Table 8-11: luma quarter-pel filters, frac = 0..3
LUMA_FILTERS = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
], np.int32)

# Table 8-12: chroma eighth-pel filters, frac = 0..7
CHROMA_FILTERS = np.array([
    [0, 64, 0, 0],
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2],
], np.int32)


def _filter_h(x, coefs, taps):
    """Horizontal FIR over the last axis; x already includes the (taps-1)
    border columns. Output width = x.shape[-1] - taps + 1."""
    w = x.shape[-1] - taps + 1
    acc = jnp.zeros(x.shape[:-1] + (w,), jnp.int32)
    for t in range(taps):
        acc = acc + coefs[t] * x[..., t:t + w]
    return acc


def _filter_v(x, coefs, taps):
    h = x.shape[-2] - taps + 1
    acc = jnp.zeros(x.shape[:-2] + (h, x.shape[-1]), jnp.int32)
    for t in range(taps):
        acc = acc + coefs[t] * x[..., t:t + h, :]
    return acc


def mc_luma(ref_ext, frac_x: int, frac_y: int, out_h: int, out_w: int,
            bit_depth: int = 8):
    """Quarter-pel MC of one window.

    ref_ext: [..., out_h + 7, out_w + 7] integer samples, positioned such
    that the top-left full-pel tap is at [3, 3] (i.e. the window includes
    the 3-left/3-top and 4-right/4-bottom filter border).
    frac_x/frac_y: static 0..3. Returns [..., out_h, out_w] samples.
    """
    fx = LUMA_FILTERS[frac_x]
    fy = LUMA_FILTERS[frac_y]
    x = ref_ext.astype(jnp.int32)
    shift1 = bit_depth - 8               # 0 for 8-bit
    if frac_x == 0:
        tmp = x[..., :, 3:3 + out_w] << (6 - shift1)
    else:
        tmp = _filter_h(x, fx, 8) >> shift1
    if frac_y == 0:
        val = tmp[..., 3:3 + out_h, :] << 6
    else:
        val = _filter_v(tmp, fy, 8)
    # uni-prediction rounding: total downshift 12 - (bit_depth - 8) ... the
    # two-stage shifts above kept 6+6 fractional bits.
    shift = 12 - shift1
    val = (val + (1 << (shift - 1))) >> shift
    return jnp.clip(val, 0, (1 << bit_depth) - 1)


def mc_chroma(ref_ext, frac_x: int, frac_y: int, out_h: int, out_w: int,
              bit_depth: int = 8):
    """Eighth-pel chroma MC. ref_ext: [..., out_h+3, out_w+3], top-left
    full-pel tap at [1, 1]."""
    fx = CHROMA_FILTERS[frac_x]
    fy = CHROMA_FILTERS[frac_y]
    x = ref_ext.astype(jnp.int32)
    shift1 = bit_depth - 8
    if frac_x == 0:
        tmp = x[..., :, 1:1 + out_w] << (6 - shift1)
    else:
        tmp = _filter_h(x, fx, 4) >> shift1
    if frac_y == 0:
        val = tmp[..., 1:1 + out_h, :] << 6
    else:
        val = _filter_v(tmp, fy, 4)
    shift = 12 - shift1
    val = (val + (1 << (shift - 1))) >> shift
    return jnp.clip(val, 0, (1 << bit_depth) - 1)


# ---------------------------------------------------------------------------
# Batched CTU motion search
# ---------------------------------------------------------------------------

def integer_search_ctu(cur_tiles, ref_plane, origins, radius: int = 8):
    """Full integer-pel search for 64x64 blocks.

    cur_tiles: [B, 64, 64]; ref_plane: [H, W]; origins: [B, 2] (x, y).
    Returns (mv [B, 2] int32 (dx, dy), sad [B]).
    """
    B = cur_tiles.shape[0]
    h, w = ref_plane.shape
    r = radius
    size = 64 + 2 * r
    ys = jnp.clip(origins[:, 1:2, None] - r
                  + jnp.arange(size)[None, :, None], 0, h - 1)
    xs = jnp.clip(origins[:, 0:1, None] - r
                  + jnp.arange(size)[None, None, :], 0, w - 1)
    windows = jnp.take(ref_plane.reshape(-1), ys * w + xs, axis=0
                       ).astype(jnp.int32)  # [B, size, size]

    cur = cur_tiles.astype(jnp.int32)
    n_cand = (2 * r + 1) ** 2

    def cand_sad(c):
        dy, dx = c // (2 * r + 1), c % (2 * r + 1)
        win = jax.lax.dynamic_slice(
            windows, (0, dy, dx), (B, 64, 64))
        return jnp.abs(win - cur).sum((1, 2))

    sads = jax.vmap(cand_sad)(jnp.arange(n_cand))  # [n_cand, B]
    best = jnp.argmin(sads, axis=0)
    dy = best // (2 * r + 1) - r
    dx = best % (2 * r + 1) - r
    return jnp.stack([dx, dy], -1).astype(jnp.int32), jnp.min(sads, axis=0)


def predict_inter_ctu(ref_plane, origins, mv_q, *, is_luma=True):
    """Batched MC of 64x64 (or 32x32 chroma) tiles at quarter(eighth)-pel
    MVs. mv_q: [B, 2] in quarter-pel luma units. For chroma the same MV is
    interpreted at 1/8 resolution per 4:2:0.
    """
    return predict_inter_blocks(ref_plane, origins, mv_q,
                                64 if is_luma else 32, is_luma=is_luma)


def predict_inter_blocks(ref_plane, origins, mv_q, size: int, *,
                         is_luma=True, ref_idx=None, size_w=None):
    """Batched MC of size x size blocks at quarter(eighth)-pel MVs.

    origins: [B, 2] (x, y) in the plane's own coordinates (chroma origins
    are chroma coords). mv_q: [B, 2] quarter-pel *luma* MVs; chroma uses
    the same MV at 1/8 resolution per 4:2:0 (H.265 8.5.3.2.9).
    Multi-reference: pass ref_plane [R, H, W] + ref_idx [B] to gather
    each block's window from its own reference picture.
    size_w: optional block width for rectangular PUs (2NxN/Nx2N halves,
    TEncSearch.cpp:2912 predInterSearch partitions); size stays the
    height. MC is separable, so rect blocks reuse the same filters.
    """
    if ref_idx is not None:
        R, h, w = ref_plane.shape
    else:
        h, w = ref_plane.shape
    size_h = size
    size_w = size if size_w is None else size_w
    if is_luma:
        border, lead = 7, 3
        mv_int = mv_q >> 2
        frac = mv_q & 3
        n_frac = 4
    else:
        border, lead = 3, 1
        mv_int = mv_q >> 3
        frac = mv_q & 7
        n_frac = 8

    B = origins.shape[0]
    ext_h = size_h + border
    ext_w = size_w + border
    ys = jnp.clip(origins[:, 1:2, None] + mv_int[:, 1:2, None] - lead
                  + jnp.arange(ext_h)[None, :, None], 0, h - 1)
    xs = jnp.clip(origins[:, 0:1, None] + mv_int[:, 0:1, None] - lead
                  + jnp.arange(ext_w)[None, None, :], 0, w - 1)
    idx = ys * w + xs
    if ref_idx is not None:
        idx = idx + (ref_idx.astype(jnp.int32) * (h * w))[:, None, None]
    win = jnp.take(ref_plane.reshape(-1), idx, axis=0).astype(jnp.int32)

    mc = mc_luma if is_luma else mc_chroma
    # all frac combos computed, select per block (frac is data-dependent)
    preds = jnp.stack([
        jnp.stack([mc(win, fx, fy, size_h, size_w)
                   for fx in range(n_frac)], 0)
        for fy in range(n_frac)], 0)       # [n_frac, n_frac, B, sh, sw]
    return preds[frac[:, 1], frac[:, 0], jnp.arange(B)]


def quarter_refine_blocks(cur_blocks, ref_plane, origins, mv_int,
                          size: int, ref_idx=None, size_w=None):
    """Quarter-pel refinement sweep around integer MVs for size x size
    luma blocks: mv_q = 4*mv_int + (dx, dy), dx/dy in [-3, 3].

    cur_blocks: [B, s, s] (or [B, s, size_w] for rectangular PUs);
    origins: [B, 2] (x, y); mv_int: [B, 2].
    Returns (mv_q [B, 2] int32, best_sad [B]).
    """
    B = cur_blocks.shape[0]
    size_h = size
    size_w = size if size_w is None else size_w
    if ref_idx is not None:
        _, h, w = ref_plane.shape
    else:
        h, w = ref_plane.shape
    lead, border = 4, 9    # extra margin for -3/4 shifts
    ext_h = size_h + border
    ext_w = size_w + border
    base_x = origins[:, 0:1, None] + mv_int[:, 0:1, None] - lead
    base_y = origins[:, 1:2, None] + mv_int[:, 1:2, None] - lead
    ys = jnp.clip(base_y + jnp.arange(ext_h)[None, :, None], 0, h - 1)
    xs = jnp.clip(base_x + jnp.arange(ext_w)[None, None, :], 0, w - 1)
    idx = ys * w + xs
    if ref_idx is not None:
        idx = idx + (ref_idx.astype(jnp.int32) * (h * w))[:, None, None]
    win = jnp.take(ref_plane.reshape(-1), idx, axis=0
                   ).astype(jnp.int32)  # [B, ext_h, ext_w]
    cur = cur_blocks.astype(jnp.int32)

    cands = []
    for qdy in range(-3, 4):
        for qdx in range(-3, 4):
            iy, fy = (qdy >> 2) + 1, qdy & 3   # +1 re-centers the window
            ix, fx = (qdx >> 2) + 1, qdx & 3
            sub = win[:, iy:iy + size_h + 7, ix:ix + size_w + 7]
            pred = mc_luma(sub, fx, fy, size_h, size_w)
            sad = jnp.abs(pred - cur).sum((1, 2))
            cands.append((qdx, qdy, sad))
    sads = jnp.stack([c[2] for c in cands], 0)         # [49, B]
    offs = jnp.asarray([[c[0], c[1]] for c in cands])  # [49, 2]
    best = jnp.argmin(sads, axis=0)
    mv_q = mv_int * 4 + offs[best]
    return mv_q.astype(jnp.int32), jnp.min(sads, 0)


def sad_grid8(cur_tiles, ref_plane, origins, radius: int = 8):
    """Integer-pel SAD field at 8x8-block granularity for 64x64 tiles.

    The quadtree ME primitive: SAD is additive over sub-blocks at a fixed
    candidate MV, so per-8x8 SADs aggregate bottom-up into exact SADs for
    16/32/64 blocks (replaces HM's per-PU TZ search TEncSearch.cpp:3663
    with one shared full-search field).

    cur_tiles: [B, 64, 64]; origins: [B, 2].
    Returns sads [n_cand, B, 8, 8] int32 with candidate (dy, dx) raster
    over the (2*radius+1)^2 window (cand c -> dy = c//(2r+1)-r, dx =
    c%(2r+1)-r).
    """
    B = cur_tiles.shape[0]
    h, w = ref_plane.shape
    r = radius
    span = 64 + 2 * r
    ys = jnp.clip(origins[:, 1:2, None] - r
                  + jnp.arange(span)[None, :, None], 0, h - 1)
    xs = jnp.clip(origins[:, 0:1, None] - r
                  + jnp.arange(span)[None, None, :], 0, w - 1)
    windows = jnp.take(ref_plane.reshape(-1), ys * w + xs, axis=0
                       ).astype(jnp.int32)  # [B, span, span]
    cur = cur_tiles.astype(jnp.int32)
    n_cand = (2 * r + 1) ** 2

    def cand_sad(c):
        dy, dx = c // (2 * r + 1), c % (2 * r + 1)
        win = jax.lax.dynamic_slice(windows, (0, dy, dx), (B, 64, 64))
        ad = jnp.abs(win - cur)
        return ad.reshape(B, 8, 8, 8, 8).sum((2, 4))   # [B, 8, 8]

    return jax.vmap(cand_sad)(jnp.arange(n_cand))
