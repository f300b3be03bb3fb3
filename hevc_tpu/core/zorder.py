"""Z-scan (Morton) order addressing and intra neighbour availability.

H.265 6.4.1: a neighbouring sample is available iff it lies inside the
picture and its minimum-TB z-scan address precedes the current block's.
We materialize the frame-level z-address map once (4x4 granularity) and
answer availability with array comparisons — vectorizable for the batched
pipeline.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _zorder_in_ctu(log2_ctu: int = 6) -> np.ndarray:
    """[16, 16] z-scan index of each 4x4 block inside a 64x64 CTU."""
    n = 1 << (log2_ctu - 2)
    out = np.zeros((n, n), np.int64)
    for y in range(n):
        for x in range(n):
            z = 0
            for b in range(log2_ctu - 2):
                z |= ((x >> b) & 1) << (2 * b)
                z |= ((y >> b) & 1) << (2 * b + 1)
            out[y, x] = z
    return out


@functools.lru_cache(maxsize=None)
def frame_zmap(pad_w: int, pad_h: int, ctu: int = 64) -> np.ndarray:
    """[pad_h/4, pad_w/4] global decode-order index of each 4x4 block."""
    n_x = -(-pad_w // ctu)
    blocks = ctu // 4
    per_ctu = blocks * blocks
    zin = _zorder_in_ctu(ctu.bit_length() - 1)
    h4, w4 = pad_h // 4, pad_w // 4
    out = np.zeros((h4, w4), np.int64)
    ys = np.arange(h4)
    xs = np.arange(w4)
    cty = ys // blocks
    ctx_ = xs // blocks
    ctu_idx = cty[:, None] * n_x + ctx_[None, :]
    out = ctu_idx * per_ctu + zin[np.ix_(ys % blocks, xs % blocks)]
    return out


def avail_mask(x0: int, y0: int, n: int, pad_w: int, pad_h: int,
               zmap: np.ndarray, scale: int = 1) -> np.ndarray:
    """Availability of the 4n+1 linear reference samples of a TB at
    (x0, y0) size n. Returns bool [4n+1] in the linear ref layout of
    hevc_tpu.ops.intra.

    scale=1: luma coords; scale=2: chroma (4:2:0) coords — availability is
    derived from the co-located luma z-addresses per 6.4.1, and pad_w/pad_h
    are in chroma units.
    """
    def z(x, y):
        return zmap[(y * scale) >> 2, (x * scale) >> 2]

    cur_z = z(x0, y0)
    out = np.zeros(4 * n + 1, bool)

    # left column, bottom-up: r[i] = p[-1][2n-1-i], i=0..2n-1
    if x0 > 0:
        ys = y0 + (2 * n - 1 - np.arange(2 * n))
        ok = ys < pad_h
        ys_c = np.minimum(ys, pad_h - 1)
        out[:2 * n] = ok & (z(x0 - 1, ys_c) < cur_z)
    # corner
    if x0 > 0 and y0 > 0:
        out[2 * n] = z(x0 - 1, y0 - 1) < cur_z
    # top row: r[2n+1+i] = p[i][-1], i=0..2n-1
    if y0 > 0:
        xs = x0 + np.arange(2 * n)
        ok = xs < pad_w
        xs_c = np.minimum(xs, pad_w - 1)
        out[2 * n + 1:] = ok & (z(xs_c, y0 - 1) < cur_z)
    return out


def gather_refs(plane: np.ndarray, x0: int, y0: int, n: int) -> np.ndarray:
    """Collect the 4n+1 linear reference samples (clamped reads; garbage
    where unavailable — substitution fixes those)."""
    h, w = plane.shape
    r = np.zeros(4 * n + 1, np.int32)
    ys = np.clip(y0 + (2 * n - 1 - np.arange(2 * n)), 0, h - 1)
    r[:2 * n] = plane[ys, max(x0 - 1, 0)]
    r[2 * n] = plane[max(y0 - 1, 0), max(x0 - 1, 0)]
    xs = np.clip(x0 + np.arange(2 * n), 0, w - 1)
    r[2 * n + 1:] = plane[max(y0 - 1, 0), xs]
    return r
