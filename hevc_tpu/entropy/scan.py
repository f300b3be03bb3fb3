"""Coefficient scan orders (H.265 6.5.3-6.5.5).

Scan arrays map scan index -> raster position (y*width + x), grouped per
4x4 coefficient group: CGs follow the same scan pattern at CG granularity,
coefficients within each CG follow it at sample granularity.
"""

from __future__ import annotations

import functools

import numpy as np

SCAN_DIAG, SCAN_HOR, SCAN_VER = 0, 1, 2

# last_sig_coeff prefix group tables (H.265 Table 9-48 semantics)
MIN_IN_GROUP = np.array([0, 1, 2, 3, 4, 6, 8, 12, 16, 24], np.int32)
GROUP_IDX = np.array([0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7,
                      8, 8, 8, 8, 8, 8, 8, 8, 9, 9, 9, 9, 9, 9, 9, 9],
                     np.int32)


@functools.lru_cache(maxsize=None)
def _base_scan(scan_type: int, n: int) -> np.ndarray:
    """Ungrouped scan over an n x n block: array of (x, y) pairs."""
    pos = []
    if scan_type == SCAN_DIAG:
        # up-right diagonal: each anti-diagonal from bottom-left to top-right
        x = y = 0
        while len(pos) < n * n:
            while y >= 0:
                if x < n and y < n:
                    pos.append((x, y))
                y -= 1
                x += 1
            y = x
            x = 0
    elif scan_type == SCAN_HOR:
        for yy in range(n):
            for xx in range(n):
                pos.append((xx, yy))
    elif scan_type == SCAN_VER:
        for xx in range(n):
            for yy in range(n):
                pos.append((xx, yy))
    else:
        raise ValueError(scan_type)
    return np.array(pos, np.int32)


@functools.lru_cache(maxsize=None)
def grouped_scan(scan_type: int, n: int) -> np.ndarray:
    """Grouped 4x4 scan: scan index -> raster position, for n x n TB."""
    if n == 4:
        xy = _base_scan(scan_type, 4)
        return (xy[:, 1] * n + xy[:, 0]).astype(np.int32)
    cg = _base_scan(scan_type, n // 4)
    inner = _base_scan(scan_type, 4)
    out = []
    for cx, cy in cg:
        for ix, iy in inner:
            x = cx * 4 + ix
            y = cy * 4 + iy
            out.append(y * n + x)
    return np.array(out, np.int32)


@functools.lru_cache(maxsize=None)
def cg_scan(scan_type: int, n: int) -> np.ndarray:
    """CG-level scan: scan index -> CG raster position, (n/4 x n/4) grid."""
    m = max(n // 4, 1)
    xy = _base_scan(scan_type, m)
    return (xy[:, 1] * m + xy[:, 0]).astype(np.int32)


def scan_type_for(intra_mode: int | None, n: int, is_luma: bool) -> int:
    """Mode-dependent coefficient scan (HM getCoefScanIdx behavior):
    intra TUs up to 8x8 luma / 4x4 chroma use HOR for near-vertical modes
    (|mode-26|<=4) and VER for near-horizontal (|mode-10|<=4)."""
    if intra_mode is None:
        return SCAN_DIAG
    max_size = 8 if is_luma else 4
    if n > max_size:
        return SCAN_DIAG
    if abs(intra_mode - 26) <= 4:
        return SCAN_HOR
    if abs(intra_mode - 10) <= 4:
        return SCAN_VER
    return SCAN_DIAG
