"""Batched reference-sample machinery for the TPU pipeline.

Gathers the linear intra reference array r[0..4n] for many blocks at once
from a frame plane, and computes normative availability (H.265 6.4.1)
fully vectorized: global z-scan addresses are Morton codes computed with
bit ops — no tables, no host round-trips. Shared by the mode-search phase
(original-pixel references) and the reconstruction phase.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _interleave4(v):
    """Spread the low 4 bits of v: abcd -> a0b0c0d0 (int32, vectorized)."""
    v = v & 0xF
    v = (v | (v << 2)) & 0x33
    v = (v | (v << 1)) & 0x55
    return v


def zaddr(gx, gy, n_ctu_x):
    """Global decode-order address of the 4x4 block containing (gx, gy)
    (luma sample coords). Higher = later in decode order."""
    bx = gx >> 2
    by = gy >> 2
    cx = bx >> 4
    cy = by >> 4
    morton = _interleave4(bx & 15) | (_interleave4(by & 15) << 1)
    return (cy * n_ctu_x + cx) * 256 + morton


@functools.lru_cache(maxsize=None)
def ref_offsets(n: int):
    """Static (dx, dy) of each linear ref sample relative to block origin.

    Layout (ops.intra): r[i] = p[-1][2n-1-i] for i<2n (left, bottom-up),
    r[2n] = corner, r[2n+1+i] = p[i][-1] (top).
    """
    dx = np.empty(4 * n + 1, np.int32)
    dy = np.empty(4 * n + 1, np.int32)
    i = np.arange(2 * n)
    dx[:2 * n] = -1
    dy[:2 * n] = 2 * n - 1 - i
    dx[2 * n] = -1
    dy[2 * n] = -1
    dx[2 * n + 1:] = i
    dy[2 * n + 1:] = -1
    return dx, dy


def gather_refs(plane, origins, n: int):
    """Gather linear refs for B blocks.

    plane: [H, W] int; origins: [B, 2] (x0, y0) in plane coords.
    Returns [B, 4n+1] int32 (clamped reads; pair with availability()).
    """
    h, w = plane.shape
    dx, dy = ref_offsets(n)
    gx = jnp.clip(origins[:, 0:1] + dx[None, :], 0, w - 1)
    gy = jnp.clip(origins[:, 1:2] + dy[None, :], 0, h - 1)
    return jnp.take(plane.reshape(-1), gy * w + gx, axis=0).astype(jnp.int32)


def availability(origins, n: int, pad_w: int, pad_h: int, n_ctu_x: int,
                 scale: int = 1):
    """Normative availability of each linear ref sample.

    origins: [B, 2] block (x0, y0) in component coords; scale=2 for 4:2:0
    chroma (z-addresses are evaluated at co-located luma positions).
    pad_w/pad_h in component units.
    """
    dx, dy = ref_offsets(n)
    gx = origins[:, 0:1] + dx[None, :]
    gy = origins[:, 1:2] + dy[None, :]
    inside = (gx >= 0) & (gy >= 0) & (gx < pad_w) & (gy < pad_h)
    cur = zaddr(origins[:, 0:1] * scale, origins[:, 1:2] * scale, n_ctu_x)
    ref = zaddr(jnp.maximum(gx, 0) * scale, jnp.maximum(gy, 0) * scale,
                n_ctu_x)
    return inside & (ref < cur)


def prepare_refs(plane, origins, n: int, pad_w: int, pad_h: int,
                 n_ctu_x: int, scale: int = 1, bit_depth: int = 8):
    """gather + availability + substitution in one call -> [B, 4n+1]."""
    from . import intra
    r = gather_refs(plane, origins, n)
    av = availability(origins, n, pad_w, pad_h, n_ctu_x, scale)
    return intra.substitute_refs(r, av, bit_depth)
