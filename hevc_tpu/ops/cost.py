"""Distortion metrics: SAD, SSE, Hadamard SATD (8x8 / 4x4).

Behavioral reference: HM TComRdCost.cpp (SAD/SSE/xCalcHADs8x8); HM computes
SATD over 8x8 Hadamard blocks with the final sum scaled by /2 per block
(and 4x4 for small partitions). Used by intra RMD mode preselection.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def sad(a, b, axes=(-2, -1)):
    return jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32)).sum(axes)


def sse(a, b, axes=(-2, -1)):
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return (d * d).sum(axes)


@functools.lru_cache(maxsize=None)
def _hadamard(n: int) -> np.ndarray:
    h = np.array([[1]], np.int32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def satd(a, b, block: int = 8):
    """Sum of absolute Hadamard-transformed differences.

    a, b: [..., H, W] with H, W multiples of `block`.
    Returns [...] int32 totals, HM-scaled: each k x k Hadamard block
    contributes round(sum(|H d H|)/ (k/2... )) — HM uses sum/2 for 4x4
    (xCalcHADs4x4: (satd+1)>>1... ) and sum>>2 <<1? We follow HM's 8x8:
    (sum + 2) >> 2 per block, and 4x4: (sum + 1) >> 1.
    """
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    *lead, H, W = d.shape
    k = block
    h = jnp.asarray(_hadamard(k))
    d = d.reshape(*lead, H // k, k, W // k, k)
    d = jnp.moveaxis(d, -3, -2)  # [..., H/k, W/k, k, k]
    t = jnp.einsum("ij,...jk,kl->...il", h, d, h,
                   preferred_element_type=jnp.int32)
    s = jnp.abs(t).sum((-2, -1))
    if k == 8:
        s = (s + 2) >> 2
    else:
        s = (s + 1) >> 1
    return s.sum((-2, -1))


def satd_np(a, b, block: int = 8):
    d = np.asarray(a, np.int64) - np.asarray(b, np.int64)
    *lead, H, W = d.shape
    k = block
    h = _hadamard(k).astype(np.int64)
    d = d.reshape(*lead, H // k, k, W // k, k)
    d = np.moveaxis(d, -3, -2)
    t = np.einsum("ij,...jk,kl->...il", h, d, h)
    s = np.abs(t).sum((-2, -1))
    s = ((s + 2) >> 2) if k == 8 else ((s + 1) >> 1)
    return s.sum((-2, -1)).astype(np.int64)
