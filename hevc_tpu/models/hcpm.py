"""HCPM — hierarchical CU partition map: indexing, thresholds, split gating.

The HCPM is a 21-float vector per CTU: index 0 is the 64->32 split
probability, 1..4 the four 32->16 probabilities (row-major 2x2), 5..20 the
sixteen 16->8 probabilities (row-major 4x4).  Reference layout/indexing:
HM-16.5_Test_AI/.../TEncCu.cpp:434-445 (indexIn21Data).

Gate semantics (reference TEncCu.cpp:448-462):
  prob >  up[level]   => check split only
  prob <= down[level] => check current (no-split) only
  otherwise           => check both (full RDO on this node)
plus the hard rules: 8x8 CUs are always leaves (TEncCu.cpp:419-423) and
CUs crossing the frame boundary are always split (TEncCu.cpp:424-428).

Threshold files: 6 floats. NOTE the reference order discrepancy:
  AI  (TEncCu.cpp:250):   up1 down1 up2 down2 up3 down3
  LDP (TEncGOP.cpp:1449): down1 up1 down2 up2 down3 up3
Both are supported via `parse_thresholds(..., order=)`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Thresholds:
    up: Tuple[float, float, float]
    down: Tuple[float, float, float]

    @property
    def l1_lower(self):
        # Early-exit lower thresholds used *inside* the network graph
        # (reference net_CNN.py:38-47 reads fields 1 and 3 of the AI file,
        # i.e. down1 / down2).
        return self.down[0]

    @property
    def l2_lower(self):
        return self.down[1]


DEFAULT_AI = Thresholds(up=(0.5, 0.5, 0.5), down=(0.5, 0.5, 0.5))
DEFAULT_LDP = Thresholds(up=(0.6, 0.7, 0.8), down=(0.4, 0.3, 0.2))


def parse_thresholds(text: str, order: str = "ai") -> Thresholds:
    """Parse a 6-float threshold line.

    order='ai':  up1 down1 up2 down2 up3 down3   (TEncCu.cpp:250)
    order='ldp': down1 up1 down2 up2 down3 up3   (TEncGOP.cpp:1449)
    """
    vals = [float(v) for v in text.split()[:6]]
    if len(vals) != 6:
        raise ValueError("threshold line must contain 6 floats")
    a, b = vals[0::2], vals[1::2]
    if order == "ai":
        return Thresholds(up=tuple(a), down=tuple(b))
    elif order == "ldp":
        return Thresholds(up=tuple(b), down=tuple(a))
    raise ValueError(f"unknown threshold order {order!r}")


# Node table for the 21 HCPM entries: (level, y, x) of each sub-CU.
# level 0: the 64x64 node; level 1: 2x2 grid of 32s; level 2: 4x4 grid of 16s.
def hcpm_index(level: int, x: int, y: int) -> int:
    """Flat index of a node's probability in the 21-vector.

    x, y are pixel offsets of the sub-CU inside its CTU.
    Mirrors reference indexIn21Data (TEncCu.cpp:434-445).
    """
    if level == 0:
        return 0
    if level == 1:
        return 1 + (x // 32) + 2 * (y // 32)
    if level == 2:
        return 5 + (x // 16) + 4 * (y // 16)
    raise ValueError("level must be 0, 1 or 2")


def split_gates(hcpm, thr: Thresholds):
    """Turn HCPM probabilities into (check_current, check_split) masks.

    Args:
      hcpm: [..., 21] probabilities.
      thr: Thresholds.

    Returns:
      (check_cur, check_split): each [..., 21] bool. For every decision node:
        check_split[n] — RDO may evaluate the split branch below node n;
        check_cur[n]   — RDO may evaluate node n as a leaf.
      Level-3 nodes (8x8) are not represented: they are always leaves.
    """
    hcpm = jnp.asarray(hcpm)
    up = jnp.concatenate([
        jnp.full((1,), thr.up[0]),
        jnp.full((4,), thr.up[1]),
        jnp.full((16,), thr.up[2]),
    ])
    down = jnp.concatenate([
        jnp.full((1,), thr.down[0]),
        jnp.full((4,), thr.down[1]),
        jnp.full((16,), thr.down[2]),
    ])
    check_split = hcpm > down          # not (prob <= down): no-split-only excluded
    check_cur = ~(hcpm > up)           # not (prob > up): split-only excluded
    return check_cur, check_split


def depth_map_from_decisions(split0, split1, split2):
    """Compose per-level split decisions into a 4x4 depth map (16x16 units).

    Args:
      split0: [...] bool       — 64 split?
      split1: [..., 2, 2] bool — 32 splits
      split2: [..., 4, 4] bool — 16 splits
    Returns:
      [..., 4, 4] int32 depth in 0..3, the ground-truth label format of the
      reference (TEncSlice.cpp:880-888: depth per 16x16 unit).
    """
    split0 = jnp.asarray(split0)
    split1 = jnp.asarray(split1) & split0[..., None, None]
    split2 = jnp.asarray(split2) & jnp.repeat(jnp.repeat(split1, 2, -1), 2, -2)
    d = (split0[..., None, None].astype(jnp.int32)
         + jnp.repeat(jnp.repeat(split1.astype(jnp.int32), 2, -1), 2, -2)
         + split2.astype(jnp.int32))
    return d


def decisions_from_depth_map(depth):
    """Inverse of depth_map_from_decisions: per-level binary split labels.

    Mirrors the reference's pool/ReLU label decomposition
    (ETH-CNN_Training_AI/net_CTU64.py:101-118): from a [..., 4, 4] depth map
    produce (y64 [...,1], y32 [...,4], y16 [...,16]) soft labels in [0,1]
    plus validity masks (valid32 [...,4], valid16 [...,16]).
    """
    depth = np.asarray(depth, np.float32)
    lead = depth.shape[:-2]

    def pool(a, k):
        s = a.shape
        return a.reshape(*s[:-2], s[-2] // k, k, s[-1] // k, k).mean(axis=(-3, -1))

    relu = lambda a: np.maximum(a, 0.0)
    y16 = relu(depth - 2)
    p2 = pool(depth, 2)
    y32 = relu(p2 - 1) - relu(p2 - 2)
    p4 = pool(depth, 4)
    y64 = relu(p4 - 0) - relu(p4 - 1)
    valid32 = relu(p2) - relu(p2 - 1)
    valid16 = relu(depth - 1) - relu(depth - 2)
    return (y64.reshape(*lead, 1), y32.reshape(*lead, 4), y16.reshape(*lead, 16),
            valid32.reshape(*lead, 4), valid16.reshape(*lead, 16))
