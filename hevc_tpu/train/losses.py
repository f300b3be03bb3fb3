"""Hierarchical masked, class-balanced BCE loss + metrics for ETH-CNN/LSTM.

Semantics from the reference trainer (ETH-CNN_Training_AI/net_CTU64.py:178-205):
  * labels are derived from the 4x4 depth map via the pool/ReLU decomposition
    (see hevc_tpu.models.hcpm.decisions_from_depth_map);
  * per level: positive and negative BCE terms are averaged *separately* over
    their own support counts, then averaged together (class balancing);
  * level-2 (32) and level-3 (16) terms only count where the parent split
    (validity masks);
  * accuracy = thresholded-at-0.5 agreement over valid entries;
  * "tendency" (train_CNN_CTU64.py:103-147) = log10 odds-ratio skew of the
    confusion matrix, a calibration diagnostic.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def _balanced_bce(y, p, valid):
    """Class-balanced masked BCE. y, p, valid: same shape, float32.

    p is clamped away from {0,1}: saturated sigmoids otherwise produce
    unbounded 1/p gradients through the explicit log (the late-training
    NaN spikes seen at high QP)."""
    p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
    pos = -(y * jnp.log(p + EPS)) * valid
    neg = -((1.0 - y) * jnp.log(1.0 - p + EPS)) * valid
    n_pos = jnp.count_nonzero(y * valid).astype(jnp.float32)
    n_neg = jnp.count_nonzero((1.0 - y) * valid).astype(jnp.float32)
    loss_pos = pos.sum() / (n_pos + EPS)
    loss_neg = neg.sum() / (n_neg + EPS)
    return 0.5 * (loss_pos + loss_neg)


def hierarchical_loss(probs, depth_labels_soft):
    """Total ETH-CNN loss.

    Args:
      probs: [B, 21] predicted split probabilities (HCPM layout).
      depth_labels_soft: [B, 4, 4] float depth map (0..3), may be fractional
        when labels were average-pooled.

    Returns:
      (total_loss, aux dict with per-level loss/accuracy).
    """
    y = jnp.asarray(depth_labels_soft, jnp.float32)

    def pool(a, k):
        b = a.shape[0]
        return a.reshape(b, 4 // k, k, 4 // k, k).mean(axis=(2, 4))

    relu = lambda a: jnp.maximum(a, 0.0)
    y16 = relu(y - 2).reshape(-1, 16)
    p2 = pool(y, 2)
    y32 = (relu(p2 - 1) - relu(p2 - 2)).reshape(-1, 4)
    p4 = pool(y, 4)
    y64 = (relu(p4) - relu(p4 - 1)).reshape(-1, 1)
    v32 = (relu(p2) - relu(p2 - 1)).reshape(-1, 4)
    v16 = (relu(y - 1) - relu(y - 2)).reshape(-1, 16)

    p64, p32, p16 = probs[:, :1], probs[:, 1:5], probs[:, 5:21]
    l64 = _balanced_bce(y64, p64, jnp.ones_like(y64))
    l32 = _balanced_bce(y32, p32, v32)
    l16 = _balanced_bce(y16, p16, v16)
    total = l64 + l32 + l16

    def acc(yv, pv, valid):
        correct = (jnp.round(pv) == jnp.round(yv)).astype(jnp.float32) * valid
        return correct.sum() / (valid.sum() + EPS)

    aux = {
        "loss_64": l64, "loss_32": l32, "loss_16": l16,
        "acc_64": acc(y64, p64, jnp.ones_like(y64)),
        "acc_32": acc(y32, p32, v32),
        "acc_16": acc(y16, p16, v16),
        "tend_64": tendency(jnp.round(y64), p64, jnp.ones_like(y64)),
        "tend_32": tendency(jnp.round(y32), p32, jnp.round(v32)),
        "tend_16": tendency(jnp.round(y16), p16, jnp.round(v16)),
    }
    return total, aux


def tendency(y, p, valid):
    """log10 odds-ratio skew of the binary confusion matrix.

    Reference: train_CNN_CTU64.py:103-147. ~0 means balanced errors.
    """
    yh = jnp.round(p)
    tp = ((y == 1) & (yh == 1)).astype(jnp.float32) * valid
    fp = ((y == 0) & (yh == 1)).astype(jnp.float32) * valid
    fn = ((y == 1) & (yh == 0)).astype(jnp.float32) * valid
    tn = ((y == 0) & (yh == 0)).astype(jnp.float32) * valid
    return jnp.log10((tp.sum() + 1.0) * (fp.sum() + 1.0)
                     / ((fn.sum() + 1.0) * (tn.sum() + 1.0)))
