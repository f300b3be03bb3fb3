"""ETH-CNN: Early-Terminated Hierarchical CNN for CU-partition prediction.

Predicts, for each 64x64 CTU, the 21-probability HCPM (hierarchical CU
partition map): 1 split prob at 64->32, 4 at 32->16, 16 at 16->8.

Behavioral reference (architecture + semantics only, re-implemented TPU-first):
  /root/reference/HM-16.5_Test_AI/bin/net_CNN.py:103-195  (graph topology)
  /root/reference/HM-16.5_Test_AI/bin/video_to_cu_depth.py:61-118 (batching)

TPU-first design choices (vs the reference TF1 graph):
  * Non-overlapping k x k convs are lowered to space-to-depth + one matmul
    per layer, so every layer runs on the MXU as a single [B*cells, k*k*Cin]
    x [k*k*Cin, Cout] contraction (the reference uses strided tf.nn.conv2d).
  * The hierarchical "early termination" (reference: tf.cond zeroing level 2/3
    outputs, net_CNN.py:175,187) is compute-all + mask - data-dependent
    control flow does not pay on TPU. Two granularities:
      - 'ctu'   (default): each sample gates its own level 2/3 outputs.
      - 'batch' (reference parity): one gate for the whole batch, matching
        tf.count_nonzero(...)>0 semantics of the reference graph.
  * Params are a plain pytree dict; bf16-friendly but kept f32 by default
    (the model is tiny; HCPM threshold comparisons want stable probs).

Input normalization (reference net_CNN.py:105-106): luma x/255, qp/51.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# Level channel widths: (fc1, fc2, out) per decision level.
# Reference: net_CNN.py:29-36 (NUM_DENLAYER*_FEATURES_{64,32,16}).
LEVEL_SPECS = {
    "l64": (64, 48, 1),
    "l32": (128, 96, 4),
    "l16": (256, 192, 16),
}
CONV_CHANNELS = (16, 24, 32)        # conv1/2/3 filters (net_CNN.py:15-17)
CONV_KERNELS = (4, 2, 2)            # non-overlapping kernel sizes (net_CNN.py:127-129)
FEAT_DIM = 2688                     # concat of conv2+conv3 features, all 3 branches
# Per-branch input resolutions after avg-pool: L(16x16) gates 64-level texture,
# M(32x32), S(64x64).  (net_CNN.py:126-141)
BRANCH_SIZES = {"L": 16, "M": 32, "S": 64}

LEAKY_SLOPE = 0.2  # tf.nn.leaky_relu default alpha (net_CNN.py:69)


def _trunc_normal(key, shape, std=0.1, dtype=jnp.float32):
    """Truncated normal init (+-2 std), matching the reference initializer
    (net_CNN.py:50-56)."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


@functools.partial(jax.jit, static_argnames=("dtype",))
def init_params(key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    """Initialize the ETH-CNN parameter pytree.

    Layout:
      conv{1,2,3}_{w,b}: shared-shape conv stacks per branch, stored as
        dict[branch] -> w [k*k*Cin, Cout], b [Cout]   (matmul form)
      {lvl}_fc{1,2,3}_{w,b}: per-level FC head; fc1: [2688, d1],
        fc2: [d1+1, d2] (qp concat), fc3: [d2+1, out].
    """
    params: Dict[str, Any] = {}
    keys = jax.random.split(key, 64)
    ki = 0
    for br in ("S", "M", "L"):
        cin = 1
        for li, (k, cout) in enumerate(zip(CONV_KERNELS, CONV_CHANNELS), start=1):
            params[f"conv{li}_{br}_w"] = _trunc_normal(keys[ki], (k * k * cin, cout), dtype=dtype); ki += 1
            params[f"conv{li}_{br}_b"] = _trunc_normal(keys[ki], (cout,), dtype=dtype); ki += 1
            cin = cout
    for lvl, (d1, d2, dout) in LEVEL_SPECS.items():
        params[f"{lvl}_fc1_w"] = _trunc_normal(keys[ki], (FEAT_DIM, d1), dtype=dtype); ki += 1
        params[f"{lvl}_fc1_b"] = _trunc_normal(keys[ki], (d1,), dtype=dtype); ki += 1
        params[f"{lvl}_fc2_w"] = _trunc_normal(keys[ki], (d1 + 1, d2), dtype=dtype); ki += 1
        params[f"{lvl}_fc2_b"] = _trunc_normal(keys[ki], (d2,), dtype=dtype); ki += 1
        params[f"{lvl}_fc3_w"] = _trunc_normal(keys[ki], (d2 + 1, dout), dtype=dtype); ki += 1
        params[f"{lvl}_fc3_b"] = _trunc_normal(keys[ki], (dout,), dtype=dtype); ki += 1
    return params


def _leaky(x):
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


def _avg_pool(x, k):
    """Non-overlapping k x k average pool over [B,H,W]."""
    b, h, w = x.shape
    return x.reshape(b, h // k, k, w // k, k).mean(axis=(2, 4))


def _remove_local_mean(x, win=16):
    """Subtract the mean of each non-overlapping win x win window.

    Matches reference zero_mean_norm_local (net_CNN.py:78-84): stride-`win`
    mean conv + nearest upsample + subtract == per-window mean removal.
    """
    b, h, w = x.shape
    xw = x.reshape(b, h // win, win, w // win, win)
    mean = xw.mean(axis=(2, 4), keepdims=True)
    return (xw - mean).reshape(b, h, w)


def _space_to_depth(x, k):
    """[B,H,W,C] -> [B, H/k, W/k, k*k*C] gathering each k x k cell."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // k, k, w // k, k, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, H/k, W/k, k, k, C
    return x.reshape(b, h // k, w // k, k * k * c)


def _branch_features(params, x, br):
    """Run the 3-layer non-overlapping conv stack of one branch.

    Returns (conv2_flat, conv3_flat) with row-major [H,W,C] flattening —
    the same feature ordering a NHWC conv produces, so a NumPy/TF reference
    implementation at equal weights yields identical vectors.
    """
    h = x[..., None]  # [B,H,W,1]
    feats = []
    for li, k in enumerate(CONV_KERNELS, start=1):
        cells = _space_to_depth(h, k)  # [B,H/k,W/k,k*k*Cin]
        w_mat = params[f"conv{li}_{br}_w"]
        b_vec = params[f"conv{li}_{br}_b"]
        h = _leaky(jnp.einsum("bhwf,fc->bhwc", cells, w_mat,
                              preferred_element_type=jnp.float32) + b_vec)
        if li >= 2:
            feats.append(h.reshape(h.shape[0], -1))
    return feats[0], feats[1]  # conv2_flat, conv3_flat


def _head(params, lvl, feat, qp, dropout_rngs=None):
    """One per-level FC head: fc1 -> [qp] -> fc2 -> [qp] -> fc3(sigmoid).

    QP (already normalized to qp/51) is concatenated before fc2 and fc3,
    matching net_CNN.py:156-187.
    """
    h = _leaky(feat @ params[f"{lvl}_fc1_w"] + params[f"{lvl}_fc1_b"])
    if dropout_rngs is not None:
        keep = 0.5
        mask = jax.random.bernoulli(dropout_rngs[0], keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0)
    h = jnp.concatenate([h, qp[:, None]], axis=1)
    h = _leaky(h @ params[f"{lvl}_fc2_w"] + params[f"{lvl}_fc2_b"])
    if dropout_rngs is not None:
        keep = 0.8
        mask = jax.random.bernoulli(dropout_rngs[1], keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0)
    h = jnp.concatenate([h, qp[:, None]], axis=1)
    logits = h @ params[f"{lvl}_fc3_w"] + params[f"{lvl}_fc3_b"]
    return logits


def apply(params, luma, qp, *, thr_l1=0.5, thr_l2=0.5, early_exit="ctu",
          dropout_rng=None):
    """ETH-CNN forward pass.

    Args:
      params: pytree from init_params.
      luma: [B, 64, 64] uint8 or float luma CTU patches (0..255 scale).
      qp:   [B] QP values (0..51 scale).
      thr_l1, thr_l2: early-termination lower thresholds (Thr_info.txt
        semantics; reference net_CNN.py:38-47 reads cols 1 and 3).
      early_exit: 'ctu' (per-sample gating), 'batch' (reference tf.cond
        whole-batch parity, net_CNN.py:175,187), or 'none'.
      dropout_rng: PRNGKey enabling training-time dropout (None = inference).

    Returns:
      [B, 21] float32 probabilities: [p64 (1), p32 (4), p16 (16)], each
      row-major over the CTU's sub-CU grid — the HCPM ordering consumed by
      the split gate (reference TEncCu.cpp:434-445).
    """
    x = luma.astype(jnp.float32) * (1.0 / 255.0)
    qpn = qp.astype(jnp.float32) * (1.0 / 51.0)

    branch_in = {
        "L": _remove_local_mean(_avg_pool(x, 4), 16),
        "M": _remove_local_mean(_avg_pool(x, 2), 16),
        "S": _remove_local_mean(x, 16),
    }
    c2 = {}
    c3 = {}
    for br in ("S", "M", "L"):
        c2[br], c3[br] = _branch_features(params, branch_in[br], br)
    # Concat order matches reference net_CNN.py:150:
    # [conv3_S, conv3_M, conv3_L, conv2_S, conv2_M, conv2_L]
    feat = jnp.concatenate([c3["S"], c3["M"], c3["L"], c2["S"], c2["M"], c2["L"]],
                           axis=1)

    if dropout_rng is not None:
        rngs = jax.random.split(dropout_rng, 6).reshape(3, 2, 2)
        drops = [rngs[i] for i in range(3)]
    else:
        drops = [None, None, None]

    p64 = jax.nn.sigmoid(_head(params, "l64", feat, qpn, drops[0]))
    p32 = jax.nn.sigmoid(_head(params, "l32", feat, qpn, drops[1]))
    p16 = jax.nn.sigmoid(_head(params, "l16", feat, qpn, drops[2]))

    if early_exit == "ctu":
        g32 = (p64 > thr_l1).any(axis=1, keepdims=True)
        p32 = jnp.where(g32, p32, 0.0)
        g16 = (p32 > thr_l2).any(axis=1, keepdims=True)
        p16 = jnp.where(g16, p16, 0.0)
    elif early_exit == "batch":
        g32 = (p64 > thr_l1).any()
        p32 = jnp.where(g32, p32, jnp.zeros_like(p32))
        g16 = (p32 > thr_l2).any()
        p16 = jnp.where(g16, p16, jnp.zeros_like(p16))
    elif early_exit != "none":
        raise ValueError(f"unknown early_exit mode {early_exit!r}")

    return jnp.concatenate([p64, p32, p16], axis=1)


@functools.partial(jax.jit, static_argnames=("early_exit",))
def apply_jit(params, luma, qp, thr_l1=0.5, thr_l2=0.5, early_exit="ctu"):
    return apply(params, luma, qp, thr_l1=thr_l1, thr_l2=thr_l2,
                 early_exit=early_exit)


@jax.jit
def apply_train_jit(params, luma, qp, dropout_rng):
    """Jitted training-mode forward (dropout on, no early exit)."""
    return apply(params, luma, qp, early_exit="none", dropout_rng=dropout_rng)


# ---------------------------------------------------------------------------
# NumPy reference implementation (oracle for parity tests; mirrors the
# reference TF graph semantics op by op, independent of JAX).
# ---------------------------------------------------------------------------

def apply_numpy(params, luma, qp, thr_l1=0.5, thr_l2=0.5):
    """Pure-NumPy ETH-CNN with reference 'batch' early-exit semantics."""
    p = {k: np.asarray(v) for k, v in params.items()}
    x = np.asarray(luma, np.float32) / 255.0
    qpn = (np.asarray(qp, np.float32) / 51.0)[:, None]

    def pool(a, k):
        b, h, w = a.shape
        return a.reshape(b, h // k, k, w // k, k).mean(axis=(2, 4))

    def lmr(a, win=16):
        b, h, w = a.shape
        aw = a.reshape(b, h // win, win, w // win, win)
        m = aw.mean(axis=(2, 4), keepdims=True)
        return (aw - m).reshape(b, h, w)

    def leaky(a):
        return np.where(a >= 0, a, LEAKY_SLOPE * a).astype(np.float32)

    def branch(a, br):
        h = a[..., None]
        feats = []
        for li, k in enumerate(CONV_KERNELS, start=1):
            b, hh, ww, c = h.shape
            cells = h.reshape(b, hh // k, k, ww // k, k, c).transpose(0, 1, 3, 2, 4, 5)
            cells = cells.reshape(b, hh // k, ww // k, k * k * c)
            h = leaky(cells @ p[f"conv{li}_{br}_w"] + p[f"conv{li}_{br}_b"])
            if li >= 2:
                feats.append(h.reshape(b, -1))
        return feats

    ins = {"L": lmr(pool(x, 4)), "M": lmr(pool(x, 2)), "S": lmr(x)}
    f = {br: branch(ins[br], br) for br in ("S", "M", "L")}
    feat = np.concatenate([f["S"][1], f["M"][1], f["L"][1],
                           f["S"][0], f["M"][0], f["L"][0]], axis=1)

    def head(lvl):
        h = leaky(feat @ p[f"{lvl}_fc1_w"] + p[f"{lvl}_fc1_b"])
        h = np.concatenate([h, qpn], axis=1)
        h = leaky(h @ p[f"{lvl}_fc2_w"] + p[f"{lvl}_fc2_b"])
        h = np.concatenate([h, qpn], axis=1)
        z = h @ p[f"{lvl}_fc3_w"] + p[f"{lvl}_fc3_b"]
        return 1.0 / (1.0 + np.exp(-z))

    p64, p32, p16 = head("l64"), head("l32"), head("l16")
    if not (p64 > thr_l1).any():
        p32 = np.zeros_like(p32)
    if not (p32 > thr_l2).any():
        p16 = np.zeros_like(p16)
    return np.concatenate([p64, p32, p16], axis=1).astype(np.float32)
