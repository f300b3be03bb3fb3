"""ETH-CNN + ETH-LSTM for Low-Delay-P CU-partition prediction.

A residue-frame CNN (same 3-branch topology as ETH-CNN but on inter
residue, input scaling (x-128)/255*10, FC1-only per level -> 448-d
feature vector) feeding three single-layer LSTMs (hidden 64/128/256,
forget bias 1.0, cell clip 5.0) that carry temporal state across frames;
per-step FC heads with external features qp/51*0.18 + one-hot
frame-in-GOP(4) emit the 21-probability HCPM.

Behavioral reference: HM-16.5_Test_LDP/bin/net_CNN_LSTM_one_step.py
(:140-323) and resi_to_cu_depth_LDP.py (:103-144). The reference
round-trips LSTM state through state.dat each frame; here state is a
resident device array [B, 2, 448] (c and h, levels concatenated) carried
across frame steps — sharded with the CTU batch on multi-chip meshes.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import eth_cnn

HIDDEN = {"l64": 64, "l32": 128, "l16": 256}
HEAD_D2 = {"l64": 48, "l32": 96, "l16": 192}
HEAD_OUT = {"l64": 1, "l32": 4, "l16": 16}
VEC_SLICES = {"l64": (0, 64), "l32": (64, 192), "l16": (192, 448)}
STATE_DIM = 448  # 64 + 128 + 256
GOP_LENGTH = 4
CELL_CLIP = 5.0
FORGET_BIAS = 1.0


def init_params(key, dtype=jnp.float32) -> Dict:
    """CNN (conv stack + per-level fc1) + LSTM + head parameters."""
    keys = jax.random.split(key, 48)
    ki = 0
    params: Dict = {}
    # conv stack (same shapes as ETH-CNN)
    for br in ("S", "M", "L"):
        cin = 1
        for li, (k, cout) in enumerate(
                zip(eth_cnn.CONV_KERNELS, eth_cnn.CONV_CHANNELS), start=1):
            params[f"conv{li}_{br}_w"] = eth_cnn._trunc_normal(
                keys[ki], (k * k * cin, cout), dtype=dtype); ki += 1
            params[f"conv{li}_{br}_b"] = eth_cnn._trunc_normal(
                keys[ki], (cout,), dtype=dtype); ki += 1
            cin = cout
    for lvl, h in HIDDEN.items():
        vec = h  # fc1 output width == LSTM input width == hidden size
        params[f"{lvl}_fc1_w"] = eth_cnn._trunc_normal(
            keys[ki], (eth_cnn.FEAT_DIM, vec), dtype=dtype); ki += 1
        params[f"{lvl}_fc1_b"] = eth_cnn._trunc_normal(
            keys[ki], (vec,), dtype=dtype); ki += 1
        # LSTM kernel: [vec + hidden, 4*hidden], gate order (i, g, f, o)
        params[f"{lvl}_lstm_w"] = eth_cnn._trunc_normal(
            keys[ki], (vec + h, 4 * h), dtype=dtype); ki += 1
        params[f"{lvl}_lstm_b"] = jnp.zeros((4 * h,), dtype); ki += 1
        d2, dout = HEAD_D2[lvl], HEAD_OUT[lvl]
        params[f"{lvl}_fc2_w"] = eth_cnn._trunc_normal(
            keys[ki], (h + GOP_LENGTH + 1, d2), dtype=dtype); ki += 1
        params[f"{lvl}_fc2_b"] = eth_cnn._trunc_normal(
            keys[ki], (d2,), dtype=dtype); ki += 1
        params[f"{lvl}_fc3_w"] = eth_cnn._trunc_normal(
            keys[ki], (d2 + GOP_LENGTH + 1, dout), dtype=dtype); ki += 1
        params[f"{lvl}_fc3_b"] = eth_cnn._trunc_normal(
            keys[ki], (dout,), dtype=dtype); ki += 1
    return params


def zero_state(batch: int, dtype=jnp.float32):
    """[B, 2, 448]: (c, h) per sample, levels concatenated 64|128|256."""
    return jnp.zeros((batch, 2, STATE_DIM), dtype)


def resi_features(params, resi, *, dropout_rng=None):
    """Residue CNN: [B, 64, 64] (uint8, 128-centered) -> [B, 448]."""
    x = (resi.astype(jnp.float32) - 128.0) / 255.0 * 10.0
    branch_in = {
        "L": eth_cnn._remove_local_mean(eth_cnn._avg_pool(x, 4), 16),
        "M": eth_cnn._remove_local_mean(eth_cnn._avg_pool(x, 2), 16),
        "S": eth_cnn._remove_local_mean(x, 16),
    }
    c2, c3 = {}, {}
    for br in ("S", "M", "L"):
        c2[br], c3[br] = eth_cnn._branch_features(params, branch_in[br], br)
    feat = jnp.concatenate([c3["S"], c3["M"], c3["L"],
                            c2["S"], c2["M"], c2["L"]], axis=1)
    outs = []
    for lvl in ("l64", "l32", "l16"):
        h = eth_cnn._leaky(feat @ params[f"{lvl}_fc1_w"]
                           + params[f"{lvl}_fc1_b"])
        outs.append(h)
    return jnp.concatenate(outs, axis=1)  # [B, 448]


def _lstm_cell(params, lvl, x, c, h):
    """TF-contrib-LSTMCell semantics: gates (i, g, f, o), forget bias 1,
    cell clip 5."""
    hdim = HIDDEN[lvl]
    z = jnp.concatenate([x, h], axis=1) @ params[f"{lvl}_lstm_w"] \
        + params[f"{lvl}_lstm_b"]
    i, g, f, o = jnp.split(z, 4, axis=1)
    c_new = jax.nn.sigmoid(f + FORGET_BIAS) * c \
        + jax.nn.sigmoid(i) * jnp.tanh(g)
    c_new = jnp.clip(c_new, -CELL_CLIP, CELL_CLIP)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return c_new, h_new


def _head(params, lvl, h, efs):
    x = jnp.concatenate([h, efs], axis=1)
    d2 = eth_cnn._leaky(x @ params[f"{lvl}_fc2_w"] + params[f"{lvl}_fc2_b"])
    d2 = jnp.concatenate([d2, efs], axis=1)
    return jax.nn.sigmoid(d2 @ params[f"{lvl}_fc3_w"]
                          + params[f"{lvl}_fc3_b"])


def _split_state(state):
    out = {}
    off = 0
    for lvl in ("l64", "l32", "l16"):
        h = HIDDEN[lvl]
        out[lvl] = (state[:, 0, off:off + h], state[:, 1, off:off + h])
        off += h
    return out


def step(params, resi, qp, frame_in_gop, state, *, thr_l1=0.5, thr_l2=0.5,
         early_exit="ctu"):
    """One LDP prediction step (one frame's CTU batch).

    resi: [B, 64, 64] residue patches (u8-range, 128-centered);
    qp: [B]; frame_in_gop: [B] int (POC % 4); state: [B, 2, 448].
    Returns (probs [B, 21], new_state [B, 2, 448]).
    """
    vec = resi_features(params, resi)
    efs = jnp.concatenate([
        (qp.astype(jnp.float32) / 51.0 * 0.18)[:, None],
        jax.nn.one_hot(frame_in_gop, GOP_LENGTH)], axis=1)

    st = _split_state(state)
    probs = {}
    new_c, new_h = [], []
    for lvl in ("l64", "l32", "l16"):
        lo, hi = VEC_SLICES[lvl]
        c, h = st[lvl]
        c2, h2 = _lstm_cell(params, lvl, vec[:, lo:hi], c, h)
        probs[lvl] = _head(params, lvl, h2, efs)
        new_c.append(c2)
        new_h.append(h2)

    p64, p32, p16 = probs["l64"], probs["l32"], probs["l16"]
    if early_exit == "ctu":
        g32 = (p64 > thr_l1).any(axis=1, keepdims=True)
        p32 = jnp.where(g32, p32, 0.0)
        g16 = (p32 > thr_l2).any(axis=1, keepdims=True)
        p16 = jnp.where(g16, p16, 0.0)
    elif early_exit == "batch":
        p32 = jnp.where((p64 > thr_l1).any(), p32, jnp.zeros_like(p32))
        p16 = jnp.where((p32 > thr_l2).any(), p16, jnp.zeros_like(p16))

    new_state = jnp.stack([jnp.concatenate(new_c, 1),
                           jnp.concatenate(new_h, 1)], axis=1)
    return jnp.concatenate([p64, p32, p16], axis=1), new_state


@functools.partial(jax.jit, static_argnames=("early_exit",))
def step_jit(params, resi, qp, frame_in_gop, state, thr_l1=0.5, thr_l2=0.5,
             early_exit="ctu"):
    return step(params, resi, qp, frame_in_gop, state, thr_l1=thr_l1,
                thr_l2=thr_l2, early_exit=early_exit)


def apply_sequence(params, resi_seq, qp_seq, fig_seq, state0=None):
    """Training-time multi-step rollout via lax.scan (truncated BPTT).

    resi_seq: [T, B, 64, 64]; qp_seq, fig_seq: [T, B].
    Returns probs [T, B, 21] (no early exit — training computes all)."""
    B = resi_seq.shape[1]
    if state0 is None:
        state0 = zero_state(B)

    def body(state, inp):
        resi, qp, fig = inp
        probs, state = step(params, resi, qp, fig, state, early_exit="none")
        return state, probs

    _, probs = jax.lax.scan(body, state0, (resi_seq, qp_seq, fig_seq))
    return probs
