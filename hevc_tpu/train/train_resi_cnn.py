"""Residue-CNN pretrainer (LDP path, stage 1 of the LSTM chain).

Behavioral reference: ETH-CNN_Training_LDP/train_resi_CNN_CTU64.py — the
residue CNN is trained standalone first (single all-QP model, a random QP
block picked per sample, input_data.py:124-127; scaling (x-128)/255*10,
net_CTU64.py:102), then its FC1 features feed the LSTM stage
(get_LSTM_input.py). Here the "standalone heads" reuse the ETH-LSTM head
parameters applied directly to the FC1 features (fc1 width == LSTM hidden
width by construction, models/eth_lstm.py), so pretraining warm-starts
conv/fc1 *and* fc2/fc3 for train_lstm; the LSTM kernels remain at init.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import eth_lstm
from . import losses


@dataclass
class ResiCNNTrainConfig:
    lr: float = 0.01
    momentum: float = 0.9
    decay_rate: float = 0.3163
    decay_steps: int = 250_000
    grad_clip: float = 10.0
    batch_size: int = 64
    iters: int = 4_000
    eval_every: int = 500
    eval_batch: int = 512
    seed: int = 0
    log: bool = True


def apply_cnn_only(params, resi, qp, frame_in_gop):
    """[B,21] HCPM probs from the residue CNN alone (no LSTM): FC1
    features routed straight into the per-level heads."""
    vec = eth_lstm.resi_features(params, resi)
    efs = jnp.concatenate([
        (qp.astype(jnp.float32) / 51.0 * 0.18)[:, None],
        jax.nn.one_hot(frame_in_gop, eth_lstm.GOP_LENGTH)], axis=1)
    outs = []
    for lvl in ("l64", "l32", "l16"):
        lo, hi = eth_lstm.VEC_SLICES[lvl]
        outs.append(eth_lstm._head(params, lvl, vec[:, lo:hi], efs))
    return jnp.concatenate(outs, axis=1)


def make_train_step(tx):
    @jax.jit
    def step(params, opt_state, resi, qp, fig, depth4):
        def loss_fn(p):
            probs = apply_cnn_only(p, resi, qp, fig)
            return losses.hierarchical_loss(probs, depth4)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return step


@jax.jit
def eval_step(params, resi, qp, fig, depth4):
    probs = apply_cnn_only(params, resi, qp, fig)
    return losses.hierarchical_loss(probs, depth4)


def train(resi_by_qp, depth4_by_qp, fig, cfg: ResiCNNTrainConfig,
          params=None, valid_frac=0.1):
    """Train the all-QP residue CNN.

    resi_by_qp: {qp: [N,64,64] u8}; depth4_by_qp: {qp: [N,4,4]};
    fig: [N] frame-in-GOP (POC % 4). Per iteration each sample draws one
    of the QP blocks at random (reference single-model semantics).
    Returns (params, history).
    """
    qps = sorted(resi_by_qp)
    n = next(iter(resi_by_qp.values())).shape[0]
    rng = np.random.RandomState(cfg.seed)
    if params is None:
        params = eth_lstm.init_params(jax.random.PRNGKey(cfg.seed))

    sched = optax.exponential_decay(cfg.lr, cfg.decay_steps, cfg.decay_rate,
                                    staircase=True)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                     optax.sgd(learning_rate=sched, momentum=cfg.momentum))
    opt_state = tx.init(params)
    step_fn = make_train_step(tx)

    n_valid = max(16, int(n * valid_frac))
    perm = rng.permutation(n)
    vidx, tidx = perm[:n_valid], perm[n_valid:]

    def draw(idx_pool, size):
        idx = idx_pool[rng.randint(0, len(idx_pool), size)]
        qp_pick = np.asarray(qps)[rng.randint(0, len(qps), size)]
        resi = np.stack([resi_by_qp[q][i] for q, i in zip(qp_pick, idx)])
        dep = np.stack([depth4_by_qp[q][i] for q, i in zip(qp_pick, idx)])
        return (jnp.asarray(resi), jnp.asarray(qp_pick, jnp.float32),
                jnp.asarray(fig[idx]), jnp.asarray(dep, jnp.float32))

    history = []
    best = (np.inf, params)
    t0 = time.time()
    for it in range(cfg.iters):
        br, bq, bf, bd = draw(tidx, cfg.batch_size)
        params, opt_state, loss, aux = step_fn(params, opt_state, br, bq,
                                               bf, bd)
        if (it + 1) % cfg.eval_every == 0 or it == cfg.iters - 1:
            vr, vq, vf, vd = draw(vidx, min(cfg.eval_batch, n_valid * 4))
            vloss, vaux = eval_step(params, vr, vq, vf, vd)
            rec = {"iter": it + 1, "train_loss": float(loss),
                   "valid_loss": float(vloss),
                   "acc_64": float(vaux["acc_64"]),
                   "acc_32": float(vaux["acc_32"]),
                   "acc_16": float(vaux["acc_16"]),
                   "elapsed_s": time.time() - t0}
            history.append(rec)
            if np.isfinite(rec["valid_loss"]) and rec["valid_loss"] < best[0]:
                best = (rec["valid_loss"], jax.tree.map(lambda a: a, params))
            if cfg.log:
                print(f"it {rec['iter']}: loss {rec['train_loss']:.4f} "
                      f"valid {rec['valid_loss']:.4f} acc "
                      f"{rec['acc_64']:.3f}/{rec['acc_32']:.3f}/"
                      f"{rec['acc_16']:.3f}")
    return best[1], history
