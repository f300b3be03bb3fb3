"""ETH-LSTM trainer (LDP path): truncated-BPTT over residue sequences.

Recipe mirrors the reference (ETH-LSTM_Training_LDP/train_LSTM_CTU64.py +
config.py): 20-step BPTT, grad-norm clip 5, SGD-momentum, per-QP models,
CNN weights frozen (trained first by train_resi_cnn) or jointly tuned.
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
class LSTMTrainConfig:
    lr: float = 0.01
    momentum: float = 0.9
    decay_rate: float = 0.3163
    decay_steps: int = 100_000
    grad_clip: float = 5.0
    batch_size: int = 16
    bptt_len: int = 20
    iters: int = 2_000
    eval_every: int = 500
    seed: int = 0
    log: bool = True
    train_cnn: bool = False   # freeze the residue-CNN part by default


CNN_KEYS = ("conv",)


def _mask_cnn_grads(grads, train_cnn):
    if train_cnn:
        return grads
    return {k: (jnp.zeros_like(v) if k.startswith(CNN_KEYS) or "_fc1_" in k
                else v) for k, v in grads.items()}


def make_train_step(tx, cfg: LSTMTrainConfig):
    @jax.jit
    def step(params, opt_state, resi_seq, qp_seq, fig_seq, depth_seq):
        def loss_fn(p):
            probs = eth_lstm.apply_sequence(p, resi_seq, qp_seq, fig_seq)
            T, B = probs.shape[:2]
            total, aux = losses.hierarchical_loss(
                probs.reshape(T * B, 21),
                depth_seq.reshape(T * B, 4, 4))
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = _mask_cnn_grads(grads, cfg.train_cnn)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return step


@jax.jit
def eval_step(params, resi_seq, qp_seq, fig_seq, depth_seq):
    probs = eth_lstm.apply_sequence(params, resi_seq, qp_seq, fig_seq)
    T, B = probs.shape[:2]
    return losses.hierarchical_loss(probs.reshape(T * B, 21),
                                    depth_seq.reshape(T * B, 4, 4))


def _chain_batch(resi, qp, fig, depth4, idx, bptt_len):
    bs = jnp.asarray(resi[idx].transpose(1, 0, 2, 3))  # [T, B, 64, 64]
    bq = jnp.asarray(np.broadcast_to(qp[idx][None],
                                     (bptt_len, idx.shape[0]))
                     .astype(np.float32))
    bf = jnp.asarray(fig[idx].T.astype(np.int32))
    bd = jnp.asarray(depth4[idx].transpose(1, 0, 2, 3).astype(np.float32))
    return bs, bq, bf, bd


def train(resi, qp, fig, depth4, cfg: LSTMTrainConfig, params=None,
          valid=None):
    """Train on temporal sequences.

    resi:  [N, T, 64, 64] residue patch chains (u8-range, 128-centered)
    qp:    [N] per-chain QP; fig: [N, T] frame-in-GOP (POC % 4)
    depth4: [N, T, 4, 4] labels.
    valid: optional held-out (resi, qp, fig, depth4) — evaluated at each
      eval point; the returned params are the best-by-validation set.
    """
    rng = np.random.RandomState(cfg.seed)
    if params is None:
        params = eth_lstm.init_params(jax.random.PRNGKey(cfg.seed))

    sched = optax.exponential_decay(cfg.lr, cfg.decay_steps, cfg.decay_rate,
                                    staircase=True)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                     optax.sgd(learning_rate=sched, momentum=cfg.momentum))
    opt_state = tx.init(params)
    step_fn = make_train_step(tx, cfg)

    n = resi.shape[0]
    history = []
    best = (np.inf, params)
    t0 = time.time()
    for it in range(cfg.iters):
        idx = rng.randint(0, n, cfg.batch_size)
        bs, bq, bf, bd = _chain_batch(resi, qp, fig, depth4, idx,
                                      cfg.bptt_len)
        params, opt_state, loss, aux = step_fn(params, opt_state, bs, bq,
                                               bf, bd)
        if (it + 1) % cfg.eval_every == 0 or it == cfg.iters - 1:
            rec = {"iter": it + 1, "train_loss": float(loss),
                   "acc_64": float(aux["acc_64"]),
                   "acc_32": float(aux["acc_32"]),
                   "acc_16": float(aux["acc_16"]),
                   "elapsed_s": time.time() - t0}
            if valid is not None:
                vr, vq, vf, vd = valid
                vidx = rng.randint(0, vr.shape[0],
                                   min(cfg.batch_size * 4, vr.shape[0]))
                vloss, vaux = eval_step(
                    params, *_chain_batch(vr, vq, vf, vd, vidx,
                                          cfg.bptt_len))
                rec.update(valid_loss=float(vloss),
                           acc_64=float(vaux["acc_64"]),
                           acc_32=float(vaux["acc_32"]),
                           acc_16=float(vaux["acc_16"]),
                           tend_64=float(vaux["tend_64"]),
                           tend_32=float(vaux["tend_32"]),
                           tend_16=float(vaux["tend_16"]))
                if (np.isfinite(rec["valid_loss"])
                        and rec["valid_loss"] < best[0]):
                    best = (rec["valid_loss"],
                            jax.tree.map(lambda a: a, params))
            history.append(rec)
            if cfg.log:
                v = (f" valid {rec['valid_loss']:.4f}"
                     if "valid_loss" in rec else "")
                print(f"it {rec['iter']}: loss {rec['train_loss']:.4f}{v}"
                      f" acc {rec['acc_64']:.3f}/{rec['acc_32']:.3f}/"
                      f"{rec['acc_16']:.3f}", flush=True)
    if valid is not None and np.isfinite(best[0]):
        return best[1], history
    return params, history
