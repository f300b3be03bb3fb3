"""ETH-CNN trainer (AI path).

Recipe mirrors the reference (ETH-CNN_Training_AI/train_CNN_CTU64.py:38-52):
SGD + momentum 0.9, LR 0.01 with x0.3163 staircase decay every 250k iters,
batch 64, class-balanced masked hierarchical BCE, per-level accuracy +
tendency metrics. Per-QP-band models (MODEL_TYPE 1-4 semantics) are just
separate training runs over band-filtered data.

TPU-first: the train step is one jitted pjit-able function; params and
optimizer state are plain pytrees checkpointed with numpy .npz.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import eth_cnn
from . import dataset, losses


@dataclass
class TrainConfig:
    lr: float = 0.01
    momentum: float = 0.9
    decay_rate: float = 0.3163
    decay_steps: int = 250_000
    grad_clip: float = 10.0   # stability guard (reference has none; high-QP
                              # label skew can blow up the balanced loss)
    batch_size: int = 64
    iters: int = 10_000
    eval_every: int = 1000
    eval_batch: int = 512
    seed: int = 0
    log: bool = True
    ckpt_path: Optional[str] = None   # periodic full-state checkpoint
                                      # (resume via train(resume_from=...))
    patience: int = 0                 # >0: early-stop after this many
                                      # evals without a valid-loss best


def make_train_step(tx):
    @jax.jit
    def step(params, opt_state, luma, qp, depth4, rng):
        def loss_fn(p):
            probs = eth_cnn.apply(p, luma, qp, early_exit="none",
                                  dropout_rng=rng)
            total, aux = losses.hierarchical_loss(probs, depth4)
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # NaN guard (round-1 training log had a blowup at qp30~35): a
        # non-finite loss or gradient makes the whole step a no-op
        # instead of poisoning params/momentum.
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        keep = lambda new, old: jnp.where(ok, new, old)
        params = jax.tree.map(keep, new_params, params)
        opt_state = jax.tree.map(keep, new_opt, opt_state)
        return params, opt_state, loss, aux

    return step


@jax.jit
def eval_step(params, luma, qp, depth4):
    probs = eth_cnn.apply(params, luma, qp, early_exit="none")
    total, aux = losses.hierarchical_loss(probs, depth4)
    return total, aux


def train(luma, qp, depth4, cfg: TrainConfig,
          params=None, valid=None, resume_from: Optional[str] = None):
    """Train ETH-CNN on (luma [N,64,64], qp [N], depth4 [N,4,4]).

    resume_from: path of a .npz written by save_train_state — restores
    params + optimizer state, replays the logged history, and skips the
    data stream forward to the saved iteration (the reference's
    IS_RELOAD flow, ETH-LSTM_Training_LDP/train_LSTM_CTU64.py:40-41 —
    model restore + loss_accuracy_list replay + data-skip).

    Returns (params, history list of dicts).
    """
    rng = np.random.RandomState(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)
    if params is None:
        params = eth_cnn.init_params(key)

    sched = optax.exponential_decay(cfg.lr, cfg.decay_steps, cfg.decay_rate,
                                    staircase=True)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                     optax.sgd(learning_rate=sched, momentum=cfg.momentum))
    opt_state = tx.init(params)
    step_fn = make_train_step(tx)

    history = []
    start_iter = 0
    if resume_from is not None:
        params, opt_state, start_iter, history = load_train_state(
            resume_from, opt_state)
        key = jax.random.fold_in(key, start_iter)
    best = (np.inf, params)
    since_best = 0
    t0 = time.time()
    gen = dataset.batches(luma, qp, depth4, cfg.batch_size, rng, cfg.iters)
    for it, (bl, bq, bd) in enumerate(gen):
        if it < start_iter:
            continue    # data-skip: resume the stream position
        key, sub = jax.random.split(key)
        params, opt_state, loss, aux = step_fn(
            params, opt_state, jnp.asarray(bl), jnp.asarray(bq),
            jnp.asarray(bd), sub)
        if (it + 1) % cfg.eval_every == 0 or it == cfg.iters - 1:
            ev_src = valid if valid is not None else (luma, qp, depth4)
            idx = rng.randint(0, ev_src[0].shape[0],
                              min(cfg.eval_batch, ev_src[0].shape[0]))
            vloss, vaux = eval_step(params,
                                    jnp.asarray(ev_src[0][idx]),
                                    jnp.asarray(ev_src[1][idx].astype(
                                        np.float32)),
                                    jnp.asarray(ev_src[2][idx].astype(
                                        np.float32)))
            rec = {"iter": it + 1, "train_loss": float(loss),
                   "valid_loss": float(vloss),
                   "vloss_64": float(vaux["loss_64"]),
                   "vloss_32": float(vaux["loss_32"]),
                   "vloss_16": float(vaux["loss_16"]),
                   "acc_64": float(vaux["acc_64"]),
                   "acc_32": float(vaux["acc_32"]),
                   "acc_16": float(vaux["acc_16"]),
                   "tend_64": float(vaux["tend_64"]),
                   "tend_32": float(vaux["tend_32"]),
                   "tend_16": float(vaux["tend_16"]),
                   "elapsed_s": time.time() - t0}
            history.append(rec)
            if np.isfinite(rec["valid_loss"]) and rec["valid_loss"] < best[0]:
                best = (rec["valid_loss"], jax.tree.map(lambda a: a, params))
                since_best = 0
            else:
                since_best += 1
            if cfg.ckpt_path:
                save_train_state(cfg.ckpt_path, params, opt_state,
                                 it + 1, history)
            if cfg.log:
                print(f"it {rec['iter']}: loss {rec['train_loss']:.4f} "
                      f"valid {rec['valid_loss']:.4f} acc "
                      f"{rec['acc_64']:.3f}/{rec['acc_32']:.3f}/"
                      f"{rec['acc_16']:.3f} tend "
                      f"{rec['tend_64']:+.2f}/{rec['tend_32']:+.2f}/"
                      f"{rec['tend_16']:+.2f}", flush=True)
            if cfg.patience and since_best >= cfg.patience:
                if cfg.log:
                    print(f"early stop at iter {it + 1} "
                          f"(no valid improvement in {cfg.patience} evals)")
                break
    # return the best-by-validation params (guards against late spikes)
    return best[1], history


def write_loss_accuracy_list(path, history):
    """Reference-format metrics table (ETH-CNN_Training_AI/Models/
    loss_accuracy_list_*.dat, column layout train_CNN_CTU64.py:392):
    one row per eval with step, losses, per-level accuracy and tendency."""
    with open(path, "w") as f:
        f.write("# iter train_loss valid_loss vloss_64 vloss_32 vloss_16"
                " acc_64 acc_32 acc_16 tend_64 tend_32 tend_16\n")
        for r in history:
            f.write(f"{r['iter']} {r['train_loss']:.6f}"
                    f" {r['valid_loss']:.6f}"
                    f" {r.get('vloss_64', 0.0):.6f}"
                    f" {r.get('vloss_32', 0.0):.6f}"
                    f" {r.get('vloss_16', 0.0):.6f}"
                    f" {r['acc_64']:.6f} {r['acc_32']:.6f}"
                    f" {r['acc_16']:.6f}"
                    f" {r.get('tend_64', 0.0):+.6f}"
                    f" {r.get('tend_32', 0.0):+.6f}"
                    f" {r.get('tend_16', 0.0):+.6f}\n")


def save_params(path, params):
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_params(path):
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}


def save_train_state(path, params, opt_state, it: int, history):
    """Checkpoint the full training state for IS_RELOAD-style resume."""
    import json
    flat, _ = jax.tree.flatten(opt_state)
    np.savez(path,
             __iter__=np.int64(it),
             __history__=np.frombuffer(
                 json.dumps(history).encode(), dtype=np.uint8),
             **{f"__opt_{i}__": np.asarray(a) for i, a in enumerate(flat)},
             **{k: np.asarray(v) for k, v in params.items()})


def load_train_state(path, opt_state_template):
    """Inverse of save_train_state; opt_state_template supplies the
    pytree structure (from tx.init on same-shaped params)."""
    import json
    z = np.load(path)
    it = int(z["__iter__"])
    history = json.loads(bytes(z["__history__"]).decode())
    params = {k: jnp.asarray(z[k]) for k in z.files
              if not k.startswith("__")}
    flat, tdef = jax.tree.flatten(opt_state_template)
    flat = [jnp.asarray(z[f"__opt_{i}__"]) for i in range(len(flat))]
    return params, jax.tree.unflatten(tdef, flat), it, history


QP_BANDS = {
    # reference video_to_cu_depth.py:126-133 QP-banded model selection
    "qp20~25": range(20, 25),
    "qp25~30": range(25, 30),
    "qp30~35": range(30, 35),
    "qp35~40": range(35, 52),
}


def band_for_qp(qp: int) -> str:
    if qp < 25:
        return "qp20~25"
    if qp < 30:
        return "qp25~30"
    if qp < 35:
        return "qp30~35"
    return "qp35~40"
