import jax
import jax.numpy as jnp
import numpy as np

from hevc_tpu.models import eth_lstm
from hevc_tpu.train import train_lstm


def test_step_shapes_and_state_evolution():
    params = eth_lstm.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    B = 4
    resi = jnp.asarray(rng.randint(0, 256, (B, 64, 64)).astype(np.uint8))
    qp = jnp.full((B,), 32.0)
    fig = jnp.asarray(np.array([1, 2, 3, 1], np.int32))
    st = eth_lstm.zero_state(B)
    probs, st1 = eth_lstm.step_jit(params, resi, qp, fig, st)
    assert probs.shape == (B, 21)
    assert st1.shape == (B, 2, 448)
    assert not np.allclose(np.asarray(st1), 0.0)
    # state carries: same input with evolved state gives different output
    probs2, st2 = eth_lstm.step_jit(params, resi, qp, fig, st1)
    assert not np.allclose(np.asarray(probs), np.asarray(probs2))
    # cell clip respected
    assert np.abs(np.asarray(st2)[:, 0]).max() <= eth_lstm.CELL_CLIP + 1e-5


def test_sequence_rollout_matches_stepwise():
    params = eth_lstm.init_params(jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    T, B = 5, 3
    resi = rng.randint(0, 256, (T, B, 64, 64)).astype(np.uint8)
    qp = np.full((T, B), 27.0, np.float32)
    fig = np.tile(np.arange(T)[:, None] % 4, (1, B)).astype(np.int32)

    seq_probs = np.asarray(eth_lstm.apply_sequence(
        params, jnp.asarray(resi), jnp.asarray(qp), jnp.asarray(fig)))

    st = eth_lstm.zero_state(B)
    for t in range(T):
        p, st = eth_lstm.step_jit(params, jnp.asarray(resi[t]),
                                  jnp.asarray(qp[t]), jnp.asarray(fig[t]),
                                  st, early_exit="none")
        np.testing.assert_allclose(np.asarray(p), seq_probs[t], rtol=1e-5,
                                   atol=1e-6)


def test_lstm_training_learns():
    rng = np.random.RandomState(2)
    n, T = 64, 8
    resi = np.zeros((n, T, 64, 64), np.uint8)
    depth4 = np.zeros((n, T, 4, 4), np.uint8)
    for i in range(n):
        if i % 2 == 0:
            resi[i] = 128          # zero residue -> no split
            depth4[i] = 0
        else:
            resi[i] = rng.randint(0, 256, (T, 64, 64))
            depth4[i] = 3
    qp = np.full((n,), 32, np.uint8)
    fig = np.tile(np.arange(T)[None] % 4, (n, 1))

    cfg = train_lstm.LSTMTrainConfig(iters=40, eval_every=20, batch_size=8,
                                     bptt_len=T, log=False, lr=0.005,
                                     train_cnn=True)
    params, history = train_lstm.train(resi, qp, fig, depth4, cfg)
    assert history[-1]["train_loss"] < history[0]["train_loss"] * 1.1
    assert history[-1]["acc_64"] > 0.7, history
