import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hevc_tpu.models import eth_cnn, hcpm


@pytest.fixture(scope="module")
def params():
    return eth_cnn.init_params(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(7)
    luma = rng.randint(0, 256, size=(6, 64, 64)).astype(np.uint8)
    qp = np.array([22, 27, 32, 37, 32, 32], np.float32)
    return luma, qp


def test_output_shape_and_range(params, batch):
    luma, qp = batch
    out = eth_cnn.apply_jit(params, jnp.asarray(luma), jnp.asarray(qp))
    assert out.shape == (6, 21)
    out = np.asarray(out)
    assert np.all(out >= 0.0) and np.all(out <= 1.0)


def test_numpy_parity(params, batch):
    """JAX forward ~= independent NumPy implementation at equal weights.

    Untrained truncated-normal weights produce large pre-activations, so f32
    reassociation noise across XLA/NumPy is a few 1e-3 in probability space;
    decisions (prob vs threshold) must still agree except at the borderline.
    """
    luma, qp = batch
    ref = eth_cnn.apply_numpy(params, luma, qp, thr_l1=-1.0, thr_l2=-1.0)
    got = np.asarray(eth_cnn.apply_jit(params, jnp.asarray(luma),
                                       jnp.asarray(qp),
                                       early_exit="none"))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=5e-3)
    thr = 0.5
    borderline = np.abs(ref - thr) < 5e-3
    np.testing.assert_array_equal((got > thr)[~borderline],
                                  (ref > thr)[~borderline])


def test_early_exit_batch_matches_reference_semantics(params, batch):
    luma, qp = batch
    # With impossible thresholds the whole batch early-exits: levels 2/3 zero.
    out = np.asarray(eth_cnn.apply_jit(params, jnp.asarray(luma),
                                       jnp.asarray(qp),
                                       1.1, 1.1, early_exit="batch"))
    assert np.all(out[:, 1:] == 0.0)
    assert np.any(out[:, 0] > 0.0)
    ref = eth_cnn.apply_numpy(params, luma, qp, thr_l1=1.1, thr_l2=1.1)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_early_exit_ctu_gates_per_sample(params, batch):
    luma, qp = batch
    full = np.asarray(eth_cnn.apply_jit(params, jnp.asarray(luma),
                                        jnp.asarray(qp), early_exit="none"))
    thr = float(np.median(full[:, 0]))
    out = np.asarray(eth_cnn.apply_jit(params, jnp.asarray(luma),
                                       jnp.asarray(qp),
                                       thr, 0.0, early_exit="ctu"))
    gated = full[:, 0] <= thr
    assert np.all(out[gated, 1:5] == 0.0)
    assert np.all(out[~gated, 1:5] == full[~gated, 1:5])


def test_dropout_changes_output_and_is_deterministic(params, batch):
    luma, qp = batch
    k = jax.random.PRNGKey(3)
    a = eth_cnn.apply_train_jit(params, jnp.asarray(luma), jnp.asarray(qp), k)
    b = eth_cnn.apply_train_jit(params, jnp.asarray(luma), jnp.asarray(qp), k)
    c = eth_cnn.apply_jit(params, jnp.asarray(luma), jnp.asarray(qp),
                          early_exit="none")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_hcpm_indexing():
    assert hcpm.hcpm_index(0, 0, 0) == 0
    assert hcpm.hcpm_index(1, 32, 0) == 2
    assert hcpm.hcpm_index(1, 32, 32) == 4
    assert hcpm.hcpm_index(2, 48, 16) == 12
    assert hcpm.hcpm_index(2, 48, 48) == 20


def test_threshold_parsing_order():
    ai = hcpm.parse_thresholds("0.5 0.4 0.6 0.3 0.7 0.2", order="ai")
    assert ai.up == (0.5, 0.6, 0.7) and ai.down == (0.4, 0.3, 0.2)
    ldp = hcpm.parse_thresholds("0.4 0.6 0.3 0.7 0.2 0.8", order="ldp")
    assert ldp.up == (0.6, 0.7, 0.8) and ldp.down == (0.4, 0.3, 0.2)


def test_split_gates_semantics():
    thr = hcpm.Thresholds(up=(0.6, 0.6, 0.6), down=(0.4, 0.4, 0.4))
    probs = np.full((21,), 0.5, np.float32)
    probs[0] = 0.7   # > up: split only
    probs[1] = 0.3   # <= down: no-split only
    cur, split = hcpm.split_gates(jnp.asarray(probs), thr)
    cur, split = np.asarray(cur), np.asarray(split)
    assert not cur[0] and split[0]
    assert cur[1] and not split[1]
    assert cur[2] and split[2]   # in between: both


def test_depth_map_roundtrip():
    rng = np.random.RandomState(0)
    s0 = rng.rand(8) < 0.7
    s1 = rng.rand(8, 2, 2) < 0.5
    s2 = rng.rand(8, 4, 4) < 0.5
    d = np.asarray(hcpm.depth_map_from_decisions(s0, s1, s2))
    assert d.shape == (8, 4, 4)
    assert d.min() >= 0 and d.max() <= 3
    y64, y32, y16, v32, v16 = hcpm.decisions_from_depth_map(d)
    np.testing.assert_array_equal(y64[:, 0], s0.astype(np.float32))
    # where the 64 was split, y32 must equal the (gated) 32-level decisions
    eff1 = (s1 & s0[:, None, None]).astype(np.float32).reshape(8, 4)
    np.testing.assert_array_equal(y32[s0], eff1[s0])
    # validity: 32-labels valid only where 64 split
    assert np.all(v32[~s0] == 0.0) and np.all(v32[s0] == 1.0)
