import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hevc_tpu.ops import transforms, quant, intra, cost


# ---------------------------------------------------------------------------
# Transform matrices
# ---------------------------------------------------------------------------

def test_dct4_matches_standard_table():
    t = transforms.dct_matrix(4)
    expected = np.array([
        [64, 64, 64, 64],
        [83, 36, -36, -83],
        [64, -64, -64, 64],
        [36, -83, 83, -36],
    ])
    np.testing.assert_array_equal(t, expected)


def test_dct8_matches_standard_table():
    t = transforms.dct_matrix(8)
    expected = np.array([
        [64, 64, 64, 64, 64, 64, 64, 64],
        [89, 75, 50, 18, -18, -50, -75, -89],
        [83, 36, -36, -83, -83, -36, 36, 83],
        [75, -18, -89, -50, 50, 89, 18, -75],
        [64, -64, -64, 64, 64, -64, -64, 64],
        [50, -89, 18, 75, -75, -18, 89, -50],
        [36, -83, 83, -36, -36, 83, -83, 36],
        [18, -50, 75, -89, 89, -75, 50, -18],
    ])
    np.testing.assert_array_equal(t, expected)


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_dct_embedding_and_symmetry(n):
    t = transforms.dct_matrix(n)
    # row symmetry: T[k][N-1-n] = (-1)^k T[k][n]
    for k in range(n):
        sign = 1 if k % 2 == 0 else -1
        np.testing.assert_array_equal(t[k, ::-1], sign * t[k])
    # subsampling embedding: T_{N/2}[k] == T_N[2k][:N/2]
    if n > 4:
        half = transforms.dct_matrix(n // 2)
        np.testing.assert_array_equal(t[::2, :n // 2], half)
    # near-orthogonality: T @ T.T ~ 64^2 * N * I
    g = t.astype(np.int64) @ t.astype(np.int64).T
    diag = np.diag(g).astype(np.float64)
    assert np.all(np.abs(diag - 64 * 64 * n) / (64 * 64 * n) < 0.01)
    off = g - np.diag(np.diag(g))
    assert np.all(np.abs(off) < 64 * 64 * n * 0.01)


def test_dst4_table():
    t = transforms.dst_matrix()
    expected = np.array([
        [29, 55, 74, 84],
        [74, 74, 0, -74],
        [84, -29, -74, 55],
        [55, -84, 74, -29],
    ])
    np.testing.assert_array_equal(t, expected)


# ---------------------------------------------------------------------------
# Forward/inverse transform + quant round trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n,use_dst", [(4, False), (4, True), (8, False),
                                       (16, False), (32, False)])
def test_transform_jax_matches_numpy(n, use_dst):
    rng = np.random.RandomState(n)
    resi = rng.randint(-255, 256, size=(5, n, n)).astype(np.int32)
    ref_f = transforms.forward_transform_np(resi, use_dst=use_dst)
    got_f = np.asarray(jax.jit(
        lambda r: transforms.forward_transform(r, use_dst=use_dst))(resi))
    np.testing.assert_array_equal(got_f, ref_f)
    ref_i = transforms.inverse_transform_np(ref_f, use_dst=use_dst)
    got_i = np.asarray(jax.jit(
        lambda c: transforms.inverse_transform(c, use_dst=use_dst))(ref_f))
    np.testing.assert_array_equal(got_i, ref_i)


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_transform_roundtrip_accuracy(n):
    """fwd->inv without quant should approximately reproduce the residual."""
    rng = np.random.RandomState(42)
    resi = rng.randint(-200, 201, size=(4, n, n)).astype(np.int32)
    coef = transforms.forward_transform_np(resi)
    rec = transforms.inverse_transform_np(coef)
    err = np.abs(rec - resi)
    assert err.max() <= 4, f"max roundtrip err {err.max()}"


@pytest.mark.parametrize("qp", [0, 17, 22, 32, 37, 51])
def test_quant_dequant_jax_matches_numpy(qp):
    rng = np.random.RandomState(qp)
    for n in (4, 8, 32):
        coef = rng.randint(-30000, 30001, size=(3, n, n)).astype(np.int32)
        ref_q = quant.quantize_np(coef, qp)
        got_q = np.asarray(jax.jit(lambda c: quant.quantize(c, qp))(coef))
        np.testing.assert_array_equal(got_q, ref_q)
        ref_d = quant.dequantize_np(ref_q, qp)
        got_d = np.asarray(jax.jit(lambda l: quant.dequantize(l, qp))(ref_q))
        np.testing.assert_array_equal(got_d, ref_d)


def test_quant_zero_at_high_qp():
    small = np.full((1, 8, 8), 3, np.int32)
    lv = quant.quantize_np(small, 51)
    assert np.all(lv == 0)


def test_full_coding_chain_distortion_reasonable():
    """fwd -> quant -> dequant -> inv at QP 22 keeps error small."""
    rng = np.random.RandomState(0)
    resi = (rng.randn(4, 8, 8) * 30).astype(np.int32)
    coef = transforms.forward_transform_np(resi)
    lv = quant.quantize_np(coef, 22)
    deq = quant.dequantize_np(lv, 22)
    rec = transforms.inverse_transform_np(deq)
    rmse = np.sqrt(((rec - resi) ** 2).mean())
    assert rmse < 6.0, rmse


def test_chroma_qp_table():
    assert quant.chroma_qp(20) == 20
    assert quant.chroma_qp(29) == 29
    assert quant.chroma_qp(30) == 29
    assert quant.chroma_qp(33) == 32
    assert quant.chroma_qp(43) == 37
    assert quant.chroma_qp(45) == 39


# ---------------------------------------------------------------------------
# Intra prediction
# ---------------------------------------------------------------------------

def _random_refs(rng, n, batch=4):
    r = rng.randint(0, 256, size=(batch, 4 * n + 1)).astype(np.int32)
    return r


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_intra_jax_matches_numpy_all_modes(n):
    rng = np.random.RandomState(n)
    r = _random_refs(rng, n)
    allp = np.asarray(jax.jit(
        lambda x: intra.predict_all_modes(x, n))(jnp.asarray(r)))
    for mode in range(35):
        ref = intra.predict_np(r, mode, n, component="luma")
        np.testing.assert_array_equal(allp[:, mode], ref,
                                      err_msg=f"mode {mode} n {n}")


def test_intra_dc_flat_refs():
    n = 8
    r = np.full((1, 4 * n + 1), 100, np.int32)
    pred = intra.predict_np(r, intra.DC, n)
    assert np.all(pred == 100)
    pred_pl = intra.predict_np(r, intra.PLANAR, n)
    assert np.all(pred_pl == 100)


def test_intra_vertical_copies_top():
    n = 8
    rng = np.random.RandomState(1)
    r = _random_refs(rng, n, batch=1)
    pred = intra.predict_np(r, intra.VER, n, component="chroma")
    top = r[:, 2 * n + 1:2 * n + 1 + n]
    for y in range(n):
        np.testing.assert_array_equal(pred[:, y, :], top)


def test_intra_horizontal_copies_left():
    n = 8
    rng = np.random.RandomState(2)
    r = _random_refs(rng, n, batch=1)
    pred = intra.predict_np(r, intra.HOR, n, component="chroma")
    left = r[:, 2 * n - 1::-1][:, :n]
    for x in range(n):
        np.testing.assert_array_equal(pred[:, :, x], left)


def test_intra_mode2_diagonal():
    """Mode 2 (angle +32, horizontal family) reads the down-left diagonal."""
    n = 4
    r = np.arange(4 * n + 1, dtype=np.int32)[None] * 3
    pred = intra.predict_np(r, 2, n, component="chroma")
    # pred[y][x] = left[x + y + 1] (pure diagonal shift)
    left = r[0, 2 * n - 1::-1]
    for y in range(n):
        for x in range(n):
            assert pred[0, y, x] == left[x + y + 1]


def test_substitution_fill():
    n = 4
    r = np.zeros((3, 4 * n + 1), np.int32)
    avail = np.zeros((3, 4 * n + 1), bool)
    # case 0: nothing available -> 128
    # case 1: only corner available -> everything = corner value
    r[1, 2 * n] = 77
    avail[1, 2 * n] = True
    # case 2: head unavailable, middle available
    r[2, 5] = 10
    r[2, 9] = 20
    avail[2, 5] = True
    avail[2, 9] = True
    ref = intra.substitute_refs_np(r, avail)
    got = np.asarray(intra.substitute_refs(jnp.asarray(r), jnp.asarray(avail)))
    np.testing.assert_array_equal(got, ref)
    assert np.all(ref[0] == 128)
    assert np.all(ref[1] == 77)
    # head + forward fill: indices 0..8 inherit 10, 9.. inherit 20
    assert np.all(ref[2, :9] == 10)
    assert np.all(ref[2, 9:] == 20)


def test_filter_refs_parity():
    rng = np.random.RandomState(3)
    r = rng.randint(0, 256, size=(2, 33)).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(intra.filter_refs(jnp.asarray(r))),
        intra.filter_refs_np(r))


def test_ref_filter_flag_rules():
    assert not intra.ref_filter_flag(intra.DC, 16)
    assert not intra.ref_filter_flag(10, 16)
    assert not intra.ref_filter_flag(2, 4)
    assert intra.ref_filter_flag(2, 8)
    assert not intra.ref_filter_flag(9, 8)
    assert intra.ref_filter_flag(9, 16) is False  # dist 1 == thres 1
    assert intra.ref_filter_flag(8, 16)
    assert intra.ref_filter_flag(25, 32)
    assert not intra.ref_filter_flag(26, 32)


# ---------------------------------------------------------------------------
# Cost
# ---------------------------------------------------------------------------

def test_satd_parity_and_zero():
    rng = np.random.RandomState(5)
    a = rng.randint(0, 256, (3, 16, 16)).astype(np.int32)
    b = rng.randint(0, 256, (3, 16, 16)).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(jax.jit(cost.satd)(jnp.asarray(a), jnp.asarray(b))),
        cost.satd_np(a, b))
    assert np.all(np.asarray(cost.satd(jnp.asarray(a), jnp.asarray(a))) == 0)
    np.testing.assert_array_equal(
        np.asarray(cost.sad(jnp.asarray(a), jnp.asarray(b))),
        np.abs(a.astype(np.int64) - b).sum((-2, -1)))


@pytest.mark.parametrize("n", [8, 16, 32])
def test_predict_selected_modes_matches_reference(n):
    rng = np.random.RandomState(n + 1)
    B = 12
    r = rng.randint(0, 256, size=(B, 4 * n + 1)).astype(np.int32)
    modes = rng.randint(0, 35, size=(B,)).astype(np.int32)
    got = np.asarray(jax.jit(
        lambda rr, mm: intra.predict_selected_modes(rr, mm, n))(
        jnp.asarray(r), jnp.asarray(modes)))
    for b in range(B):
        ref = intra.predict_np(r[b:b + 1], int(modes[b]), n,
                               component="luma")[0]
        np.testing.assert_array_equal(got[b], ref, err_msg=f"b={b}")


def test_predict_one_mode_matches_reference():
    n = 16
    rng = np.random.RandomState(5)
    r = rng.randint(0, 256, size=(1, 4 * n + 1)).astype(np.int32)
    for mode in (0, 1, 2, 10, 17, 26, 34):
        got = np.asarray(intra.predict_one_mode(
            jnp.asarray(r[0]), jnp.int32(mode), n))
        ref = intra.predict_np(r, mode, n, component="luma")[0]
        np.testing.assert_array_equal(got, ref, err_msg=f"mode={mode}")


def test_select_filtered_batch():
    n = 16
    rng = np.random.RandomState(6)
    r = rng.randint(0, 256, (3, 4 * n + 1)).astype(np.int32)
    rf = intra.filter_refs_np(r)
    modes = np.array([1, 18, 26], np.int32)  # DC: unfiltered; 18: filt; 26: unfilt
    out = np.asarray(intra.select_filtered_batch(
        jnp.asarray(r), jnp.asarray(rf), jnp.asarray(modes), n))
    np.testing.assert_array_equal(out[0], r[0])
    np.testing.assert_array_equal(out[1], rf[1])
    np.testing.assert_array_equal(out[2], r[2])
