"""Syntax-aware coefficient-rate estimator (ops/bits.py) accuracy."""

import numpy as np
import jax.numpy as jnp

from hevc_tpu.ops import bits as bits_lib


def _exact_bits(levels, qp, is_luma):
    from tools.calibrate_bits import CountingCabac
    from hevc_tpu.entropy import residual
    from hevc_tpu.entropy.contexts import ContextModels
    ctx = ContextModels(0, qp)
    enc = CountingCabac()
    residual.code_residual(enc, ctx, levels, is_luma=is_luma, scan_type=0)
    return enc.bits


def _corpus(seed, n, size):
    from hevc_tpu.ops import quant, transforms
    rng = np.random.RandomState(seed)
    out = []
    while len(out) < n:
        resi = (rng.randn(size, size) * rng.uniform(2, 30)).round()
        cf = transforms.forward_transform(
            jnp.asarray(resi.astype(np.int32))[None])[0]
        lvl = np.asarray(quant.quantize(cf[None], 32)[0])
        if (lvl != 0).any():
            out.append(lvl.astype(np.int32))
    return out


def test_tu_bits_tracks_exact_cabac():
    """Estimate within ~20% of the exact expected-bit measurement on
    average, far better than the superseded 2*log2 curve."""
    for size in (4, 8, 16, 32):
        tus = _corpus(size, 24, size)
        est = np.asarray(bits_lib.tu_bits(jnp.asarray(np.stack(tus))))
        exact = np.array([_exact_bits(t, 32, True) for t in tus])
        rel = np.abs(est - exact) / np.maximum(exact, 1.0)
        assert rel.mean() < 0.25, (size, rel.mean(), est[:4], exact[:4])


def test_tu_bits_zero_and_monotonic():
    z = jnp.zeros((2, 8, 8), jnp.int32)
    np.testing.assert_allclose(np.asarray(bits_lib.tu_bits(z)), 0.0)
    # more/larger coefficients cannot cost fewer bits
    a = np.zeros((8, 8), np.int32); a[0, 0] = 1
    b = a.copy(); b[0, 0] = 9
    c = b.copy(); c[3, 4] = 5
    va, vb, vc = (float(bits_lib.tu_bits(jnp.asarray(x)[None])[0])
                  for x in (a, b, c))
    assert 0 < va < vb < vc


def test_tu_features_counts():
    lvl = np.zeros((8, 8), np.int32)
    lvl[0, 0] = 2   # scan idx 0
    lvl[1, 1] = -1  # scan idx 4 (diag: (0,0),(0,1),(1,0),(0,2),(1,1)...)
    f = np.asarray(bits_lib.tu_features(jnp.asarray(lvl)[None]))[0]
    names = bits_lib.FEATURE_NAMES
    d = dict(zip(names, f))
    assert d["sign"] == 2
    assert d["sig1"] == 1          # nz excl last
    assert d["g1_1"] == 1 and d["g1_0"] == 1
    assert d["sig0"] == 3          # scan idx 1..3 are coded zeros
    assert d["const"] == 1
