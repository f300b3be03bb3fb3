"""ops/rdoq_trellis: exact-rate RDOQ — validity, RD gain, conformance.

The trellis quantizer's objective is alpha * ||c - deq(l)||^2 +
lambda * R(l) with R = the frozen-state CABAC rate (ops/bits_exact). The
RD test scores both quantizers under that same objective with the
*oracle* rate (tu_bits_exact, itself validated bit-exact against the
real syntax coder in test_bits_exact.py).
"""

import numpy as np
import pytest

import hevc_tpu.ops.rdoq as rdoq_lib
from hevc_tpu.ops import quant, rdoq_trellis
from hevc_tpu.ops.bits_exact import tu_bits_exact
from hevc_tpu.ops.rdoq import alpha


def _rand_coefs(rng, n, batch, scale):
    """Plausible transform coefficients: sparse, low-frequency-heavy."""
    yy, xx = np.mgrid[0:n, 0:n]
    decay = 1.0 / (1.0 + 0.35 * (xx + yy))
    c = rng.randn(batch, n, n) * scale * decay
    mask = rng.rand(batch, n, n) < 0.6
    return np.round(c * mask).astype(np.int32)


def _true_cost(levels, coefs, qp, lam, is_luma, init_type):
    deq = quant.dequantize_np(levels, qp)
    n = coefs.shape[-1]
    e = (coefs - deq).astype(np.float64)
    d = alpha(n) * (e * e).sum((-2, -1))
    bits = np.asarray(tu_bits_exact(levels, qp=qp, is_luma=is_luma,
                                    init_type=init_type))
    return d + lam * bits


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_levels_valid_and_twin(n):
    rng = np.random.RandomState(7 + n)
    coefs = _rand_coefs(rng, n, 24, scale=300.0)
    qp = 27
    lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
    lv = np.asarray(rdoq_trellis.rd_quantize_trellis(coefs, qp, lam))
    # sign preservation + magnitude bound (never above round-half level)
    hi = quant.quantize_np(coefs, qp, is_intra=True)  # dead-zone <= round
    assert np.all(lv * coefs >= 0)
    assert np.all(np.abs(lv) <= np.abs(hi) + 1)
    lv_np = rdoq_trellis.rd_quantize_trellis_np(coefs, qp, lam)
    np.testing.assert_array_equal(lv, lv_np)


@pytest.mark.parametrize("qp,is_luma,init_type",
                         [(22, True, 0), (32, True, 1), (37, False, 0)])
def test_rd_beats_lite(qp, is_luma, init_type):
    rng = np.random.RandomState(qp)
    lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
    worse = 0
    total_t = total_l = 0.0
    for n, scale in ((8, 200.0), (16, 400.0), (32, 800.0)):
        coefs = _rand_coefs(rng, n, 16, scale=scale)
        lt = np.asarray(rdoq_trellis.rd_quantize_trellis(
            coefs, qp, lam, is_luma=is_luma, init_type=init_type))
        ll = rdoq_lib.rd_quantize_np(coefs, qp, lam)
        ct = _true_cost(lt, coefs, qp, lam, is_luma, init_type)
        cl = _true_cost(ll, coefs, qp, lam, is_luma, init_type)
        total_t += ct.sum()
        total_l += cl.sum()
        worse += int((ct > cl * 1.05).sum())
    # aggregate: exact-rate trellis must win under its own true objective
    assert total_t <= total_l * 1.001, (total_t, total_l)
    # and essentially never lose badly on an individual TU
    assert worse <= 2, worse


def test_e2e_conformance_trellis(tmp_path, monkeypatch):
    from hevc_tpu.evaltools import hm
    if not hm.decoder_available():
        pytest.skip("HM decoder not built")
    monkeypatch.setattr(rdoq_lib, "RDOQ_MODEL", "trellis")
    from test_e2e_bitstream import synth_frame, roundtrip
    from hevc_tpu.entropy.headers import EncoderConfig
    f = synth_frame(128, 64, seed=3)
    cfg = EncoderConfig(width=128, height=64, qp=32)
    rng = np.random.RandomState(0)

    def rand_tree(d8, y, x, size, depth):
        if depth < 3 and rng.rand() < 0.5:
            h = size // 2
            for dy, dx in ((0, 0), (0, h), (h, 0), (h, h)):
                rand_tree(d8, y + dy, x + dx, h, depth + 1)
        else:
            d8[y // 8:(y + size) // 8, x // 8:(x + size) // 8] = depth

    def depth_fn(i, fr):
        d8 = np.zeros((8, 16), np.int32)
        for cy in (0,):
            for cx in (0, 64):
                rand_tree(d8, cy, cx, 64, 0)
        return d8

    roundtrip([f], cfg, depth_fn, tmp_path)
