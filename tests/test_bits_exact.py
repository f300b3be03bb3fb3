"""ops/bits_exact: vectorized frozen-state CABAC rate == counting oracle.

The oracle drives the real residual-syntax encoder
(entropy/residual.code_residual) with a duck-typed bin counter that
charges ENTROPY_BITS at the *initial* context state of every bin
(adaptation disabled) — exactly the model tu_bits_exact vectorizes.
"""

import numpy as np
import pytest

from hevc_tpu.entropy import residual, scan as scanlib
from hevc_tpu.entropy.cabac import ENTROPY_BITS
from hevc_tpu.entropy.contexts import ContextModels
from hevc_tpu.ops.bits_exact import tu_bits_exact


class FrozenCounter:
    """CabacEncoder twin: accumulates init-state fractional bits."""

    def __init__(self, ctx):
        self.ctx = ctx
        self.bits = 0.0

    def encode_bin(self, ctx, idx, v):
        s = int(self.ctx.state[idx])
        m = int(self.ctx.mps[idx])
        self.bits += float(ENTROPY_BITS[s, int(v != m)]) / 32768.0

    def encode_bypass(self, v):
        self.bits += 1.0

    def encode_bypass_bins(self, value, nbits):
        self.bits += nbits


def oracle_bits(levels, qp, is_luma, scan_type, init_type=0):
    if not np.any(levels):
        return 0.0
    import os
    ctx = ContextModels(init_type, qp)
    if os.environ.get("HEVC_TPU_BITS_STATES", "adapted") == "adapted":
        # mirror ops/bits_exact._tables: frozen *adapted* states
        from hevc_tpu.ops import adapted_states as ast
        state, mps = ast.adapted_states(int(qp), int(init_type))
        ctx.state[:] = state
        ctx.mps[:] = mps
    cnt = FrozenCounter(ctx)
    residual.code_residual(cnt, ctx, levels, is_luma=is_luma,
                           scan_type=scan_type)
    return cnt.bits


def make_corpus(n_tus=60, seed=0, sizes=(4, 8, 16, 32)):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_tus):
        n = int(rng.choice(sizes))
        kind = rng.randint(0, 5)
        lvl = np.zeros((n, n), np.int32)
        if kind == 0:
            lvl = rng.randint(-2, 3, (n, n))
        elif kind == 1:      # sparse small
            for _ in range(rng.randint(1, 5)):
                lvl[rng.randint(0, n), rng.randint(0, n)] = \
                    rng.randint(-3, 4)
        elif kind == 2:      # large values (escape / rice adaptation)
            for _ in range(rng.randint(1, 8)):
                lvl[rng.randint(0, n), rng.randint(0, n)] = \
                    rng.randint(-3000, 3000)
        elif kind == 3:      # dense low-freq block
            k = max(1, n // 4)
            lvl[:k, :k] = rng.randint(-20, 21, (k, k))
        else:                # DC only (CG inference paths)
            lvl[rng.randint(0, 2) * (n // 2), 0] = rng.randint(1, 3)
        out.append(lvl.astype(np.int32))
    return out


@pytest.mark.parametrize("is_luma", [True, False])
@pytest.mark.parametrize("scan_type",
                         [scanlib.SCAN_DIAG, scanlib.SCAN_HOR,
                          scanlib.SCAN_VER])
def test_bits_exact_matches_oracle(is_luma, scan_type):
    sizes = (4, 8) if scan_type != scanlib.SCAN_DIAG else (4, 8, 16, 32)
    corpus = make_corpus(48, seed=scan_type * 2 + is_luma, sizes=sizes)
    qp = 32
    for n in sizes:
        group = [l for l in corpus if l.shape[0] == n]
        if not group:
            continue
        batch = np.stack(group)
        got = np.asarray(tu_bits_exact(batch, qp=qp, is_luma=is_luma,
                                       scan_type=scan_type))
        want = np.array([oracle_bits(l, qp, is_luma, scan_type)
                         for l in group])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=0.02,
                                   err_msg=f"n={n}")


def test_bits_exact_qp_and_slice_type():
    corpus = make_corpus(24, seed=7, sizes=(8, 16))
    for qp, init_type in ((22, 0), (37, 1)):
        for l in corpus:
            got = float(tu_bits_exact(l[None], qp=qp, is_luma=True,
                                      init_type=init_type)[0])
            want = oracle_bits(l, qp, True, scanlib.SCAN_DIAG, init_type)
            assert abs(got - want) < max(0.02, 2e-4 * want), \
                (qp, init_type, got, want)


def test_bits_exact_zero_tu():
    z = np.zeros((2, 8, 8), np.int32)
    out = np.asarray(tu_bits_exact(z, qp=32))
    np.testing.assert_array_equal(out, [0.0, 0.0])
