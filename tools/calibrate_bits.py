#!/usr/bin/env python
"""Calibrate ops/bits.py per-event weights against the exact CABAC coder.

Method (HM TEncBinCoderCABACCounter analogue): encode a corpus of
realistic quantized TUs with the real residual-syntax coder, but measure
fractional bits from ENTROPY_BITS at each bin's current context state
(context adaptation still applied within a TU) — then least-squares fit
the ops/bits.tu_features weights to those exact measurements.

Usage: python tools/calibrate_bits.py [--n 4000]
Prints the WEIGHTS_LUMA / WEIGHTS_CHROMA arrays to paste into ops/bits.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import hevc_tpu

hevc_tpu.enable_compilation_cache()


class CountingCabac:
    """Duck-typed CabacEncoder that accumulates expected fractional bits
    (ENTROPY_BITS at the current state) instead of writing a stream."""

    def __init__(self):
        from hevc_tpu.entropy import cabac
        self._eb = cabac.ENTROPY_BITS
        self._trans_lps = cabac.TRANS_IDX_LPS
        self.bits = 0.0

    def encode_bin(self, ctx, idx, bin_val):
        state = int(ctx.state[idx])
        mps = int(ctx.mps[idx])
        is_lps = int(bin_val != mps)
        self.bits += self._eb[state, is_lps] / 32768.0
        if is_lps:
            if state == 0:
                ctx.mps[idx] = 1 - mps
            ctx.state[idx] = self._trans_lps[state]
        elif state < 62:
            ctx.state[idx] = state + 1

    def encode_bypass(self, bin_val):
        self.bits += 1.0

    def encode_bypass_bins(self, value, nbits):
        self.bits += nbits

    def encode_terminate(self, bin_val):
        self.bits += 1.0


def make_corpus(n_tus, seed=0):
    """Quantized TUs with realistic magnitude/sparsity distributions."""
    from hevc_tpu.ops import quant, transforms
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    out = []  # (levels [n,n], qp)
    for _ in range(n_tus):
        n = int(rng.choice([4, 8, 16, 32]))
        qp = int(rng.choice([22, 27, 32, 37]))
        kind = rng.randint(0, 4)
        if kind == 0:      # white noise residue
            resi = rng.randn(n, n) * rng.uniform(1, 40)
        elif kind == 1:    # low-frequency (smooth gradient misprediction)
            yy, xx = np.mgrid[0:n, 0:n] / n
            resi = (rng.randn() * 60 * xx + rng.randn() * 60 * yy
                    + rng.randn() * 20 * xx * yy)
        elif kind == 2:    # edge
            resi = np.where(np.arange(n)[None, :] > rng.randint(0, n),
                            rng.uniform(-60, 60), 0.0) \
                + rng.randn(n, n) * 3
        else:              # sparse impulses
            resi = np.zeros((n, n))
            for _ in range(rng.randint(1, 6)):
                resi[rng.randint(0, n), rng.randint(0, n)] = \
                    rng.uniform(-200, 200)
        cf = transforms.forward_transform(
            jnp.asarray(resi.round().astype(np.int32))[None])[0]
        lvl = np.asarray(quant.quantize(cf[None], qp)[0])
        if (lvl != 0).any():
            out.append((lvl.astype(np.int32), qp))
    return out


def exact_bits(levels, qp, is_luma):
    from hevc_tpu.entropy import residual
    from hevc_tpu.entropy.contexts import ContextModels
    ctx = ContextModels(0, qp)   # I-slice inits
    enc = CountingCabac()
    residual.code_residual(enc, ctx, levels, is_luma=is_luma, scan_type=0)
    return enc.bits


def fit(corpus, is_luma):
    from hevc_tpu.ops import bits as bits_lib
    import jax.numpy as jnp
    # batch feature extraction per TU size (one compile per size)
    feats = [None] * len(corpus)
    for n in (4, 8, 16, 32):
        idx = [i for i, (l, _) in enumerate(corpus) if l.shape[0] == n]
        if not idx:
            continue
        batch = jnp.asarray(np.stack([corpus[i][0] for i in idx]))
        f = np.asarray(bits_lib.tu_features(batch))
        for j, i in enumerate(idx):
            feats[i] = f[j]
    ys = [exact_bits(lvl, qp, is_luma) for lvl, qp in corpus]
    X = np.stack(feats)
    y = np.asarray(ys)
    # Weighted ridge toward analytic priors: relative-error weighting
    # (small TUs dominate RD decisions at high QP); the prior keeps
    # collinear event classes (sign vs sig1, cg vs sig counts) at their
    # physically sensible costs instead of letting the fit shuffle bits
    # between them, so the estimate stays calibrated out-of-distribution.
    prior = np.array([0.7, 1.2, 0.8, 1.6, 1.0, 0.5, 2.0, 1.0, 1.0,
                      0.9, 1.0, 0.6, 1.4, 2.0])
    rw = 1.0 / np.maximum(y, 8.0)
    lam_r = 0.05 * len(y) ** 0.5
    Xa = np.concatenate([X * rw[:, None], lam_r * np.eye(X.shape[1])])
    ya = np.concatenate([y * rw, lam_r * prior])
    w, *_ = np.linalg.lstsq(Xa, ya, rcond=None)
    w = np.maximum(w, 0.0)
    pred = X @ w
    err = pred - y
    rel = np.abs(err) / np.maximum(y, 1.0)
    print(f"{'luma' if is_luma else 'chroma'}: n={len(y)} "
          f"rms={np.sqrt((err ** 2).mean()):.2f} bits "
          f"mean-rel={rel.mean() * 100:.1f}% p90-rel={np.percentile(rel, 90) * 100:.1f}%")
    return w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4000)
    args = ap.parse_args()
    corpus = make_corpus(args.n)
    for is_luma in (True, False):
        w = fit(corpus, is_luma)
        name = "WEIGHTS_LUMA" if is_luma else "WEIGHTS_CHROMA"
        vals = ", ".join(f"{v:.4f}" for v in w)
        print(f"{name} = np.array([{vals}], np.float32)")


if __name__ == "__main__":
    main()
