"""Frame-level max-depth early exit: a narrower compiled search must
reproduce the full program's decisions/stream whenever the HCPM gates
close the deep levels frame-wide (the TPU analogue of the reference's
per-CU RD-check skipping, TEncCu.cpp:862-873)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hevc_tpu.entropy.headers import EncoderConfig
from hevc_tpu.models import eth_cnn, hcpm
from hevc_tpu.pipeline import search
from hevc_tpu.pipeline.ai import AIEncoder

from tests.test_e2e_bitstream import synth_frame


def _plane(w, h, seed=0):
    r = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    y = 90 + 60 * np.sin(xx / 23.0) + r.randint(-20, 20, (h, w))
    return np.clip(y, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("node_probs,exp_md", [
    ((0.1, 0.1, 0.1), 0),    # every gate closed -> 64x64 leaves only
    ((0.9, 0.1, 0.1), 1),    # split-only at 64, closed below
    ((0.9, 0.9, 0.1), 2),
])
def test_narrow_search_matches_full(node_probs, exp_md):
    w = h = 128
    y = _plane(w, h)
    origins = jnp.asarray(search.ctu_grid(w, h))
    B = origins.shape[0]
    probs = np.empty((B, 21), np.float32)
    probs[:, 0] = node_probs[0]
    probs[:, 1:5] = node_probs[1]
    probs[:, 5:21] = node_probs[2]
    probs = jnp.asarray(probs)
    thr = hcpm.DEFAULT_AI
    kw = dict(pad_w=w, pad_h=h, n_ctu_x=w // 64, qp=32,
              thr_up=thr.up, thr_down=thr.down)
    full = search.search_frame(y, origins, hcpm_probs=probs, **kw)
    narrow = search.search_frame(y, origins, hcpm_probs=probs,
                                 max_depth=exp_md, **kw)
    np.testing.assert_array_equal(np.asarray(full.depth8),
                                  np.asarray(narrow.depth8))
    assert int(np.asarray(full.depth8).max()) <= exp_md
    np.testing.assert_array_equal(np.asarray(full.modes8),
                                  np.asarray(narrow.modes8))
    np.testing.assert_array_equal(np.asarray(full.modes4),
                                  np.asarray(narrow.modes4))


def test_ai_encoder_early_exit_stream_identical():
    cfg = EncoderConfig(width=128, height=128, qp=32)
    params = eth_cnn.init_params(__import__("jax").random.PRNGKey(0))
    frames = [synth_frame(128, 128, seed=s) for s in range(2)]

    B = cfg.ctus_x * cfg.ctus_y
    fixed = np.full((B, 21), 0.1, np.float32)
    fixed[:, 0] = 0.9            # split 64 -> 32, nothing deeper

    def run(early):
        enc = AIEncoder(cfg, cnn_params=params, max_depth_exit=early)
        enc.predict_hcpm = lambda y_pad, qp=None: jnp.asarray(fixed)
        assert (not early) or enc._gate_max_depth(jnp.asarray(fixed)) == 1
        stream, recons, _ = enc.encode(frames)
        return stream, recons

    s_full, _ = run(False)
    s_narrow, _ = run(True)
    assert s_full == s_narrow


def test_forced_depth_floor():
    assert search.forced_depth_floor(128, 128) == 0
    assert search.forced_depth_floor(416, 256) == 1   # 416 % 64 = 32
    assert search.forced_depth_floor(416, 240) == 2   # 240 % 32 = 16
    assert search.forced_depth_floor(120, 120) == 3


def test_narrow_psearch_matches_full():
    """Inter-search (LDP) max-depth narrowing reproduces the full
    program's decisions when the gates close the deep levels."""
    import jax.numpy as jnp
    from hevc_tpu.pipeline import psearch

    w = h = 128
    cur = _plane(w, h, seed=1).astype(np.int32)
    ref = np.roll(cur, 2, axis=1)
    cb = np.full((h // 2, w // 2), 120, np.int32)
    cr = np.full((h // 2, w // 2), 130, np.int32)
    origins = jnp.asarray(search.ctu_grid(w, h))
    B = origins.shape[0]
    probs = np.full((B, 21), 0.1, np.float32)
    probs[:, 0] = 0.9            # split 64 only
    probs = jnp.asarray(probs)
    thr = hcpm.DEFAULT_LDP
    kw = dict(qp=32, pad_w=w, pad_h=h, hcpm_probs=probs,
              thr_up=thr.up, thr_down=thr.down)
    full = psearch.p_search_frame(cur, cb, cr, ref, cb, cr, origins, **kw)
    narrow = psearch.p_search_frame(cur, cb, cr, ref, cb, cr, origins,
                                    max_depth=1, **kw)
    np.testing.assert_array_equal(np.asarray(full.depth8),
                                  np.asarray(narrow.depth8))
    assert int(np.asarray(full.depth8).max()) <= 1
    np.testing.assert_array_equal(np.asarray(full.mv8),
                                  np.asarray(narrow.mv8))
    np.testing.assert_array_equal(np.asarray(full.coef_y),
                                  np.asarray(narrow.coef_y))
    np.testing.assert_array_equal(np.asarray(full.rec_y),
                                  np.asarray(narrow.rec_y))
