"""End-to-end conformance: golden encoder -> HM-16.5 reference decoder.

The decisive oracle: the reference decoder must decode our bitstream and
produce EXACTLY our reconstruction (byte-compare of the decoded YUV), with
the decoded-picture-hash MD5 SEI verifying per picture.
"""

import os

import numpy as np
import pytest

from hevc_tpu.core.yuv import Frame, read_yuv420, pad_frame
from hevc_tpu.entropy import headers
from hevc_tpu.pipeline import golden
from hevc_tpu.evaltools import hm

pytestmark = pytest.mark.skipif(not hm.decoder_available(),
                                reason="HM decoder not built")


def synth_frame(width, height, seed=0):
    """Synthetic natural-ish content: gradients + blobs + noise."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    y = (96 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
         + 40 * (xx / width) + rng.randn(height, width) * 6)
    for _ in range(6):
        cx, cy = rng.randint(0, width), rng.randint(0, height)
        r = rng.randint(8, 40)
        amp = rng.randint(-60, 60)
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2
        y += amp * np.exp(-d2 / (2 * r * r))
    y = np.clip(y, 0, 255).astype(np.uint8)
    cb = np.clip(128 + 30 * np.sin(xx[::2, ::2] / 31.0)
                 + rng.randn(height // 2, width // 2) * 3, 0, 255
                 ).astype(np.uint8)
    cr = np.clip(128 - 25 * np.cos(yy[::2, ::2] / 29.0)
                 + rng.randn(height // 2, width // 2) * 3, 0, 255
                 ).astype(np.uint8)
    return Frame(y, cb, cr)


def roundtrip(frames, cfg, depth8_fn, tmp_path):
    stream, recons = golden.encode_sequence(frames, cfg, depth8_fn)
    rc, log, rec_path = hm.decode_bytes(stream, str(tmp_path))
    assert rc == 0, f"HM decoder failed:\n{log}"
    assert "md5 mismatch" not in log.lower(), log
    dec = read_yuv420(rec_path, cfg.width, cfg.height)
    assert len(dec) == len(frames), (len(dec), len(frames), log)
    for i, (d, r) in enumerate(zip(dec, recons)):
        np.testing.assert_array_equal(
            d.y, r.y[:cfg.height, :cfg.width],
            err_msg=f"luma mismatch frame {i}")
        np.testing.assert_array_equal(
            d.cb, r.cb[:cfg.height // 2, :cfg.width // 2],
            err_msg=f"cb mismatch frame {i}")
        np.testing.assert_array_equal(
            d.cr, r.cr[:cfg.height // 2, :cfg.width // 2],
            err_msg=f"cr mismatch frame {i}")
    return stream, recons, log


def test_single_ctu_depth0(tmp_path):
    cfg = headers.EncoderConfig(width=64, height=64, qp=32)
    frames = [synth_frame(64, 64)]
    depth_fn = lambda i, f: np.zeros((8, 8), np.int32)
    roundtrip(frames, cfg, depth_fn, tmp_path)


def test_single_ctu_all_depths(tmp_path):
    cfg = headers.EncoderConfig(width=64, height=64, qp=32)
    frames = [synth_frame(64, 64, seed=3)]

    def depth_fn(i, f):
        d = np.zeros((8, 8), np.int32)
        d[:4, 4:] = 1      # top-right 32 at depth 1
        d[4:, :4] = 2      # bottom-left: 16s
        d[4:, 4:] = 3      # bottom-right: 8s
        d[:4, :4] = 1
        return d
    roundtrip(frames, cfg, depth_fn, tmp_path)


def test_multi_ctu_frame(tmp_path):
    cfg = headers.EncoderConfig(width=128, height=128, qp=27)
    frames = [synth_frame(128, 128, seed=5)]

    def depth_fn(i, f):
        rng = np.random.RandomState(42 + i)
        d16 = rng.randint(0, 4, (8, 8))
        # legalize: a quadtree depth map must be constant over parents
        d8 = np.repeat(np.repeat(d16, 2, 0), 2, 1)
        return legalize_depth(d8)
    roundtrip(frames, cfg, depth_fn, tmp_path)


def legalize_depth(d8):
    """Make an arbitrary depth map a valid quadtree labeling: depth d
    regions must tile 2^(6-d) blocks."""
    d8 = d8.copy()
    h8, w8 = d8.shape
    for y0 in range(0, h8, 8):
        for x0 in range(0, w8, 8):
            blk = d8[y0:y0 + 8, x0:x0 + 8]
            fix_quadtree(blk, 0)
    return d8


def fix_quadtree(blk, depth):
    n = blk.shape[0]
    if depth >= 3 or n == 1:
        blk[:] = min(depth, 3)
        return
    if (blk > depth).any():
        h = n // 2
        for (dy, dx) in ((0, 0), (0, h), (h, 0), (h, h)):
            sub = blk[dy:dy + h, dx:dx + h]
            if (sub > depth).any():
                fix_quadtree(sub, depth + 1)
            else:
                sub[:] = depth + 1
    else:
        blk[:] = depth


def test_boundary_padding(tmp_path):
    """Non-multiple-of-64 dims: forced boundary splits + conformance crop."""
    cfg = headers.EncoderConfig(width=96, height=80, qp=32)
    frames = [synth_frame(96, 80, seed=7)]

    def depth_fn(i, f):
        d8 = np.ones((cfg.pad_height // 8, cfg.pad_width // 8),
                     np.int32)
        return legalize_depth(d8)
    roundtrip(frames, cfg, depth_fn, tmp_path)


def test_multi_frame_sequence(tmp_path):
    cfg = headers.EncoderConfig(width=64, height=64, qp=37)
    frames = [synth_frame(64, 64, seed=s) for s in range(3)]
    depth_fn = lambda i, f: np.full((8, 8), (i % 3), np.int32)
    roundtrip(frames, cfg, depth_fn, tmp_path)
