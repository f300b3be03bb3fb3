"""Rectangular inter PUs (2NxN / Nx2N): search, entropy, decode, HM.

Behavioral counterparts: HM TEncSearch.cpp:2912 predInterSearch PU-shape
loop, TEncCu.cpp:1399 xCheckRDCostInter(SIZE_2NxN/SIZE_Nx2N), spec
8.5.3.2.3 second-PU merge exclusions, 7.4.9.8 interSplitFlag.
"""

import os
import subprocess

import numpy as np
import pytest

from hevc_tpu.core.yuv import Frame, read_yuv420
from hevc_tpu.entropy import motion
from hevc_tpu.entropy.headers import EncoderConfig

HM_DEC = "/root/repo/tools/hm/TAppDecoderStatic"


def shear_clip(n, w, h, seed=5):
    """Opposite-motion halves -> rectangular PUs become attractive."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 100 + 50 * np.sin(xx / 17.0) * np.cos(yy / 11.0)
    tex = rng.randint(-15, 16, (h, w)).astype(np.float32)
    out = []
    for t in range(n):
        y = base + tex
        y[:h // 2] = np.roll(y[:h // 2], 3 * t, axis=1)
        y[h // 2:] = np.roll(y[h // 2:], -3 * t, axis=1)
        y[:, :w // 4] = np.roll(y[:, :w // 4], 2 * t, axis=0)
        y = np.clip(y, 0, 255).astype(np.uint8)
        cb = np.full((h // 2, w // 2), 120, np.uint8)
        cr = np.full((h // 2, w // 2), 135, np.uint8)
        out.append(Frame(y, cb, cr))
    return out


def test_merge_candidate_pu1_exclusions():
    """8.5.3.2.3: PU1 of 2NxN excludes B1; PU1 of Nx2N excludes A1.
    6.4.2: same-CB PU0 positions ARE available to PU1 (AMVP uses them)."""
    import hevc_tpu.core.zorder as zorder
    W = H = 64
    zmap = zorder.frame_zmap(W, H)
    mv8 = np.zeros((8, 8, 2), np.int32)
    mv8[:, :, 0] = np.arange(8)[None, :] * 4         # distinct per column
    mv8[:, :, 1] = np.arange(8)[:, None] * 4
    field = motion.MotionField(mv8, None, W, H, zmap)

    # 2NxN PU1 of the 16x16 CU at (16, 16): PU at (16, 24) 16x8.
    # B1 = (31, 23) is inside PU0 -> excluded from MERGE...
    c = motion.merge_candidates(field, 16, 24, 16, 1, w=16, h=8,
                                part_mode=1, part_idx=1)
    at = motion._pu_aware_at(field, int(zmap[24 >> 2, 16 >> 2]),
                             16, 24, 16, 1, 1)
    b1 = at(31, 23)
    assert b1 is not None            # ...but AVAILABLE per 6.4.2
    assert b1 not in c[:2]           # merge list skipped it
    # ...while AMVP's B-scan may use it
    mvps = motion.amvp_candidates(field, 16, 24, 16, 8, 0, [0], 1,
                                  cu_size=16, part_mode=1, part_idx=1)
    assert (b1[0], b1[1]) in mvps

    # Nx2N PU1 at (24, 16) 8x16: A1 = (23, 31) inside PU0 -> merge
    # excludes it; the plain z-map lookup would also (wrongly) hide it,
    # the PU-aware lookup must not.
    at2 = motion._pu_aware_at(field, int(zmap[16 >> 2, 24 >> 2]),
                              24, 16, 16, 2, 1)
    a1 = at2(23, 31)
    assert a1 is not None
    assert field.at(23, 31, int(zmap[16 >> 2, 24 >> 2])) is None
    c2 = motion.merge_candidates(field, 24, 16, 16, 1, w=8, h=16,
                                 part_mode=2, part_idx=1)
    assert a1 not in c2[:1]


@pytest.mark.slow
def test_rect_pu_e2e_hm(tmp_path):
    """Shear content selects rect PUs; stream decodes in our decoder AND
    the HM reference decoder, byte-exact to the encoder recon."""
    from hevc_tpu.pipeline.pframe import LDPEncoder

    cfg = EncoderConfig(width=128, height=128, qp=32, num_refs=2)
    frames = shear_clip(3, 128, 128)
    enc = LDPEncoder(cfg, rect_pu=True)
    stream, recons = enc.encode(frames)

    from hevc_tpu.decoder import top as dtop
    r = dtop.decode_annexb(stream)
    for i, (d, rc) in enumerate(zip(r.frames, recons)):
        assert np.array_equal(d.y, rc.y), f"luma mismatch poc {i}"
        assert np.array_equal(d.cb, rc.cb), f"cb mismatch poc {i}"
        assert np.array_equal(d.cr, rc.cr), f"cr mismatch poc {i}"

    if not os.path.exists(HM_DEC):
        pytest.skip("HM decoder not built")
    bs = tmp_path / "rect.bin"
    bs.write_bytes(stream)
    out = tmp_path / "rect.yuv"
    p = subprocess.run([HM_DEC, "-b", str(bs), "-o", str(out)],
                       capture_output=True, text=True)
    assert p.returncode == 0, p.stdout + p.stderr
    assert "mismatch" not in (p.stdout + p.stderr).lower()
    dec = read_yuv420(str(out), 128, 128)
    for i, (d, rc) in enumerate(zip(dec, recons)):
        assert np.array_equal(d.y, rc.y), f"HM luma mismatch poc {i}"
