"""Shipped ground-truth label oracle (SURVEY.md §4 oracle d).

Opens the REAL label dumps the reference ships in AI_Info/ and
LDP_Info/ (written by HM-16.5_Extract_Data, TEncSlice.cpp:813-985) and
verifies our format assumptions + parser (train/labels.py
read_shipped_labels) against every non-pruned file:

  * CUDepth byte count == n_frames x floor(padW/16) x floor(padH/16),
  * depth values in 0..3,
  * Index rows carry constant W/H/QP matching the filename,
  * frame count consistent between Index and CUDepth,
  * per-QP label statistics move the right way (lower QP => deeper
    trees on the same content) — the semantic sanity check that the
    byte layout isn't just coincidentally divisible.

The HM-driven round-trip on locally-encoded clips lives in
tests/test_training.py (extract_labels_hm); this file covers the
*shipped* artifacts so the format contract is pinned to the reference's
own data.
"""

import glob
import os
import re

import numpy as np
import pytest

from hevc_tpu.train import labels

AI_DIR = "/root/reference/AI_Info"
LDP_DIR = "/root/reference/LDP_Info"

pytestmark = pytest.mark.skipif(not os.path.isdir(AI_DIR),
                                reason="reference not mounted")


def _stems(d):
    out = []
    for p in sorted(glob.glob(os.path.join(d, "*_CUDepth.dat"))):
        idx = p.replace("_CUDepth.dat", "_Index.dat")
        if os.path.exists(idx):
            out.append((p, idx))
    return out


def _name_fields(path):
    """(w, h, qp, nf) from the filename; w/h are None for names that
    carry a format tag (akiyo_cif, ...) instead of WxH — the Index file
    is then the sole source of dims."""
    base = os.path.basename(path)
    mq = re.search(r"_qp(\d+)_nf(\d+)_", base)
    assert mq, path
    md = re.search(r"_(\d+)x(\d+)", base)
    w, h = (int(md.group(1)), int(md.group(2))) if md else (None, None)
    return w, h, int(mq.group(1)), int(mq.group(2))


@pytest.mark.parametrize("d", [AI_DIR, LDP_DIR])
def test_shipped_label_files_parse(d):
    if not os.path.isdir(d):
        pytest.skip(f"{d} absent")
    pairs = _stems(d)
    assert pairs, f"no CUDepth/Index pairs in {d}"
    n_checked = 0
    for cu_path, idx_path in pairs:
        w, h, qp, nf = _name_fields(cu_path)
        lab, index = labels.read_shipped_labels(cu_path, idx_path)
        pocs, iw, ih, iqps, _src = index
        # Index fields match the filename; AI is constant-QP, LDP
        # records base + GOP-4 slice offsets (0..+3, POC 0 at base)
        if w is not None:
            assert (iw, ih) == (w, h), cu_path
        assert iqps[0] == qp, cu_path
        assert np.all((iqps >= qp) & (iqps <= qp + 3)), idx_path
        # byte layout: frames x floor(pad/16) units, values 0..3
        pw, ph = -(-iw // 8) * 8, -(-ih // 8) * 8
        assert lab.shape[1:] == (ph // 16, pw // 16), cu_path
        assert lab.max() <= 3, cu_path
        # frame counts: CUDepth frames == Index rows; the filename's
        # nf is the *configured* count (a pruned/truncated dump may
        # hold fewer, never more)
        assert lab.shape[0] == len(pocs), cu_path
        assert lab.shape[0] <= nf, cu_path
        assert pocs[0] == 0 and np.all(np.diff(pocs) > 0), idx_path
        n_checked += 1
    assert n_checked >= 4


def test_depth_monotonic_in_qp_ai():
    """Same content at lower QP must partition deeper on average
    (more residual detail survives => more splits). Checked per
    sequence group across its shipped QP set."""
    pairs = _stems(AI_DIR)
    groups = {}
    for cu_path, idx_path in pairs:
        w, h, qp, nf = _name_fields(cu_path)
        key = re.sub(r"Info_\d+_\d+_", "", os.path.basename(cu_path))
        key = key.replace(f"qp{qp}_", "")
        lab, _ = labels.read_shipped_labels(cu_path, idx_path)
        groups.setdefault(key, {})[qp] = float(lab.mean())
    checked = 0
    for key, byqp in groups.items():
        if len(byqp) < 2:
            continue
        qps = sorted(byqp)
        # strictly decreasing mean depth as QP rises
        means = [byqp[q] for q in qps]
        assert all(a > b for a, b in zip(means, means[1:])), (key, byqp)
        checked += 1
    assert checked >= 2


def test_round_trip_matches_extract_format(tmp_path):
    """Our writer-side assumption: re-serializing parsed labels
    reproduces the shipped bytes exactly (layout is raster frame-major
    uint8 with nothing else in the file)."""
    cu_path, idx_path = _stems(AI_DIR)[0]
    lab, _ = labels.read_shipped_labels(cu_path, idx_path)
    raw = np.fromfile(cu_path, np.uint8)
    assert lab.astype(np.uint8).reshape(-1).tobytes() == raw.tobytes()
