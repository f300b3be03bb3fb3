"""Catalog parity vs the reference's data_info arrays + loader behavior."""

import os
import sys

import numpy as np
import pytest

from hevc_tpu.train import data_info

REF = "/root/reference/Extract_Data/data_info.py"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_catalog_matches_reference_arrays():
    ns = {}
    exec(open(REF).read(), ns)
    names = ns["YUV_NAME_LIST_FULL"]
    widths = ns["YUV_WIDTH_LIST_FULL"]
    heights = ns["YUV_HEIGHT_LIST_FULL"]
    assert data_info.NAMES == list(names)
    for n, w, h in zip(names, widths, heights):
        assert data_info.resolution(n) == (int(w), int(h)), n


def test_role_splits():
    # extract_data_AI.py:19-21 / extract_data_LDP_LDB_RA.py:27-29
    assert data_info.AI_TRAIN == [0, 1, 2, 3]
    assert data_info.AI_VALID == [4, 5, 6, 7]
    assert data_info.AI_TEST == [8, 9, 10, 11]
    assert data_info.INTER_TEST == list(range(12, 30))
    assert len(data_info.INTER_TRAIN) == 93 - 10
    assert not set(data_info.INTER_VALID) & set(data_info.INTER_TRAIN)
    assert all(30 <= i < 123
               for i in data_info.INTER_TRAIN + data_info.INTER_VALID)


def test_scanner_picks_up_real_yuv(tmp_path):
    name = "BasketballPass_416x240_50"
    fb = 416 * 240 * 3 // 2
    p = tmp_path / f"{name}.yuv"
    p.write_bytes(b"\x80" * (fb * 3))
    seqs = data_info.available(str(tmp_path))
    assert len(seqs) == 1
    s = seqs[0]
    assert (s.name, s.width, s.height, s.n_frames) == (name, 416, 240, 3)

    # truncated file -> hard error, not silent misread
    p.write_bytes(b"\x80" * (fb * 3 - 1))
    with pytest.raises(ValueError):
        data_info.available(str(tmp_path))


def test_full_catalog_has_no_path_without_dir():
    cat = data_info.catalog()
    assert len(cat) == 212
    assert all(s.path is None for s in cat.values())
