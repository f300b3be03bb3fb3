"""Native C++ CABAC slice encoder: byte parity vs the Python entropy layer."""

import numpy as np
import pytest

from hevc_tpu.core.yuv import pad_frame
from hevc_tpu.entropy import headers
from hevc_tpu.entropy.slice_enc import SliceEncoder
from hevc_tpu import native
from hevc_tpu.pipeline import golden
from hevc_tpu.pipeline.ai import AIEncoder

from tests.test_e2e_bitstream import synth_frame, legalize_depth


def _python_slice_bytes(cfg, decisions):
    bw = headers.start_idr_slice(cfg, cfg.qp)
    header_len = len(bw.get_bytes())
    se = SliceEncoder(cfg, cfg.qp)
    se.encode(bw, decisions["depth8"], decisions["modes8"],
              decisions["coef_y"], decisions["coef_cb"],
              decisions["coef_cr"])
    return bw.get_bytes()[header_len:]


@pytest.mark.parametrize("dims,qp,seed", [
    ((64, 64), 32, 3), ((192, 128), 27, 8), ((96, 80), 37, 5),
    ((128, 128), 22, 11),
])
def test_native_matches_python(dims, qp, seed):
    w, h = dims
    cfg = headers.EncoderConfig(width=w, height=h, qp=qp)
    pf = pad_frame(synth_frame(w, h, seed=seed), cfg.pad_width,
                   cfg.pad_height)
    enc = AIEncoder(cfg, recon_backend="golden")
    d8, m8 = enc.decide_frame(pf.y)
    decisions, _ = enc.golden.encode_frame(pf, d8, m8)

    py_bytes = _python_slice_bytes(cfg, decisions)
    c_bytes = native.encode_slice_data(
        decisions["depth8"], decisions["modes8"], decisions["coef_y"],
        decisions["coef_cb"], decisions["coef_cr"],
        cfg.pad_width, cfg.pad_height, cfg.qp)
    assert c_bytes == py_bytes
