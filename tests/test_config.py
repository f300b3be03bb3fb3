"""HM cfg parser (core/config.py) against the reference's shipped cfgs."""

import os
import pytest

from hevc_tpu.core.config import load_encoder_config, parse_hm_cfg_text

REF = "/root/reference"
AI_CFG = f"{REF}/HM-16.5_Test_AI/bin/encoder_intra_main.cfg"
LDP_CFG = f"{REF}/HM-16.5_Test_LDP/bin/encoder_lowdelay_P_main.cfg"
SRC_CFG = f"{REF}/HM-16.5_Test_AI/bin/encoder_yuv_source.cfg"


def test_parse_text_comments_and_overrides():
    opts = parse_hm_cfg_text("A : 1 # c\nB: x y z\n# A : 9\nA : 2\n")
    assert opts == {"A": "2", "B": "x y z"}


@pytest.mark.skipif(not os.path.exists(AI_CFG), reason="reference absent")
def test_reference_ai_operating_point():
    cfg, run = load_encoder_config([SRC_CFG, AI_CFG])
    assert (cfg.width, cfg.height) == (416, 240)
    assert cfg.qp == 32 and cfg.deblock and cfg.sao and cfg.rdoq
    assert run.mode == "ai" and run.frames_to_encode == 20
    assert run.frame_rate == 30.0


@pytest.mark.skipif(not os.path.exists(LDP_CFG), reason="reference absent")
def test_reference_ldp_operating_point():
    cfg, run = load_encoder_config([SRC_CFG, LDP_CFG])
    assert run.mode == "ldp" and run.gop_size == 4
    assert cfg.gop_qp_offsets == (3, 2, 3, 1)   # Frame1..4 QPoffset column
    assert cfg.deblock and cfg.sao


def test_missing_dims_raises(tmp_path):
    p = tmp_path / "x.cfg"
    p.write_text("QP : 30\n")
    with pytest.raises(ValueError, match="SourceWidth"):
        load_encoder_config([str(p)])


LDB_CFG = f"{REF}/HM-16.5_Test_LDP/cfg/encoder_lowdelay_main.cfg"


@pytest.mark.skipif(not os.path.exists(LDB_CFG), reason="reference absent")
def test_reference_ldb_operating_point():
    cfg, run = load_encoder_config([SRC_CFG, LDB_CFG])
    assert run.mode == "ldb" and run.gop_size == 4
    assert cfg.gop_qp_offsets == (3, 2, 3, 1)
