"""CRC / checksum decoded-picture-hash SEI variants (D.3.19) + decoder CLI.

The reference encoder supports MD5/CRC/checksum hash SEI
(HM SEIEncoder.cpp:290-310); ours must emit all three and verify them in
the standalone decoder. The HM reference decoder is the conformance
oracle for the CRC/checksum bit layout.
"""

import numpy as np
import pytest

from hevc_tpu.core.yuv import Frame
from hevc_tpu.decoder import decode_annexb
from hevc_tpu.entropy.headers import EncoderConfig
from hevc_tpu.evaltools import hm
from hevc_tpu.pipeline import golden
from hevc_tpu.pipeline.ai import AIEncoder

from tests.test_e2e_bitstream import synth_frame


def test_crc_plane_reference_vector():
    """binascii-based CRC == the spec's bit-serial algorithm."""
    rng = np.random.RandomState(0)
    p = rng.randint(0, 256, (8, 16)).astype(np.uint8)

    def crc_bitserial(plane):
        crc = 0xFFFF
        for byte in plane.tobytes():
            for bit in range(8):
                crc_msb = (crc >> 15) & 1
                bit_val = (byte >> (7 - bit)) & 1
                crc = (((crc << 1) + bit_val) & 0xFFFF) ^ (
                    crc_msb * 0x1021)
        for _ in range(16):
            crc_msb = (crc >> 15) & 1
            crc = ((crc << 1) & 0xFFFF) ^ (crc_msb * 0x1021)
        return bytes([(crc >> 8) & 0xFF, crc & 0xFF])

    assert golden.crc_plane(p) == crc_bitserial(p)


@pytest.mark.parametrize("hash_type", ["crc", "checksum"])
def test_decode_hash_variants(hash_type):
    W = H = 64
    cfg = EncoderConfig(width=W, height=H, qp=32, hash_type=hash_type)
    frames = [synth_frame(W, H, seed=3)]
    stream, _, _ = AIEncoder(cfg).encode(frames)
    r = decode_annexb(stream)
    assert r.hash_ok == [True]


@pytest.mark.skipif(not hm.decoder_available(), reason="HM decoder missing")
@pytest.mark.parametrize("hash_type", ["crc", "checksum"])
def test_hm_verifies_hash_variants(hash_type, tmp_path):
    W = H = 64
    cfg = EncoderConfig(width=W, height=H, qp=32, hash_type=hash_type)
    frames = [synth_frame(W, H, seed=3)]
    stream, _, _ = AIEncoder(cfg).encode(frames)
    rc, log, _ = hm.decode_bytes(stream, str(tmp_path))
    assert rc == 0, log
    assert "mismatch" not in log.lower(), log


def test_decoder_cli(tmp_path, capsys):
    from hevc_tpu.apps import decoder as dec_app
    from hevc_tpu.core.yuv import read_yuv420

    W = H = 64
    cfg = EncoderConfig(width=W, height=H, qp=32)
    frames = [synth_frame(W, H, seed=3)]
    stream, recons, _ = AIEncoder(cfg).encode(frames)
    p = tmp_path / "s.bin"
    p.write_bytes(stream)
    out = tmp_path / "rec.yuv"
    rc = dec_app.main(["-b", str(p), "-o", str(out)])
    assert rc == 0
    assert "hash (OK)" in capsys.readouterr().out
    dec = read_yuv420(str(out), W, H)
    np.testing.assert_array_equal(dec[0].y, recons[0].y)

    # corrupt the hash SEI -> exit 1
    bad = bytearray(stream)
    bad[-3] ^= 0xFF
    p.write_bytes(bytes(bad))
    assert dec_app.main(["-b", str(p)]) == 1
