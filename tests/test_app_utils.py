"""App/utils equivalents: Annex-B byte statistics, bit-depth conversion,
bitrate targeting (reference App/utils/annexBbytecount.cpp,
convert_NtoMbit_YCbCr.cpp, BitrateTargeting/*)."""

import numpy as np
import pytest

from hevc_tpu.apps import utils


# the reference tool's own self-test vectors (annexBbytecount.cpp:45-67):
# expected = (leading_zero_8bits, zero_byte, start_code_prefix,
#             NumBytesInNALunit, trailing_zero_8bits)
VECTORS = [
    ((0, 0, 3, 0, 0), bytes([0, 0, 1])),
    ((0, 1, 3, 0, 0), bytes([0, 0, 0, 1])),
    ((2, 1, 3, 0, 0), bytes([0, 0, 0, 0, 0, 1])),
    ((0, 0, 3, 1, 0), bytes([0, 0, 1, 2])),
    ((0, 0, 3, 2, 0), bytes([0, 0, 1, 2, 0])),
    ((0, 0, 3, 3, 0), bytes([0, 0, 1, 2, 0, 0])),
    ((0, 0, 3, 1, 3), bytes([0, 0, 1, 2, 0, 0, 0])),
    # two NAL units: stats of the first
    ((0, 0, 3, 1, 0), bytes([0, 0, 1, 2, 0, 0, 1, 3])),
    ((0, 0, 3, 1, 0), bytes([0, 0, 1, 2, 0, 0, 0, 1, 3])),
    ((0, 0, 3, 1, 1), bytes([0, 0, 1, 2, 0, 0, 0, 0, 1, 3])),
]


@pytest.mark.parametrize("expected,data", VECTORS)
def test_annexb_stats_reference_vectors(expected, data):
    st, _ = utils.split_annexb(data)[0]
    got = (st.leading_zero_8bits, st.zero_byte, st.start_code_prefix,
           st.nal_bytes, st.trailing_zero_8bits)
    assert got == expected


def test_annexb_bytecount_on_real_stream():
    from hevc_tpu.entropy import headers
    from hevc_tpu.entropy.bitstream import nal_unit, NAL_IDR_W_RADL
    cfg = headers.EncoderConfig(width=64, height=64, qp=32)
    stream = (headers.write_vps(cfg) + headers.write_sps(cfg)
              + headers.write_pps(cfg)
              + nal_unit(NAL_IDR_W_RADL, b"\x12\x34\x56"))
    stats = utils.annexb_bytecount(stream)
    nals = utils.split_annexb(stream)
    assert len(nals) == 4
    assert stats["vcl"].nal_bytes == nals[-1][0].nal_bytes
    assert stats["other"].nal_bytes == sum(
        s.nal_bytes for s, _ in nals[:3])
    total = (stats["total"].nal_bytes + stats["total"].start_code_prefix
             + stats["total"].zero_byte
             + stats["total"].leading_zero_8bits
             + stats["total"].trailing_zero_8bits)
    assert total == len(stream)


def test_convert_bitdepth_roundtrip(tmp_path):
    w, h = 16, 8
    rng = np.random.RandomState(0)
    y = rng.randint(0, 256, (h, w), np.uint8)
    cb = rng.randint(0, 256, (h // 2, w // 2), np.uint8)
    cr = rng.randint(0, 256, (h // 2, w // 2), np.uint8)
    src = tmp_path / "in.yuv"
    src.write_bytes(y.tobytes() + cb.tobytes() + cr.tobytes())
    mid = tmp_path / "mid.yuv"
    out = tmp_path / "out.yuv"
    assert utils.convert_bitdepth(str(src), str(mid), w, h, 8, 10) == 1
    a10 = np.frombuffer(mid.read_bytes(), "<u2")
    np.testing.assert_array_equal(
        a10[: w * h], (y.astype(np.int32) << 2).reshape(-1))
    assert utils.convert_bitdepth(str(mid), str(out), w, h, 10, 8) == 1
    np.testing.assert_array_equal(
        np.frombuffer(out.read_bytes(), np.uint8),
        np.frombuffer(src.read_bytes(), np.uint8))


def test_extract_bitrates():
    log = "\n".join(
        f"POC {p:4d} TId: 0 ( P-SLICE, QP 32 ) {1000 + 100 * ((p - 1) % 4)} bits"
        for p in range(1, 9))
    rates = utils.extract_bitrates(log, gop_size=4, fps=30.0)
    assert rates == [30.0, 33.0, 36.0, 39.0]


def test_guess_lambda_modifiers_converges():
    # synthetic encoder: rate_i = base_i / lambda_i (exact power law)
    base = np.array([100.0, 80.0, 60.0, 40.0])

    def encode(mods):
        return base / np.asarray(mods)

    targets = [50.0, 50.0, 50.0, 50.0]
    mods = utils.guess_lambda_modifiers(encode, targets, tolerance=0.02)
    rates = encode(mods)
    assert np.all(np.abs(rates - 50.0) / 50.0 <= 0.02)
