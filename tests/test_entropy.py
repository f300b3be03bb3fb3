import numpy as np
import pytest

from hevc_tpu.entropy import bitstream, cabac, contexts, scan, residual


def test_bitwriter_ue_se():
    bw = bitstream.BitWriter()
    bw.ue(0)          # '1'
    bw.ue(1)          # '010'
    bw.ue(2)          # '011'
    bw.se(0)          # '1'
    bw.se(1)          # '010'
    bw.se(-1)         # '011'
    bw.align_zero()
    data = bw.get_bytes()
    # 1 010 011 1 010 011 + pad -> 10100111 01001100
    assert data == bytes([0b10100111, 0b01001100])


def test_emulation_prevention():
    raw = bytes([0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 0, 0, 4])
    out = bitstream.rbsp_to_ebsp(raw)
    assert b"\x00\x00\x00" not in out[:3] or out[2] == 3
    # decode back
    dec = bytearray()
    zeros = 0
    i = 0
    while i < len(out):
        b = out[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue
        dec.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    assert bytes(dec) == raw


def test_context_init_layout():
    ctx = contexts.ContextModels(init_type=0, qp=32)
    assert ctx.state.shape[0] == contexts.NUM_CONTEXTS
    assert (ctx.state >= 0).all() and (ctx.state <= 62).all()
    # spot-check one known derivation: init 154 => state 0/ mps 1 at any QP
    s, m = cabac.init_context_state(154, 32)
    assert (s, m) == (0, 1)


def test_cabac_roundtrip_context_bins():
    rng = np.random.RandomState(0)
    bins = rng.randint(0, 2, 500)
    ctx_ids = rng.randint(0, 10, 500)

    bw = bitstream.BitWriter()
    enc = cabac.CabacEncoder(bw)
    ctx_e = contexts.ContextModels(0, 32)
    for b, c in zip(bins, ctx_ids):
        enc.encode_bin(ctx_e, int(c), int(b))
    enc.encode_terminate(1)
    data = bw.get_bytes()

    dec = cabac.CabacDecoder(data)
    ctx_d = contexts.ContextModels(0, 32)
    out = [dec.decode_bin(ctx_d, int(c)) for c in ctx_ids]
    np.testing.assert_array_equal(out, bins)


def test_cabac_roundtrip_mixed_bypass():
    rng = np.random.RandomState(1)
    ops = []
    for _ in range(300):
        kind = rng.randint(0, 3)
        if kind == 0:
            ops.append(("ctx", rng.randint(0, 5), rng.randint(0, 2)))
        elif kind == 1:
            ops.append(("ep", rng.randint(0, 2)))
        else:
            ops.append(("epN", rng.randint(0, 256), 8))

    bw = bitstream.BitWriter()
    enc = cabac.CabacEncoder(bw)
    ctx_e = contexts.ContextModels(0, 27)
    for op in ops:
        if op[0] == "ctx":
            enc.encode_bin(ctx_e, op[1], op[2])
        elif op[0] == "ep":
            enc.encode_bypass(op[1])
        else:
            enc.encode_bypass_bins(op[1], op[2])
    enc.encode_terminate(1)
    data = bw.get_bytes()

    dec = cabac.CabacDecoder(data)
    ctx_d = contexts.ContextModels(0, 27)
    for op in ops:
        if op[0] == "ctx":
            assert dec.decode_bin(ctx_d, op[1]) == op[2]
        elif op[0] == "ep":
            assert dec.decode_bypass() == op[1]
        else:
            assert dec.decode_bypass_bins(op[2]) == op[1]


def test_scan_diag_4x4():
    s = scan.grouped_scan(scan.SCAN_DIAG, 4)
    # first entries: (0,0),(0,1),(1,0),(0,2),(1,1),(2,0) as raster idx
    assert list(s[:6]) == [0, 4, 1, 8, 5, 2]
    assert sorted(s) == list(range(16))


def test_scan_grouped_8x8():
    s = scan.grouped_scan(scan.SCAN_DIAG, 8)
    assert sorted(s) == list(range(64))
    # first CG must be the top-left 4x4 block
    first_cg = set(int(v) for v in s[:16])
    expect = {y * 8 + x for y in range(4) for x in range(4)}
    assert first_cg == expect


def test_scan_type_rule():
    assert scan.scan_type_for(26, 8, True) == scan.SCAN_HOR
    assert scan.scan_type_for(22, 8, True) == scan.SCAN_HOR
    assert scan.scan_type_for(10, 4, True) == scan.SCAN_VER
    assert scan.scan_type_for(6, 8, True) == scan.SCAN_VER
    assert scan.scan_type_for(0, 8, True) == scan.SCAN_DIAG
    assert scan.scan_type_for(26, 16, True) == scan.SCAN_DIAG
    assert scan.scan_type_for(26, 8, False) == scan.SCAN_DIAG
    assert scan.scan_type_for(26, 4, False) == scan.SCAN_HOR
    assert scan.scan_type_for(None, 8, True) == scan.SCAN_DIAG


@pytest.mark.parametrize("n,is_luma,scan_type", [
    (4, True, scan.SCAN_DIAG), (4, True, scan.SCAN_HOR),
    (4, True, scan.SCAN_VER), (4, False, scan.SCAN_DIAG),
    (8, True, scan.SCAN_DIAG), (8, True, scan.SCAN_VER),
    (8, False, scan.SCAN_DIAG),
    (16, True, scan.SCAN_DIAG), (16, False, scan.SCAN_DIAG),
    (32, True, scan.SCAN_DIAG),
])
def test_residual_roundtrip(n, is_luma, scan_type):
    rng = np.random.RandomState(n * 10 + scan_type)
    for trial in range(8):
        density = rng.choice([0.02, 0.1, 0.5, 0.9])
        coeffs = rng.randint(-200, 201, (n, n)).astype(np.int32)
        mask = rng.rand(n, n) < density
        coeffs = coeffs * mask
        if not coeffs.any():
            coeffs[rng.randint(n), rng.randint(n)] = 1

        bw = bitstream.BitWriter()
        enc = cabac.CabacEncoder(bw)
        ctx_e = contexts.ContextModels(0, 32)
        residual.code_residual(enc, ctx_e, coeffs, is_luma=is_luma,
                               scan_type=scan_type)
        enc.encode_terminate(1)
        data = bw.get_bytes()

        dec = cabac.CabacDecoder(data)
        ctx_d = contexts.ContextModels(0, 32)
        out = residual.decode_residual(dec, ctx_d, n, is_luma=is_luma,
                                       scan_type=scan_type)
        np.testing.assert_array_equal(out, coeffs,
                                      err_msg=f"n={n} trial={trial}")
        # context states must evolve identically
        np.testing.assert_array_equal(ctx_e.state, ctx_d.state)


def test_residual_roundtrip_large_values():
    n = 8
    coeffs = np.zeros((n, n), np.int32)
    coeffs[0, 0] = 32767
    coeffs[1, 0] = -32768 + 1
    coeffs[0, 1] = 1000
    bw = bitstream.BitWriter()
    enc = cabac.CabacEncoder(bw)
    ctx_e = contexts.ContextModels(0, 22)
    residual.code_residual(enc, ctx_e, coeffs, is_luma=True,
                           scan_type=scan.SCAN_DIAG)
    enc.encode_terminate(1)
    dec = cabac.CabacDecoder(bw.get_bytes())
    ctx_d = contexts.ContextModels(0, 22)
    out = residual.decode_residual(dec, ctx_d, n, is_luma=True,
                                   scan_type=scan.SCAN_DIAG)
    np.testing.assert_array_equal(out, coeffs)
