"""residual_coding() syntax (H.265 7.3.8.11 + 9.3.4.2.5-7).

Encodes one TU's quantized coefficients through CABAC. Context
derivations follow the standard (sig map neighbourhood patterns, ctx sets
for greater1/greater2, Golomb-Rice escapes); behavioral counterpart:
HM TEncSbac::codeCoeffNxN (TEncSbac.cpp:1181).

Sign data hiding is supported via `sign_hiding` (PPS flag); our PPS keeps
it off by default.
"""

from __future__ import annotations

import numpy as np

from . import scan as scanlib

# 4x4 sig ctx map (H.265 9.3.4.2.5 ctxIdxMap)
CTX_IND_MAP_4x4 = np.array([0, 1, 4, 5,
                            2, 3, 4, 5,
                            6, 6, 8, 8,
                            7, 7, 8, 8], np.int32)

SIG_LUMA_OFFSET = 0
SIG_CHROMA_OFFSET = 28
C1FLAG_NUMBER = 8
SBH_THRESHOLD = 4


def _first_sig_ctx(n: int, is_luma: bool, scan_type: int) -> int:
    if is_luma:
        if n == 4:
            return 0
        if n == 8:
            return 9 + (6 if scan_type != scanlib.SCAN_DIAG else 0)
        return 21
    else:
        if n == 4:
            return 0
        if n == 8:
            return 9
        return 12


def _sig_ctx_inc(pattern: int, pos_x: int, pos_y: int, n: int,
                 is_luma: bool, first_ctx: int) -> int:
    if pos_x + pos_y == 0:
        return 0  # DC context
    if n == 4:
        return first_ctx + CTX_IND_MAP_4x4[4 * pos_y + pos_x]
    xp, yp = pos_x & 3, pos_y & 3
    if pattern == 0:
        t = xp + yp
        cnt = 0 if t >= 3 else (1 if t >= 1 else 2)
    elif pattern == 1:
        cnt = 0 if yp >= 2 else (1 if yp >= 1 else 2)
    elif pattern == 2:
        cnt = 0 if xp >= 2 else (1 if xp >= 1 else 2)
    else:
        cnt = 2
    not_first_group = ((pos_x >> 2) + (pos_y >> 2)) > 0
    offset = (3 if (not_first_group and is_luma) else 0) + cnt
    return first_ctx + offset


def _code_last_xy(enc, ctx, pos_x, pos_y, n, is_luma, scan_type):
    if scan_type == scanlib.SCAN_VER:
        pos_x, pos_y = pos_y, pos_x
    gx = int(scanlib.GROUP_IDX[pos_x])
    gy = int(scanlib.GROUP_IDX[pos_y])
    log2n = int(n).bit_length() - 1
    cw = log2n - 2
    if is_luma:
        blk_offset = cw * 3 + ((cw + 1) >> 2)
        shift = (cw + 3) >> 2
        base_x = ctx.idx("last_x", 0)
        base_y = ctx.idx("last_y", 0)
    else:
        blk_offset = 0
        shift = cw
        base_x = ctx.idx("last_x", 15)
        base_y = ctx.idx("last_y", 15)

    max_group = int(scanlib.GROUP_IDX[n - 1])
    for i in range(gx):
        enc.encode_bin(ctx, base_x + blk_offset + (i >> shift), 1)
    if gx < max_group:
        enc.encode_bin(ctx, base_x + blk_offset + (gx >> shift), 0)
    for i in range(gy):
        enc.encode_bin(ctx, base_y + blk_offset + (i >> shift), 1)
    if gy < max_group:
        enc.encode_bin(ctx, base_y + blk_offset + (gy >> shift), 0)
    if gx > 3:
        count = (gx - 2) >> 1
        rem = pos_x - int(scanlib.MIN_IN_GROUP[gx])
        for i in range(count - 1, -1, -1):
            enc.encode_bypass((rem >> i) & 1)
    if gy > 3:
        count = (gy - 2) >> 1
        rem = pos_y - int(scanlib.MIN_IN_GROUP[gy])
        for i in range(count - 1, -1, -1):
            enc.encode_bypass((rem >> i) & 1)


def _write_remaining(enc, value: int, rice: int):
    """coeff_abs_level_remaining, Golomb-Rice + exp-Golomb escape."""
    if value < (3 << rice):
        length = value >> rice
        enc.encode_bypass_bins((1 << (length + 1)) - 2, length + 1)
        enc.encode_bypass_bins(value & ((1 << rice) - 1), rice)
    else:
        length = rice
        value -= (3 << rice)
        while value >= (1 << length):
            value -= (1 << length)
            length += 1
        enc.encode_bypass_bins((1 << (3 + length + 1 - rice)) - 2,
                               3 + length + 1 - rice)
        enc.encode_bypass_bins(value, length)


def code_residual(enc, ctx, coeffs: np.ndarray, *, is_luma: bool,
                  scan_type: int, sign_hiding: bool = False):
    """Encode one TU's coefficients. coeffs: [n, n] int array (raster),
    must contain at least one nonzero value."""
    n = coeffs.shape[0]
    flat = np.asarray(coeffs).reshape(-1)
    scan = scanlib.grouped_scan(scan_type, n)
    cgs = scanlib.cg_scan(scan_type, n)
    n_cg_w = max(n // 4, 1)

    nz_scan = np.nonzero(flat[scan] != 0)[0]
    assert nz_scan.size > 0, "code_residual on empty TU"
    scan_pos_last = int(nz_scan[-1])

    # CG significance map
    cg_flags = np.zeros(n_cg_w * n_cg_w, np.int32)
    for sp in nz_scan:
        rp = int(scan[sp])
        py, px = rp // n, rp % n
        cg_flags[(py >> 2) * n_cg_w + (px >> 2)] = 1

    pos_last = int(scan[scan_pos_last])
    last_y, last_x = pos_last // n, pos_last % n
    _code_last_xy(enc, ctx, last_x, last_y, n, is_luma, scan_type)

    sig_base = ctx.idx("sig_flag",
                       SIG_LUMA_OFFSET if is_luma else SIG_CHROMA_OFFSET)
    first_ctx = _first_sig_ctx(n, is_luma, scan_type)
    cg_base = ctx.idx("sig_cg", 0 if is_luma else 2)

    last_cg = scan_pos_last >> 4
    c1 = 1
    i_scan_sig = scan_pos_last

    for subset in range(last_cg, -1, -1):
        sub_pos = subset << 4
        rice = 0
        abs_coeff = []
        signs = []
        num_nonzero = 0
        last_nz_in_cg = -1
        first_nz_in_cg = 16

        if i_scan_sig == scan_pos_last:
            v = int(flat[pos_last])
            abs_coeff.append(abs(v))
            signs.append(1 if v < 0 else 0)
            num_nonzero = 1
            last_nz_in_cg = i_scan_sig
            first_nz_in_cg = i_scan_sig
            i_scan_sig -= 1

        cg_blk = int(cgs[subset])
        cg_y, cg_x = cg_blk // n_cg_w, cg_blk % n_cg_w

        if subset == last_cg or subset == 0:
            cg_flags[cg_blk] = 1
        else:
            sig_right = int(cg_x < n_cg_w - 1
                            and cg_flags[cg_y * n_cg_w + cg_x + 1] != 0)
            sig_lower = int(cg_y < n_cg_w - 1
                            and cg_flags[(cg_y + 1) * n_cg_w + cg_x] != 0)
            inc = 1 if (sig_right + sig_lower) else 0
            enc.encode_bin(ctx, cg_base + inc, int(cg_flags[cg_blk]))

        if cg_flags[cg_blk]:
            sig_right = int(cg_x < n_cg_w - 1
                            and cg_flags[cg_y * n_cg_w + cg_x + 1] != 0)
            sig_lower = int(cg_y < n_cg_w - 1
                            and cg_flags[(cg_y + 1) * n_cg_w + cg_x] != 0)
            pattern = sig_right + 2 * sig_lower
            while i_scan_sig >= sub_pos:
                rp = int(scan[i_scan_sig])
                py, px = rp // n, rp % n
                v = int(flat[rp])
                sig = int(v != 0)
                if i_scan_sig > sub_pos or subset == 0 or num_nonzero:
                    ctx_inc = _sig_ctx_inc(pattern, px, py, n, is_luma,
                                           first_ctx)
                    enc.encode_bin(ctx, sig_base + ctx_inc, sig)
                if sig:
                    abs_coeff.append(abs(v))
                    signs.append(1 if v < 0 else 0)
                    num_nonzero += 1
                    if last_nz_in_cg == -1:
                        last_nz_in_cg = i_scan_sig
                    first_nz_in_cg = i_scan_sig
                i_scan_sig -= 1
        else:
            i_scan_sig = sub_pos - 1

        if num_nonzero == 0:
            continue

        hidden = sign_hiding and (last_nz_in_cg - first_nz_in_cg
                                  >= SBH_THRESHOLD)

        if is_luma:
            ctx_set = (2 if subset > 0 else 0) + (1 if c1 == 0 else 0)
            one_base = ctx.idx("one_flag", ctx_set * 4)
            abs_base = ctx.idx("abs_flag", ctx_set)
        else:
            ctx_set = 1 if c1 == 0 else 0
            one_base = ctx.idx("one_flag", 16 + ctx_set * 4)
            abs_base = ctx.idx("abs_flag", 4 + ctx_set)
        c1 = 1

        escape_present = False
        num_c1 = min(num_nonzero, C1FLAG_NUMBER)
        first_c2_idx = -1
        for idx in range(num_c1):
            sym = int(abs_coeff[idx] > 1)
            enc.encode_bin(ctx, one_base + c1, sym)
            if sym:
                c1 = 0
                if first_c2_idx == -1:
                    first_c2_idx = idx
                else:
                    escape_present = True
            elif 0 < c1 < 3:
                c1 += 1

        if c1 == 0 and first_c2_idx != -1:
            sym = int(abs_coeff[first_c2_idx] > 2)
            enc.encode_bin(ctx, abs_base, sym)
            if sym:
                escape_present = True
        escape_present = escape_present or (num_nonzero > C1FLAG_NUMBER)

        if hidden:
            for s in signs[:-1]:
                enc.encode_bypass(s)
        else:
            for s in signs:
                enc.encode_bypass(s)

        if escape_present:
            first_coeff2 = 1
            for idx in range(num_nonzero):
                base_level = (2 + first_coeff2) if idx < C1FLAG_NUMBER else 1
                if abs_coeff[idx] >= base_level:
                    _write_remaining(enc, abs_coeff[idx] - base_level, rice)
                    if abs_coeff[idx] > (3 << rice):
                        rice = min(rice + 1, 4)
                if abs_coeff[idx] >= 2:
                    first_coeff2 = 0


# ---------------------------------------------------------------------------
# Matching decoder (round-trip self-tests / debugging)
# ---------------------------------------------------------------------------

def _read_remaining(dec, rice: int) -> int:
    prefix = 0
    while prefix < 32 and dec.decode_bypass():
        prefix += 1
    if prefix < 3:
        value = (prefix << rice) + dec.decode_bypass_bins(rice)
    else:
        length = prefix - 3 + rice
        value = ((3 << rice) + ((1 << length) - (1 << rice))
                 + dec.decode_bypass_bins(length))
        # equivalent of the encoder's successive subtraction:
        # sum_{l=rice}^{length-1} 2^l = 2^length - 2^rice
    return value


def _read_last_xy(dec, ctx, n, is_luma, scan_type):
    log2n = int(n).bit_length() - 1
    cw = log2n - 2
    if is_luma:
        blk_offset = cw * 3 + ((cw + 1) >> 2)
        shift = (cw + 3) >> 2
        base_x = ctx.idx("last_x", 0)
        base_y = ctx.idx("last_y", 0)
    else:
        blk_offset = 0
        shift = cw
        base_x = ctx.idx("last_x", 15)
        base_y = ctx.idx("last_y", 15)
    max_group = int(scanlib.GROUP_IDX[n - 1])

    gx = 0
    while gx < max_group and dec.decode_bin(ctx, base_x + blk_offset
                                            + (gx >> shift)):
        gx += 1
    gy = 0
    while gy < max_group and dec.decode_bin(ctx, base_y + blk_offset
                                            + (gy >> shift)):
        gy += 1
    pos_x = int(scanlib.MIN_IN_GROUP[gx])
    if gx > 3:
        count = (gx - 2) >> 1
        pos_x += dec.decode_bypass_bins(count)
    pos_y = int(scanlib.MIN_IN_GROUP[gy])
    if gy > 3:
        count = (gy - 2) >> 1
        pos_y += dec.decode_bypass_bins(count)
    if scan_type == scanlib.SCAN_VER:
        pos_x, pos_y = pos_y, pos_x
    return pos_x, pos_y


def decode_residual(dec, ctx, n: int, *, is_luma: bool, scan_type: int,
                    sign_hiding: bool = False) -> np.ndarray:
    """Inverse of code_residual; returns [n, n] int32 coefficients."""
    out = np.zeros(n * n, np.int32)
    scan = scanlib.grouped_scan(scan_type, n)
    cgs = scanlib.cg_scan(scan_type, n)
    n_cg_w = max(n // 4, 1)

    last_x, last_y = _read_last_xy(dec, ctx, n, is_luma, scan_type)
    pos_last = last_y * n + last_x
    scan_pos_last = int(np.nonzero(scan == pos_last)[0][0])

    sig_base = ctx.idx("sig_flag",
                       SIG_LUMA_OFFSET if is_luma else SIG_CHROMA_OFFSET)
    first_ctx = _first_sig_ctx(n, is_luma, scan_type)
    cg_base = ctx.idx("sig_cg", 0 if is_luma else 2)

    cg_flags = np.zeros(n_cg_w * n_cg_w, np.int32)
    last_cg = scan_pos_last >> 4
    c1 = 1
    i_scan_sig = scan_pos_last

    for subset in range(last_cg, -1, -1):
        sub_pos = subset << 4
        rice = 0
        sig_pos = []

        if i_scan_sig == scan_pos_last:
            sig_pos.append(i_scan_sig)
            i_scan_sig -= 1

        cg_blk = int(cgs[subset])
        cg_y, cg_x = cg_blk // n_cg_w, cg_blk % n_cg_w
        sig_right = int(cg_x < n_cg_w - 1
                        and cg_flags[cg_y * n_cg_w + cg_x + 1] != 0)
        sig_lower = int(cg_y < n_cg_w - 1
                        and cg_flags[(cg_y + 1) * n_cg_w + cg_x] != 0)

        if subset == last_cg or subset == 0:
            cg_flags[cg_blk] = 1
        else:
            inc = 1 if (sig_right + sig_lower) else 0
            cg_flags[cg_blk] = dec.decode_bin(ctx, cg_base + inc)

        if cg_flags[cg_blk]:
            pattern = sig_right + 2 * sig_lower
            while i_scan_sig >= sub_pos:
                rp = int(scan[i_scan_sig])
                py, px = rp // n, rp % n
                if (i_scan_sig > sub_pos or subset == 0
                        or len(sig_pos) > 0):
                    ctx_inc = _sig_ctxInc = _sig_ctx_inc(
                        pattern, px, py, n, is_luma, first_ctx)
                    sig = dec.decode_bin(ctx, sig_base + ctx_inc)
                else:
                    sig = 1  # inferred for lone implicit DC of the CG
                if sig:
                    sig_pos.append(i_scan_sig)
                i_scan_sig -= 1
        else:
            i_scan_sig = sub_pos - 1

        num_nonzero = len(sig_pos)
        if num_nonzero == 0:
            continue

        first_nz = sig_pos[-1]
        last_nz = sig_pos[0]
        hidden = sign_hiding and (last_nz - first_nz >= SBH_THRESHOLD)

        if is_luma:
            ctx_set = (2 if subset > 0 else 0) + (1 if c1 == 0 else 0)
            one_base = ctx.idx("one_flag", ctx_set * 4)
            abs_base = ctx.idx("abs_flag", ctx_set)
        else:
            ctx_set = 1 if c1 == 0 else 0
            one_base = ctx.idx("one_flag", 16 + ctx_set * 4)
            abs_base = ctx.idx("abs_flag", 4 + ctx_set)
        c1 = 1

        num_c1 = min(num_nonzero, C1FLAG_NUMBER)
        gt1 = [0] * num_nonzero
        first_c2_idx = -1
        for idx in range(num_c1):
            sym = dec.decode_bin(ctx, one_base + c1)
            gt1[idx] = sym
            if sym:
                c1 = 0
                if first_c2_idx == -1:
                    first_c2_idx = idx
            elif 0 < c1 < 3:
                c1 += 1

        gt2 = 0
        if c1 == 0 and first_c2_idx != -1:
            gt2 = dec.decode_bin(ctx, abs_base)

        n_signs = num_nonzero - 1 if hidden else num_nonzero
        signs = [dec.decode_bypass() for _ in range(n_signs)]

        # base levels
        levels = []
        for idx in range(num_nonzero):
            if idx < C1FLAG_NUMBER:
                lv = 1 + gt1[idx]
                if idx == first_c2_idx:
                    lv += gt2
            else:
                lv = 1
            levels.append(lv)

        first_coeff2 = 1
        for idx in range(num_nonzero):
            base_level = (2 + first_coeff2) if idx < C1FLAG_NUMBER else 1
            if levels[idx] >= base_level:
                levels[idx] = base_level + _read_remaining(dec, rice)
                if levels[idx] > (3 << rice):
                    rice = min(rice + 1, 4)
            if levels[idx] >= 2:
                first_coeff2 = 0

        total = 0
        for i, idx in enumerate(sig_pos):
            rp = int(scan[idx])
            if hidden and i == num_nonzero - 1:
                sign = total & 1
            else:
                sign = signs[i]
            total += levels[i]
            out[rp] = -levels[i] if sign else levels[i]

    return out.reshape(n, n)
