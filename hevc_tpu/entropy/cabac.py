"""HEVC CABAC arithmetic coding engine (H.265 9.3.4) + matching decoder.

The encoder follows the standard's flowcharts (EncodeDecision /
EncodeBypass / EncodeTerminate / EncodeFlush with PutBit and
bitsOutstanding). The decoder (9.3.4.3.2 style) exists for round-trip
self-tests and debugging; conformance is ultimately checked against the
HM reference decoder binary.

Tables are the standard's: rangeTabLPS (Table 9-46), transIdxLps
(Table 9-47), context init derivation (9.3.2.2).
"""

from __future__ import annotations

import math

import numpy as np

# Table 9-46: rangeTabLPS[pStateIdx][qRangeIdx]
RANGE_TAB_LPS = np.array([
    [128, 176, 208, 240], [128, 167, 197, 227], [128, 158, 187, 216],
    [123, 150, 178, 205], [116, 142, 169, 195], [111, 135, 160, 185],
    [105, 128, 152, 175], [100, 122, 144, 166], [95, 116, 137, 158],
    [90, 110, 130, 150], [85, 104, 123, 142], [81, 99, 117, 135],
    [77, 94, 111, 128], [73, 89, 105, 122], [69, 85, 100, 116],
    [66, 80, 95, 110], [62, 76, 90, 104], [59, 72, 86, 99],
    [56, 69, 81, 94], [53, 65, 77, 89], [51, 62, 73, 85],
    [48, 59, 69, 80], [46, 56, 66, 76], [43, 53, 63, 72],
    [41, 50, 59, 69], [39, 48, 56, 65], [37, 45, 54, 62],
    [35, 43, 51, 59], [33, 41, 48, 56], [32, 39, 46, 53],
    [30, 37, 43, 50], [29, 35, 41, 48], [27, 33, 39, 45],
    [26, 31, 37, 43], [24, 30, 35, 41], [23, 28, 33, 39],
    [22, 27, 32, 37], [21, 26, 30, 35], [20, 24, 29, 33],
    [19, 23, 27, 31], [18, 22, 26, 30], [17, 21, 25, 28],
    [16, 20, 23, 27], [15, 19, 22, 25], [14, 18, 21, 24],
    [14, 17, 20, 23], [13, 16, 19, 22], [12, 15, 18, 21],
    [12, 14, 17, 20], [11, 14, 16, 19], [11, 13, 15, 18],
    [10, 12, 15, 17], [10, 12, 14, 16], [9, 11, 13, 15],
    [9, 11, 12, 14], [8, 10, 12, 14], [8, 9, 11, 13],
    [7, 9, 11, 12], [7, 9, 10, 12], [7, 8, 10, 11],
    [6, 8, 9, 11], [6, 7, 9, 10], [6, 7, 8, 9], [2, 2, 2, 2],
], dtype=np.int32)

# Table 9-47: transIdxLps[pStateIdx] (state 0 additionally flips MPS)
TRANS_IDX_LPS = np.array([
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 22, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63,
], dtype=np.int32)


def init_context_state(init_value: int, qp: int):
    """(pStateIdx, valMps) from an 8-bit init value and slice QP (9.3.2.2)."""
    slope = (init_value >> 4) * 5 - 45
    offset = ((init_value & 15) << 3) - 16
    pre = min(max(1, ((slope * min(max(0, qp), 51)) >> 4) + offset), 126)
    if pre <= 63:
        return 63 - pre, 0
    return pre - 64, 1


# Fractional-bit cost of coding a bin in a given state (for RDO bit
# estimation): -log2(prob) in 1/32768 bit units, derived analytically from
# the CABAC state probability model p_sigma = 0.5 * alpha^sigma with
# alpha = (0.01875 / 0.5)^(1/63).
_ALPHA = (0.01875 / 0.5) ** (1.0 / 63.0)
ENTROPY_BITS = np.zeros((64, 2), np.int32)  # [state][bin == mps ? 0 : 1]
for _s in range(64):
    _p_lps = 0.5 * (_ALPHA ** _s)
    ENTROPY_BITS[_s, 0] = round(-math.log2(1.0 - _p_lps) * 32768)
    ENTROPY_BITS[_s, 1] = round(-math.log2(_p_lps) * 32768)
EP_BIT = 32768


class CabacEncoder:
    """Standard CABAC encoder writing into a parent BitWriter."""

    def __init__(self, bw):
        self.bw = bw
        self.low = 0
        self.range = 510
        self.bits_outstanding = 0
        self.first_bit = True  # spec: firstBitFlag suppresses the leading bit

    # -- context state lives outside (ContextModels array) --

    def _put_bit(self, b: int):
        if self.first_bit:
            self.first_bit = False
        else:
            self.bw.bit(b)
        while self.bits_outstanding > 0:
            self.bw.bit(1 - b)
            self.bits_outstanding -= 1

    def _renorm(self):
        while self.range < 256:
            if self.low < 256:
                self._put_bit(0)
            elif self.low >= 512:
                self.low -= 512
                self._put_bit(1)
            else:
                self.low -= 256
                self.bits_outstanding += 1
            self.range <<= 1
            self.low <<= 1

    def encode_bin(self, ctx, idx: int, bin_val: int):
        """Encode one context-coded bin. ctx: ContextModels, idx: model id."""
        state = ctx.state[idx]
        mps = ctx.mps[idx]
        q = (self.range >> 6) & 3
        lps = int(RANGE_TAB_LPS[state, q])
        self.range -= lps
        if bin_val != mps:
            self.low += self.range
            self.range = lps
            if state == 0:
                ctx.mps[idx] = 1 - mps
            ctx.state[idx] = TRANS_IDX_LPS[state]
        else:
            if state < 62:
                ctx.state[idx] = state + 1
        self._renorm()

    def encode_bypass(self, bin_val: int):
        self.low <<= 1
        if bin_val:
            self.low += self.range
        if self.low >= 1024:
            self.low -= 1024
            self._put_bit(1)
        elif self.low < 512:
            self._put_bit(0)
        else:
            self.low -= 512
            self.bits_outstanding += 1

    def encode_bypass_bins(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.encode_bypass((value >> i) & 1)

    def encode_terminate(self, bin_val: int):
        self.range -= 2
        if bin_val:
            self.low += self.range
            self.range = 2
            self._renorm()
            self._flush()
        else:
            self._renorm()

    def _flush(self):
        """EncodeFlush (9.3.4.3.5): final bits incl. rbsp_stop_one_bit."""
        self.range = 2
        self._renorm()
        self._put_bit((self.low >> 9) & 1)
        self.bw.u(((self.low >> 7) & 3) | 1, 2)
        self.bw.align_zero()


class CabacDecoder:
    """Matching decoder over a byte string (RBSP, emulation already removed).

    Used by round-trip unit tests only.
    """

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitpos = 0
        self.range = 510
        self.value = 0
        for _ in range(9):
            self.value = (self.value << 1) | self._read_bit()

    def _read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 0
        b = (self.data[self.pos] >> (7 - self.bitpos)) & 1
        self.bitpos += 1
        if self.bitpos == 8:
            self.bitpos = 0
            self.pos += 1
        return b

    def decode_bin(self, ctx, idx: int) -> int:
        state = ctx.state[idx]
        mps = ctx.mps[idx]
        q = (self.range >> 6) & 3
        lps = int(RANGE_TAB_LPS[state, q])
        self.range -= lps
        if self.value >= self.range:
            self.value -= self.range
            self.range = lps
            bin_val = 1 - mps
            if state == 0:
                ctx.mps[idx] = 1 - mps
            ctx.state[idx] = TRANS_IDX_LPS[state]
        else:
            bin_val = mps
            if state < 62:
                ctx.state[idx] = state + 1
        while self.range < 256:
            self.range <<= 1
            self.value = (self.value << 1) | self._read_bit()
        return int(bin_val)

    def decode_bypass(self) -> int:
        self.value = (self.value << 1) | self._read_bit()
        if self.value >= self.range:
            self.value -= self.range
            return 1
        return 0

    def decode_bypass_bins(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.decode_bypass()
        return v

    def decode_terminate(self) -> int:
        self.range -= 2
        if self.value >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.value = (self.value << 1) | self._read_bit()
        return 0
