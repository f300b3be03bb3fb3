"""Bit-level writers: RBSP bit writer, exp-Golomb, NAL / Annex-B framing.

Host-side by design: final bitstream packing is inherently sequential and
tiny compared to the TPU compute; it runs on CPU overlapped with the next
frame's device work (SURVEY.md section 7.4 hard-part 1).
"""

from __future__ import annotations


class BitWriter:
    """MSB-first bit writer producing an RBSP byte string."""

    def __init__(self):
        self._bytes = bytearray()
        self._cur = 0
        self._nbits = 0

    def u(self, value: int, nbits: int):
        """Write fixed-length unsigned field."""
        if nbits == 0:
            return
        assert 0 <= value < (1 << nbits), (value, nbits)
        for i in range(nbits - 1, -1, -1):
            self._cur = (self._cur << 1) | ((value >> i) & 1)
            self._nbits += 1
            if self._nbits == 8:
                self._bytes.append(self._cur)
                self._cur = 0
                self._nbits = 0

    def ue(self, value: int):
        """Unsigned exp-Golomb."""
        assert value >= 0
        v = value + 1
        nbits = v.bit_length()
        self.u(0, nbits - 1)
        self.u(v, nbits)

    def se(self, value: int):
        """Signed exp-Golomb: 0,1,-1,2,-2,... -> 0,1,2,3,4,..."""
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def bit(self, b: int):
        self.u(b, 1)

    @property
    def bit_position(self) -> int:
        return len(self._bytes) * 8 + self._nbits

    def byte_aligned(self) -> bool:
        return self._nbits == 0

    def align_zero(self):
        while self._nbits:
            self.bit(0)

    def align_one_then_zero(self):
        """rbsp_trailing_bits: stop bit 1, then zero-pad to byte."""
        self.bit(1)
        self.align_zero()

    def get_bytes(self) -> bytes:
        assert self._nbits == 0, "bitstream not byte aligned"
        return bytes(self._bytes)


def rbsp_to_ebsp(rbsp: bytes) -> bytes:
    """Insert emulation_prevention_three_byte (H.265 7.4.2: escape any
    0x000000/01/02/03 pattern)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


# NAL unit types (H.265 Table 7-1)
NAL_TRAIL_R = 1
NAL_IDR_W_RADL = 19
NAL_IDR_N_LP = 20
NAL_VPS = 32
NAL_SPS = 33
NAL_PPS = 34
NAL_PREFIX_SEI = 39
NAL_SUFFIX_SEI = 40


def nal_unit(nal_type: int, rbsp: bytes, *, layer_id: int = 0,
             temporal_id: int = 0, long_start_code: bool = True) -> bytes:
    """Wrap an RBSP into an Annex-B NAL unit with start code."""
    header = bytes([
        (nal_type << 1) | (layer_id >> 5),
        ((layer_id & 31) << 3) | (temporal_id + 1),
    ])
    start = b"\x00\x00\x00\x01" if long_start_code else b"\x00\x00\x01"
    return start + header + rbsp_to_ebsp(rbsp)
