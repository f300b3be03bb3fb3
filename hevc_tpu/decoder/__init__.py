"""Standalone HEVC decoder for the framework's toolset (SURVEY.md N15).

TPU-native counterpart of the reference HM decoder library
(TLibDecoder: TDecTop.cpp:725, TDecSlice.cpp:69, TDecCu.cpp:128,
TDecSbac/TDecBinCoderCABAC) restricted to the toolset our encoder
emits: Main profile 4:2:0 8-bit, one slice per picture, CTU 64 depth 4,
I (IDR) and P (single-ref LDP) slices, intra NxN, deblocking, SAO.

The CABAC/syntax layer is host Python (sequential by nature, shared
tables with the encoder in ..entropy); reconstruction reuses the same
normative ops (..ops intra/inter/transforms/quant/deblock/sao) that the
encoder's device pipeline uses, so encoder and decoder cannot drift.

Primary entry: decode_annexb(stream) -> DecodeResult.
"""

from .top import DecodeResult, decode_annexb, decode_file

__all__ = ["DecodeResult", "decode_annexb", "decode_file"]
