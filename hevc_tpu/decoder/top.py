"""Decoder top level: Annex-B stream -> decoded pictures + hash check.

Counterpart of the reference TAppDecoder/TDecTop flow (TDecTop.cpp:725):
NAL dispatch, parameter-set activation, slice decode, reconstruction,
in-loop filters, decoded-picture-hash SEI verification, conformance-
window cropping.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..core.yuv import Frame
from . import nal as nal_mod
from . import headers_dec as hd
from . import recon_dec, slice_dec

NAL_TRAIL_R = 1
NAL_IDR_W_RADL = 19
NAL_IDR_N_LP = 20
NAL_VPS = 32
NAL_SPS = 33
NAL_PPS = 34
NAL_PREFIX_SEI = 39
NAL_SUFFIX_SEI = 40


@dataclass
class DecodeResult:
    frames: List[Frame] = field(default_factory=list)   # cropped output
    recons: List[Frame] = field(default_factory=list)   # padded (pre-crop)
    hash_ok: List[Optional[bool]] = field(default_factory=list)
    sps: Optional[hd.Sps] = None
    pps: Optional[hd.Pps] = None

    @property
    def all_hashes_ok(self) -> bool:
        return all(h is not False for h in self.hash_ok)


def _crop(frame: Frame, sps: hd.Sps) -> Frame:
    W, H = sps.width, sps.height
    return Frame(frame.y[:H, :W], frame.cb[:H // 2, :W // 2],
                 frame.cr[:H // 2, :W // 2])


def decode_annexb(stream: bytes) -> DecodeResult:
    """Decode a full Annex-B stream of the framework's toolset."""
    from ..pipeline.golden import md5_plane

    res = DecodeResult()
    sps: Optional[hd.Sps] = None
    pps: Optional[hd.Pps] = None
    prev_rec: Optional[Frame] = None

    for nu in nal_mod.split_annexb(stream):
        t = nu.nal_type
        if t == NAL_VPS:
            continue
        if t == NAL_SPS:
            sps = hd.parse_sps(nu.rbsp)
            res.sps = sps
            continue
        if t == NAL_PPS:
            pps = hd.parse_pps(nu.rbsp)
            res.pps = pps
            continue
        if t in (NAL_PREFIX_SEI, NAL_SUFFIX_SEI):
            hashes = hd.parse_hash_sei(nu.rbsp)
            if hashes is not None and res.recons:
                rec = res.recons[-1]
                ok = (md5_plane(rec.y) == hashes[0]
                      and md5_plane(rec.cb) == hashes[1]
                      and md5_plane(rec.cr) == hashes[2])
                res.hash_ok[-1] = bool(ok)
            continue
        if t in (NAL_IDR_W_RADL, NAL_IDR_N_LP, NAL_TRAIL_R):
            assert sps is not None and pps is not None, \
                "slice before parameter sets"
            is_idr = t in (NAL_IDR_W_RADL, NAL_IDR_N_LP)
            sh = hd.parse_slice_header(nu.rbsp, sps, pps, is_idr)
            W, H = sps.pad_width, sps.pad_height
            sao_on = sps.sao and (sh.sao_luma or sh.sao_chroma)
            if sh.slice_type == 2:
                dec = slice_dec.ISliceDecoder(sps, sh.qp, sao_on).decode(
                    sh.data)
                rec = recon_dec.recon_intra_frame(dec, W, H, sh.qp)
                inter_pic = False
            else:
                assert prev_rec is not None, "P slice without reference"
                dec = slice_dec.PSliceDecoder(
                    sps, sh.qp, sao_on,
                    is_b=sh.slice_type == 0).decode(sh.data)
                rec = recon_dec.recon_inter_frame(dec, prev_rec, W, H,
                                                  sh.qp)
                inter_pic = True
            rec = recon_dec.apply_loop_filters(
                rec, dec, sh.qp, deblock_on=not pps.deblock_disabled,
                sao_on=sao_on, inter_pic=inter_pic)
            res.recons.append(rec)
            res.frames.append(_crop(rec, sps))
            res.hash_ok.append(None)
            prev_rec = rec
            continue
        raise AssertionError(f"unsupported NAL type {t}")
    return res


def decode_file(path: str) -> DecodeResult:
    with open(path, "rb") as f:
        return decode_annexb(f.read())
