"""Per-CTU SAO parameter syntax (H.265 7.3.8.3 sample_adaptive_offset).

Shared by the I- and P-slice CABAC drivers. Merge flags are coded 1
whenever the decided parameter set equals the left/up CTU's (the
decoder copies all components on merge, so equality of the full set is
the exact condition).

Behavioral counterpart: HM TEncSbac::codeSAOBlkParam.
"""

from __future__ import annotations

import numpy as np

SAO_NONE, SAO_BAND, SAO_EDGE = 0, 1, 2


def params_key(p, ci: int):
    """Canonical comparable form of one CTU's full SAO parameter set."""
    out = []
    for c in range(3):
        t = int(p.type_idx[c, ci])
        out.append((
            t,
            int(p.eo_class[c, ci]) if t == SAO_EDGE else -1,
            int(p.band_pos[c, ci]) if t == SAO_BAND else -1,
            tuple(int(v) for v in p.offsets[c, ci]) if t else (0, 0, 0, 0),
        ))
    return tuple(out)


def _code_type_idx(enc, ctx, t: int):
    """sao_type_idx_*: TR cMax=2, first bin ctx-coded, second bypass."""
    enc.encode_bin(ctx, ctx.idx("sao_type"), int(t > 0))
    if t > 0:
        enc.encode_bypass(int(t == SAO_EDGE))   # 0 -> band, 1 -> edge


def _code_offset_abs(enc, v: int):
    """sao_offset_abs: TR cMax=7, all bypass."""
    for _ in range(v):
        enc.encode_bypass(1)
    if v < 7:
        enc.encode_bypass(0)


def code_sao_ctu(enc, ctx, p, ci: int, cx: int, cy: int, nx: int):
    """Code the SAO parameters of CTU ci (raster (cx, cy))."""
    key = params_key(p, ci)
    merge_left = cx > 0 and params_key(p, ci - 1) == key
    if cx > 0:
        enc.encode_bin(ctx, ctx.idx("sao_merge"), int(merge_left))
    if not merge_left and cy > 0:
        merge_up = params_key(p, ci - nx) == key
        enc.encode_bin(ctx, ctx.idx("sao_merge"), int(merge_up))
        if merge_up:
            return
    if merge_left:
        return
    for c in range(3):
        t = int(p.type_idx[c, ci])
        if c in (0, 1):
            _code_type_idx(enc, ctx, t)
        if t == SAO_NONE:
            continue
        offs = [int(v) for v in p.offsets[c, ci]]
        for v in offs:
            _code_offset_abs(enc, abs(v))
        if t == SAO_BAND:
            for v in offs:
                if v != 0:
                    enc.encode_bypass(int(v < 0))
            enc.encode_bypass_bins(int(p.band_pos[c, ci]), 5)
        elif c in (0, 1):
            enc.encode_bypass_bins(int(p.eo_class[c, ci]), 2)
