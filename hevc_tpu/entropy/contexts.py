"""CABAC context models: layout + standard init values (H.265 9.3.2.2).

Init tables are the standard's (Tables 9-5..9-42), listed per initType:
index 0 = I slice, 1 = P slice (cabac_init_flag=0), 2 = B slice.
(The reference HM stores the same constants in ContextTables.h with rows
ordered B,P,I; values here are the standard's, re-keyed by initType.)
"""

from __future__ import annotations

import numpy as np

from .cabac import init_context_state

CNU = 154

# name -> list of 3 init rows [I, P, B]
INIT_VALUES = {
    "sao_merge": [[153], [153], [153]],
    "sao_type": [[200], [185], [160]],
    "split_cu": [[139, 141, 157], [107, 139, 126], [107, 139, 126]],
    "cu_transquant_bypass": [[154], [154], [154]],
    "skip_flag": [[CNU] * 3, [197, 185, 201], [197, 185, 201]],
    "merge_flag": [[CNU], [110], [154]],
    "merge_idx": [[CNU], [122], [137]],
    "part_mode": [[184, CNU, CNU, CNU], [154, 139, 154, 154],
                  [154, 139, 154, 154]],
    "pred_mode": [[CNU], [149], [134]],
    "prev_intra_luma_pred": [[184], [154], [183]],
    "chroma_pred_mode": [[63, 139], [152, 139], [152, 139]],
    "inter_dir": [[CNU] * 5, [95, 79, 63, 31, 31], [95, 79, 63, 31, 31]],
    "mvd": [[CNU] * 2, [140, 198], [169, 198]],
    "ref_pic": [[CNU] * 2, [153, 153], [153, 153]],
    "dqp": [[154] * 3, [154] * 3, [154] * 3],
    "qt_cbf_luma": [[111, 141, CNU, CNU, CNU], [153, 111, CNU, CNU, CNU],
                    [153, 111, CNU, CNU, CNU]],
    "qt_cbf_chroma": [[94, 138, 182, 154, 154], [149, 107, 167, 154, 154],
                      [149, 92, 167, 154, 154]],
    "trans_subdiv": [[153, 138, 138], [124, 138, 94], [224, 167, 122]],
    # coded_sub_block_flag: [luma0, luma1, chroma0, chroma1]
    "sig_cg": [[91, 171, 134, 141], [121, 140, 61, 154], [121, 140, 61, 154]],
    # sig_coeff_flag: 28 luma (DC, 8 map, 6 8x8-diag, 6 8x8-other,
    # 3 NxN-first-CG, 3 NxN-other, 1 single) + 16 chroma.
    "sig_flag": [
        [111,
         111, 125, 110, 110, 94, 124, 108, 124,
         107, 125, 141, 179, 153, 125,
         107, 125, 141, 179, 153, 125,
         107, 125, 141, 179, 153, 125,
         141,
         140,
         139, 182, 182, 152, 136, 152, 136, 153,
         136, 139, 111,
         136, 139, 111,
         111],
        [155,
         154, 139, 153, 139, 123, 123, 63, 153,
         166, 183, 140, 136, 153, 154,
         166, 183, 140, 136, 153, 154,
         166, 183, 140, 136, 153, 154,
         140,
         170,
         153, 123, 123, 107, 121, 107, 121, 167,
         151, 183, 140,
         151, 183, 140,
         140],
        [170,
         154, 139, 153, 139, 123, 123, 63, 124,
         166, 183, 140, 136, 153, 154,
         166, 183, 140, 136, 153, 154,
         166, 183, 140, 136, 153, 154,
         140,
         170,
         153, 138, 138, 122, 121, 122, 121, 167,
         151, 183, 140,
         151, 183, 140,
         140],
    ],
    # last_sig_coeff_{x,y}_prefix: 15 luma + 15 chroma each.
    "last_x": [
        [110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143, 127, 111,
         79, 108, 123, 63] + [CNU] * 12,
        [125, 110, 94, 110, 95, 79, 125, 111, 110, 78, 110, 111, 111, 95, 94,
         108, 123, 108] + [CNU] * 12,
        [125, 110, 124, 110, 95, 94, 125, 111, 111, 79, 125, 126, 111, 111,
         79, 108, 123, 93] + [CNU] * 12,
    ],
    "last_y": [
        [110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143, 127, 111,
         79, 108, 123, 63] + [CNU] * 12,
        [125, 110, 94, 110, 95, 79, 125, 111, 110, 78, 110, 111, 111, 95, 94,
         108, 123, 108] + [CNU] * 12,
        [125, 110, 124, 110, 95, 94, 125, 111, 111, 79, 125, 126, 111, 111,
         79, 108, 123, 93] + [CNU] * 12,
    ],
    # coeff_abs_level_greater1: 4 sets x 4 luma + 2 sets x 4 chroma.
    "one_flag": [
        [140, 92, 137, 138, 140, 152, 138, 139, 153, 74, 149, 92, 139, 107,
         122, 152, 140, 179, 166, 182, 140, 227, 122, 197],
        [154, 196, 196, 167, 154, 152, 167, 182, 182, 134, 149, 136, 153, 121,
         136, 137, 169, 194, 166, 167, 154, 167, 137, 182],
        [154, 196, 167, 167, 154, 152, 167, 182, 182, 134, 149, 136, 153, 121,
         136, 122, 169, 208, 166, 167, 154, 152, 167, 182],
    ],
    # coeff_abs_level_greater2: 4 luma sets + 2 chroma sets.
    "abs_flag": [
        [138, 153, 136, 167, 152, 152],
        [107, 167, 91, 122, 107, 167],
        [107, 167, 91, 107, 107, 167],
    ],
    "mvp_idx": [[CNU], [168], [168]],
    "transform_skip": [[139, 139], [139, 139], [139, 139]],
    "chroma_qp_adj_flag": [[154], [154], [154]],
    "chroma_qp_adj_idc": [[154], [154], [154]],
    # appended after the I-slice set so native/hevc_entropy.cpp offsets
    # stay valid (it only codes I slices)
    "qt_root_cbf": [[CNU], [79], [79]],
}


def _build_layout():
    layout = {}
    off = 0
    for name, rows in INIT_VALUES.items():
        count = len(rows[0])
        assert all(len(r) == count for r in rows), name
        layout[name] = (off, count)
        off += count
    return layout, off


LAYOUT, NUM_CONTEXTS = _build_layout()


class ContextModels:
    """Flat (state, mps) arrays for all context models of a slice."""

    def __init__(self, init_type: int, qp: int):
        self.state = np.zeros(NUM_CONTEXTS, np.int32)
        self.mps = np.zeros(NUM_CONTEXTS, np.int32)
        for name, rows in INIT_VALUES.items():
            off, count = LAYOUT[name]
            for i, iv in enumerate(rows[init_type]):
                s, m = init_context_state(iv, qp)
                self.state[off + i] = s
                self.mps[off + i] = m

    def idx(self, name: str, i: int = 0) -> int:
        off, count = LAYOUT[name]
        assert 0 <= i < count, (name, i, count)
        return off + i

    def copy(self):
        c = object.__new__(ContextModels)
        c.state = self.state.copy()
        c.mps = self.mps.copy()
        return c
