"""LDP training datasets: residue-sample format + temporal LSTM chains.

Reference interop (Extract_Data/extract_data_LDP_LDB_RA.py:122-156):
16516-byte samples = 64-byte header (n_frames=1, width u16, height u16 at
offsets 2/4, frame idx u32 at 10, patch line/col u16 at 14/16, sequence
idx u16 at 18) + 4 blocks of (qp u8, 16-byte 4x4 depth labels,
4096-byte residue patch).

Native format: npz arrays (resi [N,64,64] u8, qp [N] u8, depth4 [N,4,4]
u8, frame_idx/line/col/seq for temporal chaining). Temporal chains for
BPTT (reference get_LSTM_input.py:226-238: step back one frame's worth
of patches per step) are built by (seq, line, col) grouping here.
"""

from __future__ import annotations

import numpy as np

LDP_BLOCK = 1 + 16 + 4096
LDP_SAMPLE_BYTES = 64 + 4 * LDP_BLOCK


def write_reference_ldp_samples(path, resi_by_qp: dict, depth4_by_qp: dict,
                                frame_idx, line, col, seq=0, mode="ab"):
    """Write one frame's CTU samples in the reference 16516-byte format.

    resi_by_qp: {qp: [N,64,64] u8}; depth4_by_qp: {qp: [N,4,4] u8};
    frame_idx: int; line/col: [N] patch coords.
    """
    qps = sorted(resi_by_qp)
    assert len(qps) == 4, "reference format stores exactly 4 QP blocks"
    n = next(iter(resi_by_qp.values())).shape[0]
    buf = np.full((n, LDP_SAMPLE_BYTES), 255, np.uint8)
    buf[:, 0] = 1
    w = None
    buf[:, 10] = frame_idx & 0xFF
    buf[:, 11] = (frame_idx >> 8) & 0xFF
    buf[:, 12] = (frame_idx >> 16) & 0xFF
    buf[:, 13] = (frame_idx >> 24) & 0xFF
    buf[:, 14] = np.asarray(line) & 0xFF
    buf[:, 15] = np.asarray(line) >> 8
    buf[:, 16] = np.asarray(col) & 0xFF
    buf[:, 17] = np.asarray(col) >> 8
    buf[:, 18] = seq & 0xFF
    buf[:, 19] = seq >> 8
    for i, qp in enumerate(qps):
        start = 64 + i * LDP_BLOCK
        buf[:, start] = qp
        buf[:, start + 1:start + 17] = depth4_by_qp[qp].reshape(n, 16)
        buf[:, start + 17:start + 17 + 4096] = \
            resi_by_qp[qp].reshape(n, 4096)
    with open(path, mode) as f:
        f.write(buf.tobytes())


def read_reference_ldp_samples(path):
    """Parse 16516-byte samples -> dict of arrays."""
    data = np.fromfile(path, np.uint8)
    assert data.size % LDP_SAMPLE_BYTES == 0
    n = data.size // LDP_SAMPLE_BYTES
    data = data.reshape(n, LDP_SAMPLE_BYTES)
    out = {
        "frame_idx": (data[:, 10].astype(np.int64)
                      | (data[:, 11].astype(np.int64) << 8)
                      | (data[:, 12].astype(np.int64) << 16)
                      | (data[:, 13].astype(np.int64) << 24)),
        "line": data[:, 14].astype(np.int32) | (data[:, 15].astype(np.int32) << 8),
        "col": data[:, 16].astype(np.int32) | (data[:, 17].astype(np.int32) << 8),
        "seq": data[:, 18].astype(np.int32) | (data[:, 19].astype(np.int32) << 8),
        "blocks": [],
    }
    for i in range(4):
        start = 64 + i * LDP_BLOCK
        out["blocks"].append({
            "qp": data[:, start].copy(),
            "depth4": data[:, start + 1:start + 17].reshape(n, 4, 4).copy(),
            "resi": data[:, start + 17:start + 17 + 4096]
                    .reshape(n, 64, 64).copy(),
        })
    return out


# HM encoder_randomaccess_main.cfg GOP-8 hierarchy: the POC (display
# offset from the GOP anchor) of each encode-order GOP slot. Slot 0 codes
# the GOP-closing picture first, then the binary-subdivision B pictures.
RA_GOP8_POC = (8, 4, 2, 1, 3, 6, 5, 7)


def encode_to_display_order(config: str, i_enc: int, n_frames: int) -> int:
    """Display index of the i-th *encoded* frame.

    LDP/LDB code in display order (identity). RA codes an IDR first, then
    GOP-8 hierarchical B pictures whose display offsets follow RA_GOP8_POC;
    a tail GOP shorter than 8 keeps the same relative order restricted to
    the frames that exist (reference behavior:
    extract_data_LDP_LDB_RA.py:68-82).
    """
    if config != "RA":
        return i_enc
    if i_enc == 0:
        return 0
    i_gop, slot = divmod(i_enc - 1, 8)
    gop_len = min(n_frames - 1 - i_gop * 8, 8)
    offsets = [p - 1 for p in RA_GOP8_POC if p - 1 < gop_len]
    return 1 + i_gop * 8 + offsets[slot]


def display_to_encode_order(config: str, n_frames: int) -> np.ndarray:
    """[n_frames] int32: encode index of each display-order frame."""
    out = np.empty(n_frames, np.int32)
    for i_enc in range(n_frames):
        out[encode_to_display_order(config, i_enc, n_frames)] = i_enc
    return out


def build_samples_encode_order(config: str, resi_by_qp: dict,
                               depth4_by_qp: dict, line, col, seq=0):
    """Assemble per-frame CTU samples in ENCODE order for LDP/LDB/RA.

    resi_by_qp / depth4_by_qp: {qp: [n_frames, N, 64, 64] / [n_frames, N,
    4, 4]} indexed by DISPLAY order (how residues/labels are naturally
    produced). Frame 0 (the IDR) carries no inter residue and is skipped,
    matching the reference (extract_data_LDP_LDB_RA.py:192).

    Returns (resi [M,64,64] u8 stacked per (encode frame, CTU),
    depth4 [M,4,4] u8 per qp dicts, frame_idx [M] display indices) ready
    for write_reference_ldp_samples / build_ldp_chains.
    """
    qps = sorted(resi_by_qp)
    n_frames = next(iter(resi_by_qp.values())).shape[0]
    rs = {qp: [] for qp in qps}
    ds = {qp: [] for qp in qps}
    fidx = []
    for i_enc in range(n_frames):
        i_disp = encode_to_display_order(config, i_enc, n_frames)
        if i_disp == 0:
            continue
        for qp in qps:
            rs[qp].append(resi_by_qp[qp][i_disp])
            ds[qp].append(depth4_by_qp[qp][i_disp])
        n_ctu = resi_by_qp[qps[0]][i_disp].shape[0]
        fidx.append(np.full(n_ctu, i_disp, np.int64))
    cat = lambda d: {qp: np.concatenate(v, 0) for qp, v in d.items()}
    return (cat(rs), cat(ds),
            np.concatenate(fidx) if fidx else np.zeros(0, np.int64),
            np.tile(np.asarray(line), n_frames - 1) if fidx else line,
            np.tile(np.asarray(col), n_frames - 1) if fidx else col)


def build_ldp_chains(resi, depth4, frame_idx, line, col, seq,
                     chain_len: int = 20, stride: int = 10):
    """Build temporal chains for BPTT from per-CTU frame samples.

    All inputs indexed per sample. Returns (resi_chains [M, T, 64, 64],
    depth_chains [M, T, 4, 4], fig_chains [M, T]) where each chain follows
    one CTU position through `chain_len` consecutive frames (reference
    get_LSTM_input.py temporal stepping; stride controls overlap,
    config.py:16).
    """
    key = (np.asarray(seq).astype(np.int64) << 40) \
        | (np.asarray(line).astype(np.int64) << 20) \
        | np.asarray(col).astype(np.int64)
    chains_r, chains_d, chains_f = [], [], []
    for k in np.unique(key):
        idx = np.nonzero(key == k)[0]
        order = idx[np.argsort(frame_idx[idx])]
        fi = frame_idx[order]
        for s in range(0, len(order) - chain_len + 1, stride):
            window = order[s:s + chain_len]
            fw = fi[s:s + chain_len]
            if not np.all(np.diff(fw) == 1):
                continue  # require consecutive frames
            chains_r.append(resi[window])
            chains_d.append(depth4[window])
            chains_f.append(fw % 4)
    if not chains_r:
        return (np.zeros((0, chain_len, 64, 64), np.uint8),
                np.zeros((0, chain_len, 4, 4), np.uint8),
                np.zeros((0, chain_len), np.int32))
    return (np.stack(chains_r), np.stack(chains_d),
            np.stack(chains_f).astype(np.int32))
