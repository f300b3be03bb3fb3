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
