"""Training datasets: native arrays + reference 4992-byte AI interop.

Native format: .npz with luma [N,64,64] u8, qp [N] u8, depth4 [N,4,4] u8 —
the semantic content of the reference's packed samples without the
byte-offset indexing.

Reference interop (Extract_Data/extract_data_AI.py:94-111): 4992-byte
samples = 4096 luma + 64 pad + 52 x 16-byte per-QP 4x4 depth slots
(initialized to 255 = empty); only full 64x64 patches are emitted.
"""

from __future__ import annotations

import numpy as np

SAMPLE_BYTES = 4096 + 64 + 52 * 16


def build_samples(frames_y, labels16, qp: int):
    """Cut full CTUs + their 4x4 depth labels from frames.

    frames_y: [F, H, W] uint8; labels16: [F, H16, W16] uint8 (16px units).
    Returns (luma [N,64,64], depth4 [N,4,4]).
    """
    lum, dep = [], []
    for y, lab in zip(frames_y, labels16):
        h, w = y.shape
        for by in range(h // 64):
            for bx in range(w // 64):
                lum.append(y[by * 64:(by + 1) * 64, bx * 64:(bx + 1) * 64])
                dep.append(lab[by * 4:(by + 1) * 4, bx * 4:(bx + 1) * 4])
    return np.stack(lum).astype(np.uint8), np.stack(dep).astype(np.uint8)


def save_native(path, luma, qp, depth4):
    np.savez_compressed(path, luma=luma,
                        qp=np.broadcast_to(np.uint8(qp), (luma.shape[0],)),
                        depth4=depth4)


def load_native(paths):
    lum, qps, dep = [], [], []
    for p in np.atleast_1d(paths):
        z = np.load(p)
        lum.append(z["luma"])
        qps.append(z["qp"])
        dep.append(z["depth4"])
    return (np.concatenate(lum), np.concatenate(qps), np.concatenate(dep))


def write_reference_samples(path, luma, depth4_by_qp: dict, mode="wb"):
    """Write reference-format 4992-byte samples.

    depth4_by_qp: {qp: [N, 4, 4] uint8} (same N as luma).
    """
    n = luma.shape[0]
    buf = np.full((n, SAMPLE_BYTES), 255, np.uint8)
    buf[:, :4096] = luma.reshape(n, 4096)
    for qp, d4 in depth4_by_qp.items():
        start = 4096 + 64 + qp * 16
        buf[:, start:start + 16] = d4.reshape(n, 16)
    with open(path, mode) as f:
        f.write(buf.tobytes())


def read_reference_samples(path):
    """Parse reference 4992-byte samples.

    Returns (luma [N,64,64] u8, depth4_by_qp {qp: [N,4,4] or None-mask}).
    Slots equal to 255 everywhere are treated as absent.
    """
    data = np.fromfile(path, np.uint8)
    assert data.size % SAMPLE_BYTES == 0, "not a 4992-byte sample file"
    n = data.size // SAMPLE_BYTES
    data = data.reshape(n, SAMPLE_BYTES)
    luma = data[:, :4096].reshape(n, 64, 64)
    by_qp = {}
    for qp in range(52):
        start = 4096 + 64 + qp * 16
        slot = data[:, start:start + 16]
        if not (slot == 255).all():
            by_qp[qp] = slot.reshape(n, 4, 4)
    return luma, by_qp


def batches(luma, qp, depth4, batch_size: int, rng: np.random.RandomState,
            n_batches: int):
    """Random-sample minibatch generator (reference
    input_data.next_batch_random semantics: sample with replacement)."""
    n = luma.shape[0]
    for _ in range(n_batches):
        idx = rng.randint(0, n, batch_size)
        yield luma[idx], qp[idx].astype(np.float32), \
            depth4[idx].astype(np.float32)
