#!/usr/bin/env python
"""Train the LDP models end-to-end on synthetic temporal content.

Pipeline (mirrors the reference 4-stage LDP chain, SURVEY.md 3.4, with
our encoder as the source): synthesize a moving sequence -> per QP, one
full ungated inter encode yields CU-depth labels AND pre-encode residues
(train/labels.extract_labels_ldp) -> stage 1: all-QP residue-CNN
pretraining (train/train_resi_cnn) -> stage 2: per-QP-band ETH-LSTM
training over 20-step temporal chains (train/train_lstm).

Usage: python tools/train_ldp_models.py [--frames N] [--iters N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_sequence(rng, width, height, n_frames):
    """Temporal content: a static background with translating blobs and
    texture patches, so residues carry learnable partition signal."""
    from tools.train_ai_models import synth_content_frame
    from hevc_tpu.core.yuv import Frame
    base = synth_content_frame(rng, width + 64, height + 64).y.astype(
        np.float32)
    vx, vy = rng.randint(1, 4), rng.randint(0, 3)
    frames = []
    for i in range(n_frames):
        ox, oy = (vx * i) % 64, (vy * i) % 64
        y = base[oy:oy + height, ox:ox + width].copy()
        # a couple of independently moving busy patches
        for k in range(2):
            px = (40 * k + 9 * i) % max(1, width - 48)
            py = (70 * k + 5 * i) % max(1, height - 48)
            y[py:py + 48, px:px + 48] += rng.randn(48, 48) * 25
        yl = np.clip(y, 0, 255).astype(np.uint8)
        cb = np.full((height // 2, width // 2), 128, np.uint8)
        cr = np.full((height // 2, width // 2), 128, np.uint8)
        frames.append(Frame(yl, cb, cr))
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60,
                    help="frames per sequence")
    ap.add_argument("--seqs", type=int, default=6,
                    help="training sequences (distinct content)")
    ap.add_argument("--valid-seqs", type=int, default=1,
                    help="disjoint validation sequences")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--cnn-iters", type=int, default=12000)
    ap.add_argument("--lstm-iters", type=int, default=8000)
    ap.add_argument("--qps", type=int, nargs="+", default=[22, 27, 32, 37])
    ap.add_argument("--out", default="models")
    args = ap.parse_args()

    from hevc_tpu.train import (dataset_ldp, labels, train_cnn,
                                train_lstm, train_resi_cnn)

    os.makedirs(args.out, exist_ok=True)

    def harvest(seed_base, n_seqs, tag):
        """Per-QP samples + per-sequence chain inputs across sequences."""
        resi_by_qp = {qp: [] for qp in args.qps}
        depth_by_qp = {qp: [] for qp in args.qps}
        fig_parts, seq_meta = [], []
        for s in range(n_seqs):
            rng = np.random.RandomState(seed_base + s)
            frames = synth_sequence(rng, args.width, args.height,
                                    args.frames)
            pocs = None
            for qp in args.qps:
                t0 = time.time()
                depth4, resi, pocs = labels.extract_labels_ldp(
                    frames, qp, args.width, args.height)
                P, B = depth4.shape[:2]
                resi_by_qp[qp].append(resi.reshape(P * B, 64, 64))
                depth_by_qp[qp].append(depth4.reshape(P * B, 4, 4))
                print(f"{tag} seq {s} qp {qp}: {P * B} samples in "
                      f"{time.time() - t0:.1f}s", flush=True)
            P, B = len(pocs), resi_by_qp[args.qps[0]][-1].shape[0] \
                // len(pocs)
            fig_parts.append(np.repeat(pocs % 4, B).astype(np.int32))
            seq_meta.append((pocs, P, B))
        return ({qp: np.concatenate(v) for qp, v in resi_by_qp.items()},
                {qp: np.concatenate(v) for qp, v in depth_by_qp.items()},
                np.concatenate(fig_parts), seq_meta)

    resi_tr, depth_tr, fig_tr, meta_tr = harvest(0, args.seqs, "train")
    resi_va, depth_va, fig_va, meta_va = harvest(5000, args.valid_seqs,
                                                 "valid")

    # stage 1: all-QP residue CNN (reference train_resi_CNN_CTU64.py)
    print("=== stage 1: residue-CNN pretraining (all-QP) ===", flush=True)
    cfg1 = train_resi_cnn.ResiCNNTrainConfig(
        iters=args.cnn_iters, eval_every=max(200, args.cnn_iters // 40))
    cnn_params, hist1 = train_resi_cnn.train(resi_tr, depth_tr, fig_tr,
                                             cfg1)
    train_cnn.write_loss_accuracy_list(
        os.path.join(args.out, "loss_accuracy_list_resi_cnn.dat"), hist1)
    with open(os.path.join(args.out, "training_log.txt"), "a") as f:
        for rec in hist1:
            f.write(f"resi_cnn {rec}\n")
    print(f"stage 1 final acc {hist1[-1]['acc_64']:.3f}/"
          f"{hist1[-1]['acc_32']:.3f}/{hist1[-1]['acc_16']:.3f}",
          flush=True)

    # stage 2: per-QP-band LSTMs over temporal chains
    # (reference train_LSTM_CTU64.py; chains follow each CTU position)
    nx = -(-args.width // 64)
    ny = -(-args.height // 64)

    def chains_for(resi_by_qp, depth_by_qp, meta, qp):
        crs, cds, cfs = [], [], []
        off = 0
        for (pocs, P, B) in meta:
            n = P * B
            fidx = np.repeat(pocs, B)
            line = np.tile(np.repeat(np.arange(ny), nx), P)
            col = np.tile(np.tile(np.arange(nx), ny), P)
            cr, cd, cf = dataset_ldp.build_ldp_chains(
                resi_by_qp[qp][off:off + n], depth_by_qp[qp][off:off + n],
                fidx, line, col, np.zeros(n, np.int32))
            off += n
            if cr.shape[0]:
                crs.append(cr)
                cds.append(cd)
                cfs.append(cf)
        if not crs:
            return None
        return (np.concatenate(crs), np.concatenate(cds),
                np.concatenate(cfs))

    for qp in args.qps:
        tr = chains_for(resi_tr, depth_tr, meta_tr, qp)
        va = chains_for(resi_va, depth_va, meta_va, qp)
        if tr is None:
            print(f"qp {qp}: not enough consecutive frames for chains")
            continue
        cr, cd, cf = tr
        qseq = np.full(cr.shape[0], qp, np.float32)
        band = train_cnn.band_for_qp(qp)
        print(f"=== stage 2: LSTM band {band} ({cr.shape[0]} train / "
              f"{0 if va is None else va[0].shape[0]} valid chains) ===",
              flush=True)
        cfg2 = train_lstm.LSTMTrainConfig(
            iters=args.lstm_iters,
            eval_every=max(100, args.lstm_iters // 40))
        valid = None
        if va is not None:
            valid = (va[0], np.full(va[0].shape[0], qp, np.float32),
                     va[2], va[1])
        params, hist2 = train_lstm.train(cr, qseq, cf, cd, cfg2,
                                         params=cnn_params, valid=valid)
        out_path = os.path.join(args.out, f"eth_lstm_{band}.npz")
        train_cnn.save_params(out_path, params)
        train_cnn.write_loss_accuracy_list(
            os.path.join(args.out, f"loss_accuracy_list_lstm_{band}.dat"),
            hist2)
        with open(os.path.join(args.out, "training_log.txt"), "a") as f:
            for rec in hist2:
                f.write(f"lstm_{band} {rec}\n")
        print(f"saved {out_path}; final acc {hist2[-1]['acc_64']:.3f}/"
              f"{hist2[-1]['acc_32']:.3f}/{hist2[-1]['acc_16']:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
