#!/usr/bin/env python
"""Train ETH-CNN AI models end-to-end on synthetic content.

Pipeline (mirrors the reference training chain, SURVEY.md 3.3, with our
encoder as the label source): synthesize frames -> extract CU-depth
ground truth with the full (ungated) partition search -> build samples ->
train per-QP-band models -> save checkpoints under models/.

Usage: python tools/train_ai_models.py [--frames N] [--iters N] [--hm]
       (--hm uses the HM Extract_Data encoder for labels instead)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_content_frame(rng, width, height):
    """Mixed synthetic content: flat areas, gradients, edges, texture."""
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    kind = rng.randint(0, 4)
    y = np.full((height, width), float(rng.randint(40, 216)), np.float32)
    if kind >= 1:  # gradients
        y += (rng.rand() * 80 - 40) * xx / width \
            + (rng.rand() * 80 - 40) * yy / height
    if kind >= 2:  # blobs + edges
        for _ in range(rng.randint(3, 10)):
            cx, cy = rng.randint(0, width), rng.randint(0, height)
            r = rng.randint(5, 60)
            amp = rng.randint(-80, 80)
            d2 = (xx - cx) ** 2 + (yy - cy) ** 2
            y += amp * np.exp(-d2 / (2.0 * r * r))
        for _ in range(rng.randint(0, 4)):
            x0 = rng.randint(0, width)
            y += np.where(xx > x0, rng.randint(-50, 50), 0)
    if kind >= 3:  # texture patches
        ty0, tx0 = rng.randint(0, height // 2), rng.randint(0, width // 2)
        th, tw = rng.randint(32, height - ty0), rng.randint(32, width - tx0)
        y[ty0:ty0 + th, tx0:tx0 + tw] += \
            rng.randn(th, tw) * rng.randint(5, 40)
    y += rng.randn(height, width) * rng.rand() * 5
    from hevc_tpu.core.yuv import Frame
    yl = np.clip(y, 0, 255).astype(np.uint8)
    cb = np.full((height // 2, width // 2), 128, np.uint8)
    cr = np.full((height // 2, width // 2), 128, np.uint8)
    return Frame(yl, cb, cr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1200)
    ap.add_argument("--valid-frames", type=int, default=120,
                    help="disjoint frames for the validation split")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--iters", type=int, default=30000)
    ap.add_argument("--patience", type=int, default=10,
                    help="early-stop evals without valid improvement")
    ap.add_argument("--hm", action="store_true",
                    help="use HM Extract_Data for labels")
    ap.add_argument("--qps", type=int, nargs="+",
                    default=[22, 27, 32, 37])
    ap.add_argument("--out", default="models")
    ap.add_argument("--yuv-dir", default=os.environ.get("HEVC_TPU_YUV_DIR"),
                    help="natural-content corpus directory: catalog "
                    "sequences (train/data_info.py) found here replace "
                    "the synthetic generator (AI train/valid splits)")
    args = ap.parse_args()

    from hevc_tpu.train import dataset, labels, train_cnn

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(0)
    frames = vframes = None
    if args.yuv_dir:
        from hevc_tpu.core.yuv import read_yuv420
        from hevc_tpu.train import data_info

        def load_split(indices, budget):
            seqs = data_info.available(args.yuv_dir, indices)
            out = []
            for s in seqs:
                fr = read_yuv420(s.path, s.width, s.height)
                out.extend(fr[:max(1, budget // max(1, len(seqs)))])
            return out

        frames = load_split(data_info.AI_TRAIN, args.frames) or None
        vframes = load_split(data_info.AI_VALID, args.valid_frames) or None
        if frames:
            print(f"natural corpus: {len(frames)} train / "
                  f"{len(vframes or [])} valid frames from {args.yuv_dir}",
                  flush=True)
    if frames is None:
        # validation frames are DISJOINT content (own RNG stream), so the
        # valid loss measures generalization, not memorization
        frames = [synth_content_frame(rng, args.width, args.height)
                  for _ in range(args.frames)]
    else:
        # natural corpus: adopt the dominant frame size and keep only
        # frames matching it (mixed-resolution corpora otherwise break
        # np.stack below); a missing natural valid split falls back to
        # synthetic frames at that same size.
        args.height, args.width = frames[0].y.shape
        frames = [f for f in frames
                  if f.y.shape == (args.height, args.width)]
        if vframes is not None:
            vframes = [f for f in vframes
                       if f.y.shape == (args.height, args.width)] or None
    if vframes is None:
        vrng = np.random.RandomState(777)
        vframes = [synth_content_frame(vrng, args.width, args.height)
                   for _ in range(args.valid_frames)]
    frames_y = np.stack([f.y for f in frames])
    vframes_y = np.stack([f.y for f in vframes])

    all_parts = {}
    for qp in args.qps:
        t0 = time.time()
        if args.hm:
            lab = labels.extract_labels_hm(frames, qp, args.width,
                                           args.height)
            vlab = labels.extract_labels_hm(vframes, qp, args.width,
                                            args.height)
        else:
            lab = labels.extract_labels_own(frames, qp, args.width,
                                            args.height)
            vlab = labels.extract_labels_own(vframes, qp, args.width,
                                             args.height)
        luma, depth4 = dataset.build_samples(frames_y, lab, qp)
        vluma, vdepth4 = dataset.build_samples(vframes_y, vlab, qp)
        all_parts[qp] = (luma, depth4, vluma, vdepth4)
        frac = [float((depth4 == d).mean()) for d in range(4)]
        print(f"qp {qp}: {luma.shape[0]} train / {vluma.shape[0]} valid "
              f"samples in {time.time()-t0:.1f}s; "
              f"depth dist {[round(f, 2) for f in frac]}", flush=True)

    # train one model per band (each band here maps to one QP of the
    # sweep; reference uses one model per band)
    for qp in args.qps:
        luma, depth4, vluma, vdepth4 = all_parts[qp]
        n = luma.shape[0]
        valid = (vluma, np.full((vluma.shape[0],), qp, np.uint8), vdepth4)
        band = train_cnn.band_for_qp(qp)
        cfg = train_cnn.TrainConfig(iters=args.iters,
                                    eval_every=max(200, args.iters // 60),
                                    patience=args.patience,
                                    ckpt_path=os.path.join(
                                        args.out, f"ckpt_{band}.npz"),
                                    log=True)
        print(f"=== training band {band} (qp {qp}) ===", flush=True)
        params, history = train_cnn.train(
            luma, np.full((n,), qp, np.uint8), depth4, cfg, valid=valid)
        out_path = os.path.join(args.out, f"eth_cnn_{band}.npz")
        train_cnn.save_params(out_path, params)
        with open(os.path.join(args.out, "training_log.txt"), "a") as f:
            for rec in history:
                f.write(f"{band} {rec}\n")
        train_cnn.write_loss_accuracy_list(
            os.path.join(args.out, f"loss_accuracy_list_{band}.dat"),
            history)
        bi = int(np.argmin([r.get("valid_loss", np.inf)
                            for r in history]))
        print(f"saved {out_path}; best valid acc "
              f"{history[bi]['acc_64']:.3f}/{history[bi]['acc_32']:.3f}/"
              f"{history[bi]['acc_16']:.3f} at iter "
              f"{history[bi]['iter']}", flush=True)


if __name__ == "__main__":
    main()
