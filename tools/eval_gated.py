#!/usr/bin/env python
"""Measure the reference's value proposition on OUR encoder: gated
(ETH-CNN / ETH-CNN+LSTM HCPM) vs ungated (full RDO search), at both the
AI and LDP operating points, plus the HM-16.5 anchors.

The reference's north star is "60-70% AI / 50-60% LDP encode-time cut at
+2-3% / +1.5-2% BD-rate" (reference README.md:191-195) — obtained by
*skipping* RD checks on a sequential CPU encoder. Our TPU design
evaluates the CU tree as dense batched tensor work, so per-CTU gating is
a masking operation: the honest time saving it yields comes from
frame-level program narrowing (max-depth early exit, --early-exit) and
the speedup axis vs HM comes from MXU batching. This harness measures
all of it and writes one JSON.

Usage:
  python tools/eval_gated.py --width 416 --height 240 --frames 8 \
      --qps 22 27 32 37 --out results_value_prop.json [--no-hm]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import hevc_tpu

hevc_tpu.enable_compilation_cache()


def synth_clip(width, height, n_frames, moving=True):
    """Synthetic natural-ish clip: smooth gradients + textured regions +
    a moving block, so the CU tree is non-trivial and motion exists."""
    from hevc_tpu.core.yuv import Frame
    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    tex = rng.randint(-24, 25, (height, width)).astype(np.float32)
    tex_mask = ((xx // 64 + yy // 64) % 2).astype(np.float32)
    frames = []
    for t in range(n_frames):
        dx = 2 * t if moving else 0
        y = (90 + 60 * np.sin((xx - dx) / 53.0) * np.cos(yy / 37.0)
             + tex * tex_mask)
        # moving high-contrast square
        x0 = (30 + 3 * t) % max(width - 40, 1)
        y = y.copy()
        y[40:72, x0:x0 + 32] = 210
        y = np.clip(y, 0, 255).astype(np.uint8)
        cb = np.full((height // 2, width // 2), 118, np.uint8)
        cr = np.clip(128 + tex[::2, ::2] / 4, 0, 255).astype(np.uint8)
        frames.append(Frame(y, cb, cr))
    return frames


def psnr_frames(recons, frames, width, height):
    from hevc_tpu.core.yuv import psnr
    return float(np.mean([psnr(r.y[:height, :width], f.y)
                          for r, f in zip(recons, frames)]))


def encode_ai(frames, width, height, qp, gated, models_dir, early_exit):
    from hevc_tpu.entropy.headers import EncoderConfig
    from hevc_tpu.pipeline.ai import AIEncoder
    from hevc_tpu.train.train_cnn import load_params, band_for_qp

    cfg = EncoderConfig(width=width, height=height, qp=qp)
    params = None
    if gated:
        p = os.path.join(models_dir, f"eth_cnn_{band_for_qp(qp)}.npz")
        params = load_params(p)
    enc = AIEncoder(cfg, cnn_params=params, max_depth_exit=early_exit)
    enc.encode(frames[:1], with_hash_sei=False)      # compile outside timer
    t0 = time.perf_counter()
    stream, recons, _ = enc.encode(frames, with_hash_sei=False)
    dt = time.perf_counter() - t0
    return len(stream) * 8, psnr_frames(recons, frames, width, height), dt


def encode_ldp(frames, width, height, qp, gated, models_dir,
               early_exit=False, all_qps=None):
    from hevc_tpu.entropy.headers import EncoderConfig
    from hevc_tpu.pipeline.pframe import LDPEncoder
    from hevc_tpu.train.train_cnn import load_params, band_for_qp

    cfg = EncoderConfig(width=width, height=height, qp=qp, num_refs=4)
    lstm = None
    if gated:
        p = os.path.join(models_dir, f"eth_lstm_{band_for_qp(qp)}.npz")
        lstm = load_params(p)
    # Reference operating point: GOP-4 QP offsets AND rect PUs on.
    # Frame QP is a traced argument of ONE compiled psearch program
    # (round-5), so the offsets no longer key per-QP recompiles (the
    # round-3/4 harness had to disable them).
    enc = LDPEncoder(cfg, lstm_params=lstm, max_depth_exit=early_exit,
                     use_gop_qp=True, rect_pu=True)
    if all_qps:
        # one qp_set covering the WHOLE sweep -> the per-QP encoders
        # share one compiled psearch (persistent-cache hit across them)
        enc.extra_qps = tuple(sorted(
            {min(51, q + o) for q in all_qps
             for o in (0,) + tuple(cfg.gop_qp_offsets)}))
    enc.encode(frames[:2], with_hash_sei=False)      # compile outside timer
    t0 = time.perf_counter()
    stream, recons = enc.encode(frames, with_hash_sei=False)[:2]
    dt = time.perf_counter() - t0
    return len(stream) * 8, psnr_frames(recons, frames, width, height), dt


def encode_hm_cfg(frames, width, height, qp, cfg_text, timeout=14400):
    import subprocess
    import tempfile
    from hevc_tpu.evaltools.hm import ENCODER
    from hevc_tpu.core.yuv import write_yuv420, read_yuv420, psnr

    with tempfile.TemporaryDirectory() as td:
        write_yuv420(os.path.join(td, "in.yuv"), frames)
        with open(os.path.join(td, "enc.cfg"), "w") as f:
            f.write(cfg_text)
        t0 = time.perf_counter()
        proc = subprocess.run(
            [ENCODER, "-c", "enc.cfg", "-i", "in.yuv", "-b", "str.bin",
             "-o", "rec.yuv"],
            cwd=td, capture_output=True, text=True, timeout=timeout)
        dt = time.perf_counter() - t0
        assert proc.returncode == 0, proc.stderr
        bits = os.path.getsize(os.path.join(td, "str.bin")) * 8
        recs = read_yuv420(os.path.join(td, "rec.yuv"), width, height)
        ps = float(np.mean([psnr(r.y, f.y)
                            for r, f in zip(recs, frames)]))
    return bits, ps, dt


def sweep(frames, width, height, qps, fn, **kw):
    out = {"bits": [], "psnr": [], "time": []}
    for qp in qps:
        b, p, t = fn(frames, width, height, qp, **kw)
        out["bits"].append(b)
        out["psnr"].append(p)
        out["time"].append(t)
        print(f"  qp{qp}: {b / 1000:.1f} kb  {p:.2f} dB  {t:.2f}s",
              flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--qps", type=int, nargs="+", default=[22, 27, 32, 37])
    ap.add_argument("--models-dir", default="models")
    ap.add_argument("--no-hm", action="store_true")
    ap.add_argument("--no-ldp", action="store_true")
    ap.add_argument("--early-exit", action="store_true",
                    help="enable frame-level max-depth program narrowing")
    ap.add_argument("--out", default="results_value_prop.json")
    args = ap.parse_args()

    from hevc_tpu.evaltools import bdrate
    from hevc_tpu.train.labels import hm_intra_cfg, hm_ldp_cfg

    frames = synth_clip(args.width, args.height, args.frames)
    res = {"width": args.width, "height": args.height,
           "n_frames": args.frames, "qps": list(args.qps),
           "early_exit": args.early_exit}

    def point(name, gated_sweep, ungated_sweep, hm_sweep):
        d = {"gated": gated_sweep, "ungated": ungated_sweep}
        d["time_saving_pct"] = 100.0 * (1.0 - np.sum(gated_sweep["time"])
                                        / np.sum(ungated_sweep["time"]))
        try:
            d["bd_rate_gated_vs_ungated"] = bdrate.bd_rate(
                ungated_sweep["bits"], ungated_sweep["psnr"],
                gated_sweep["bits"], gated_sweep["psnr"])
        except Exception as e:
            d["bd_rate_error"] = str(e)
        if hm_sweep is not None:
            d["hm"] = hm_sweep
            try:
                d["bd_rate_gated_vs_hm"] = bdrate.bd_rate(
                    hm_sweep["bits"], hm_sweep["psnr"],
                    gated_sweep["bits"], gated_sweep["psnr"])
            except Exception as e:
                d["bd_rate_vs_hm_error"] = str(e)
            d["speedup_gated_vs_hm"] = float(
                np.sum(hm_sweep["time"]) / np.sum(gated_sweep["time"]))
        res[name] = d
        print(f"[{name}] time_saving {d['time_saving_pct']:+.1f}%  "
              f"bd(gated vs ungated) "
              f"{d.get('bd_rate_gated_vs_ungated', float('nan')):+.2f}%  "
              f"speedup vs HM "
              f"{d.get('speedup_gated_vs_hm', float('nan')):.2f}x",
              flush=True)

    print("[AI gated]", flush=True)
    ai_g = sweep(frames, args.width, args.height, args.qps, encode_ai,
                 gated=True, models_dir=args.models_dir,
                 early_exit=args.early_exit)
    print("[AI ungated]", flush=True)
    ai_u = sweep(frames, args.width, args.height, args.qps, encode_ai,
                 gated=False, models_dir=args.models_dir, early_exit=False)
    ai_hm = None
    if not args.no_hm:
        print("[AI HM]", flush=True)
        ai_hm = sweep(frames, args.width, args.height, args.qps,
                      lambda fr, w, h, q: encode_hm_cfg(
                          fr, w, h, q, hm_intra_cfg(w, h, q, len(fr))))
    point("ai", ai_g, ai_u, ai_hm)

    if not args.no_ldp:
        print("[LDP gated]", flush=True)
        ldp_g = sweep(frames, args.width, args.height, args.qps,
                      encode_ldp, gated=True, models_dir=args.models_dir,
                      early_exit=args.early_exit, all_qps=tuple(args.qps))
        print("[LDP ungated]", flush=True)
        ldp_u = sweep(frames, args.width, args.height, args.qps,
                      encode_ldp, gated=False, models_dir=args.models_dir,
                      all_qps=tuple(args.qps))
        ldp_hm = None
        if not args.no_hm:
            print("[LDP HM]", flush=True)
            ldp_hm = sweep(frames, args.width, args.height, args.qps,
                           lambda fr, w, h, q: encode_hm_cfg(
                               fr, w, h, q, hm_ldp_cfg(w, h, q, len(fr))))
        point("ldp", ldp_g, ldp_u, ldp_hm)

    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
