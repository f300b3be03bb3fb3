#!/usr/bin/env python
"""BD-rate + speed evaluation of our AI encoder vs reference HM-16.5.

Encodes a synthetic clip at QP 22/27/32/37 with both encoders and prints
rate/PSNR curves, BD-rate, and encode-time speedup. Options gate the
encoder with a trained ETH-CNN checkpoint.

Usage: python tools/eval_bdrate.py [--width W] [--height H] [--frames N]
         [--model models/eth_cnn_qp30~35.npz] [--no-hm] [--out results.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import hevc_tpu

hevc_tpu.enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--qps", type=int, nargs="+", default=[22, 27, 32, 37])
    ap.add_argument("--model", default=None)
    ap.add_argument("--models-dir", default=None,
                    help="pick eth_cnn_<band>.npz per QP from this dir")
    ap.add_argument("--no-hm", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from hevc_tpu.evaltools import bdrate
    from tests.test_e2e_bitstream import synth_frame

    frames = [synth_frame(args.width, args.height, seed=100 + s)
              for s in range(args.frames)]

    from hevc_tpu.train.train_cnn import load_params, band_for_qp

    def params_for_qp(qp):
        if args.models_dir:
            p = os.path.join(args.models_dir,
                             f"eth_cnn_{band_for_qp(qp)}.npz")
            return load_params(p)
        if args.model:
            return load_params(args.model)
        return None

    # run per-QP with band-selected model
    ours = {"bits": [], "psnr": [], "time": []}
    hm_r = {"bits": [], "psnr": [], "time": []}
    for qp in args.qps:
        b, p, t = bdrate.encode_ours(frames, args.width, args.height, qp,
                                     params_for_qp(qp))
        ours["bits"].append(b); ours["psnr"].append(p); ours["time"].append(t)
        if not args.no_hm:
            b, p, t = bdrate.encode_hm(frames, args.width, args.height, qp)
            hm_r["bits"].append(b); hm_r["psnr"].append(p)
            hm_r["time"].append(t)
    res = {"qps": list(args.qps), "ours": ours}
    if not args.no_hm:
        import numpy as np
        res["hm"] = hm_r
        try:
            res["bd_rate_vs_hm"] = bdrate.bd_rate(
                hm_r["bits"], hm_r["psnr"], ours["bits"], ours["psnr"])
        except Exception as e:          # single-QP runs: curves can't overlap
            res["bd_rate_error"] = str(e)
        res["speedup_vs_hm"] = float(np.sum(hm_r["time"])
                                     / np.sum(ours["time"]))
    for i, qp in enumerate(res["qps"]):
        line = (f"QP {qp}: ours {res['ours']['bits'][i]/1000:.1f} kb "
                f"{res['ours']['psnr'][i]:.2f} dB "
                f"{res['ours']['time'][i]:.2f}s")
        if "hm" in res:
            line += (f" | HM {res['hm']['bits'][i]/1000:.1f} kb "
                     f"{res['hm']['psnr'][i]:.2f} dB "
                     f"{res['hm']['time'][i]:.2f}s")
        print(line)
    if "bd_rate_vs_hm" in res:
        print(f"BD-rate vs HM: {res['bd_rate_vs_hm']:+.2f}% "
              f"(negative = we are better)")
        print(f"speedup vs HM: {res['speedup_vs_hm']:.2f}x")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
