"""Benchmark entry points used by bench.py.

Headline: All-Intra 1080p encode frames/s/chip for the full pipeline
(ETH-CNN HCPM predict + TPU search + TPU wavefront reconstruction + host
CABAC). vs_baseline compares against the HM-16.5 reference encoder
(Extract_Data build ~= vanilla full-RDO) measured once on this host and
cached in tools/hm_baseline.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import time

import numpy as np

HM_BASELINE_CACHE = os.path.join(os.path.dirname(__file__), "..", "..",
                                 "tools", "hm_baseline.json")


def synth_1080p(n_frames=2, seed=0):
    from ..core.yuv import Frame
    rng = np.random.RandomState(seed)
    frames = []
    base_y = rng.randint(0, 256, (1080, 1920)).astype(np.float32)
    yy, xx = np.mgrid[0:1080, 0:1920].astype(np.float32)
    for i in range(n_frames):
        y = np.clip(0.5 * base_y + 80 + 50 * np.sin((xx + 13 * i) / 37.0)
                    * np.cos(yy / 29.0), 0, 255).astype(np.uint8)
        cb = np.full((540, 960), 120, np.uint8)
        cr = np.full((540, 960), 130, np.uint8)
        frames.append(Frame(y, cb, cr))
    return frames


def synth_1080p_structured(n_frames=2, seed=7):
    """Natural-ish 1080p: smooth gradients + textured regions + moving
    high-contrast blocks (the eval_gated.synth_clip recipe) — the
    honest bench content: the CU tree is non-trivial and compressible,
    unlike uniform noise."""
    from ..core.yuv import Frame
    rng = np.random.RandomState(seed)
    h, w = 1080, 1920
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    tex = rng.randint(-24, 25, (h, w)).astype(np.float32)
    tex_mask = ((xx // 64 + yy // 64) % 2).astype(np.float32)
    frames = []
    for t in range(n_frames):
        y = (90 + 60 * np.sin((xx - 2 * t) / 53.0) * np.cos(yy / 37.0)
             + tex * tex_mask)
        x0 = (30 + 3 * t) % (w - 40)
        y = y.copy()
        y[40:72, x0:x0 + 32] = 210
        y = np.clip(y, 0, 255).astype(np.uint8)
        cb = np.full((h // 2, w // 2), 118, np.uint8)
        cr = np.clip(128 + tex[::2, ::2] / 4, 0, 255).astype(np.uint8)
        frames.append(Frame(y, cb, cr))
    return frames


def load_trained_cnn(qp=32):
    """Shipped ETH-CNN checkpoint for the bench QP band (None if the
    models/ directory is absent)."""
    from ..train.train_cnn import band_for_qp, load_params
    path = os.path.join(os.path.dirname(__file__), "..", "..", "models",
                        f"eth_cnn_{band_for_qp(qp)}.npz")
    if not os.path.exists(path):
        return None
    return load_params(path)


def read_hm_baseline():
    """Read the committed HM baseline cache. Never encodes — the bench
    path must not spend its budget on an HM run (round-1 rc=124 lesson);
    use measure_hm_baseline(force=True) offline to refresh the cache."""
    path = os.path.abspath(HM_BASELINE_CACHE)
    with open(path) as f:
        return json.load(f)


def measure_hm_baseline(n_frames=2, force=False, timeout=3600):
    """Encode the same synthetic clip with the HM reference encoder once;
    cache seconds/frame."""
    path = os.path.abspath(HM_BASELINE_CACHE)
    if os.path.exists(path) and not force:
        with open(path) as f:
            return json.load(f)
    from ..evaltools.hm import ENCODER
    from ..core.yuv import write_yuv420
    from ..train.labels import hm_intra_cfg
    import tempfile
    frames = synth_1080p_structured(n_frames)
    with tempfile.TemporaryDirectory() as td:
        write_yuv420(os.path.join(td, "in.yuv"), frames)
        with open(os.path.join(td, "enc.cfg"), "w") as f:
            f.write(hm_intra_cfg(1920, 1080, 32, n_frames))
        t0 = time.perf_counter()
        proc = subprocess.run(
            [ENCODER, "-c", "enc.cfg", "-i", "in.yuv", "-b", "str.bin"],
            cwd=td, capture_output=True, text=True, timeout=timeout)
        dt = time.perf_counter() - t0
        assert proc.returncode == 0, proc.stderr
    result = {"hm_seconds_per_frame_1080p_ai_qp32": dt / n_frames,
              "n_frames": n_frames}
    with open(path, "w") as f:
        json.dump(result, f)
    return result


def load_trained_lstm(qp=32):
    from ..train.train_cnn import band_for_qp, load_params
    path = os.path.join(os.path.dirname(__file__), "..", "..", "models",
                        f"eth_lstm_{band_for_qp(qp)}.npz")
    if not os.path.exists(path):
        return None
    return load_params(path)


def measure_hm_ldp_baseline(n_frames=4, force=False, timeout=7200):
    """HM low-delay-P seconds/frame at 1080p QP32 on this host (cached;
    offline only — bench.py never runs HM)."""
    path = os.path.abspath(HM_BASELINE_CACHE)
    base = {}
    if os.path.exists(path):
        with open(path) as f:
            base = json.load(f)
    if "hm_seconds_per_frame_1080p_ldp_qp32" in base and not force:
        return base
    from ..evaltools.hm import ENCODER
    from ..core.yuv import write_yuv420
    from ..train.labels import hm_ldp_cfg
    import tempfile
    frames = synth_1080p_structured(n_frames)
    with tempfile.TemporaryDirectory() as td:
        write_yuv420(os.path.join(td, "in.yuv"), frames)
        with open(os.path.join(td, "enc.cfg"), "w") as f:
            f.write(hm_ldp_cfg(1920, 1080, 32, n_frames))
        t0 = time.perf_counter()
        proc = subprocess.run(
            [ENCODER, "-c", "enc.cfg", "-i", "in.yuv", "-b", "str.bin"],
            cwd=td, capture_output=True, text=True, timeout=timeout)
        dt = time.perf_counter() - t0
        assert proc.returncode == 0, proc.stderr
    base["hm_seconds_per_frame_1080p_ldp_qp32"] = dt / n_frames
    base["ldp_n_frames"] = n_frames
    with open(path, "w") as f:
        json.dump(base, f)
    return base


def bench_encode_ldp_1080p(n_frames=16, warm=3):
    """Low-Delay-P 1080p TPU throughput: the full gated chain
    (pre-encode vs prev recon -> ETH-CNN+LSTM HCPM -> HCPM-gated
    quadtree psearch+coding -> host CABAC), sequential per frame as the
    inter dependency demands. Returns a bench sub-dict."""
    from ..entropy import headers
    from ..pipeline.pframe import LDPEncoder

    cfg = headers.EncoderConfig(width=1920, height=1080, qp=32,
                                num_refs=4)
    lstm = load_trained_lstm(cfg.qp)
    enc = LDPEncoder(cfg, lstm_params=lstm)
    frames = synth_1080p_structured(n_frames)
    enc.encode(frames[:warm], with_hash_sei=False)   # compile
    t0 = time.perf_counter()
    stream, _ = enc.encode(frames, with_hash_sei=False)[:2]
    dt = time.perf_counter() - t0
    fps = n_frames / dt
    try:
        hm_spf = read_hm_baseline()[
            "hm_seconds_per_frame_1080p_ldp_qp32"]
        vs = fps * hm_spf
    except Exception:
        vs = -1.0
    return {
        "metric": "ldp_encode_1080p",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(vs, 2),
        "gated": lstm is not None,
        "stream_bytes": len(stream),
    }


def bench_encode_1080p(n_frames=48, chunk=24, decide_chunk=4):
    """Full-pipeline AI 1080p benchmark; returns the bench.py JSON dict.

    Uses the frame-batched (vmapped) pipeline: AI frames are independent,
    so batching them over the wavefront scan multiplies lane utilization
    (the same program shards frames over multi-chip meshes). The recon
    wavefront carries a large fixed sequential-dispatch cost per launch,
    so it runs at big frame batches (chunk), while the decide stage
    (whose 35-mode intermediates scale with F) is sub-batched at
    decide_chunk inside each chunk. Warmup encodes ONE chunk at the same
    batch shape as the measured run; vs_baseline reads the committed HM
    measurement only (tools/hm_baseline.json) and never encodes HM."""
    import jax
    from ..entropy import headers
    from ..models import eth_cnn
    from ..parallel import frames as pframes
    from ..parallel.mesh import make_mesh

    cfg = headers.EncoderConfig(width=1920, height=1080, qp=32)
    # the SHIPPED predictor at its operating point (falls back to random
    # init only when models/ is missing), on structured content — the
    # bench measures the real gated encoder, not worst-case noise
    params = load_trained_cnn(cfg.qp)
    trained = params is not None
    if params is None:
        params = eth_cnn.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(1, model_axis=1)
    enc = pframes.FrameParallelAI(cfg, mesh, cnn_params=params,
                                  decide_chunk=decide_chunk)

    frames = synth_1080p_structured(n_frames)
    enc.encode(frames[:chunk], with_hash_sei=False)  # compile (1 chunk)

    t0 = time.perf_counter()
    stream, stats = enc.encode(frames, with_hash_sei=False, chunk=chunk)
    dt = time.perf_counter() - t0
    fps = n_frames / dt

    try:
        base = read_hm_baseline()
        hm_spf = base["hm_seconds_per_frame_1080p_ai_qp32"]
        vs = fps * hm_spf
    except Exception:
        vs = -1.0

    from ..ops import intra_mm
    return {
        "metric": "ai_encode_1080p",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(vs, 2),
        "detail": {**{k: round(v, 3) for k, v in stats.items()},
                   "satd_kernel": intra_mm.LAST_SATD_PATH,
                   "weights": "trained" if trained else "random-init",
                   "content": "structured"},
        "stream_bytes": len(stream),
    }
