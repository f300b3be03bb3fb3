"""Frame-parallel AI encoding over a device mesh.

AI frames are independent (SURVEY.md 2.4/7.3: DP over frames/GOPs is the
natural axis), so the whole decide+reconstruct pipeline vmaps over a frame
batch and shards it across the mesh's 'data' axis: each chip runs the
search + wavefront reconstruction for its frames; XLA inserts no
collectives on the hot path (pure data parallelism over ICI-free work),
only the host gather of coefficients for entropy packing.

Usage:
    mesh = make_mesh(...)
    penc = FrameParallelAI(cfg, mesh, cnn_params=...)
    stream, stats = penc.encode(frames)
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.yuv import pad_frame
from ..entropy import headers
from ..models import eth_cnn, hcpm
from ..pipeline import golden, recon, search


class FrameParallelAI:
    def __init__(self, cfg: headers.EncoderConfig, mesh,
                 cnn_params=None,
                 thresholds: Optional[hcpm.Thresholds] = None,
                 recon_backend: str = "auto",
                 decide_chunk: int = 0,
                 bucket_max_depth: bool = True):
        """decide_chunk > 0 splits the decide stage (CNN + mode/partition
        search) into sub-batches of that many frames while the recon
        wavefront still runs over the full frame batch: decide is
        compute/HBM-bound (the 35-mode SATD intermediates scale with F),
        recon is dominated by a fixed sequential-dispatch cost (~4.3 s
        per launch measured at 1080p) that only amortizes with large F —
        so the two stages want different batch sizes."""
        self.cfg = cfg
        self.mesh = mesh
        self.cnn_params = cnn_params
        if recon_backend == "auto":
            # the Pallas mega-kernel needs real Mosaic (hardware); the
            # XLA wavefront is the portable path. RDOQ "trellis" is not
            # implemented in the kernel -> stay on XLA then.
            from ..ops import rdoq as _rdoq
            from ..pipeline import recon_pallas as _rp
            # effective default device, not default_backend(): a TPU
            # plugin can register while the session computes on a
            # pinned CPU backend (test conftest)
            on_tpu = not _rp._use_interpret()
            recon_backend = ("pallas" if on_tpu
                             and _rdoq.RDOQ_MODEL == "lite" else "ctu")
        self.recon_backend = recon_backend
        self.decide_chunk = decide_chunk
        self.bucket_max_depth = bucket_max_depth
        self.thr = thresholds or hcpm.DEFAULT_AI
        self._origins = jnp.asarray(
            search.ctu_grid(cfg.pad_width, cfg.pad_height))
        self._sharding = NamedSharding(mesh, P("data"))
        self._replicated = NamedSharding(mesh, P())

        # NOTE: the CTU origins must stay a CONSTANT in the jaxpr
        # (closure capture): routing them through lax.map/scan makes
        # every reference-sample gather a traced-index gather, which
        # lowers catastrophically on TPU (measured 10.5 s for an
        # 8-frame decide vs ~2 ms with constant origins). Peak memory
        # is bounded instead by mode-grouping inside the search
        # (search._best_mode_per_node), so whole-frame vmapped decides
        # fit HBM at large frame batches.
        def decide_one(y, cb, cr, probs):
            res = search.search_frame(
                y, self._origins, pad_w=cfg.pad_width,
                pad_h=cfg.pad_height, n_ctu_x=cfg.ctus_x, qp=cfg.qp,
                hcpm_probs=probs, thr_up=self.thr.up,
                thr_down=self.thr.down, cb_plane=cb, cr_plane=cr,
                nxn=cfg.nxn)
            return res.depth8, res.modes8, res.modes4, res.nxn8

        def recon_one(y, cb, cr, d8, m4, nxn):
            return recon.encode_frame_planes(
                y, cb, cr, d8, m4, nxn, qp=cfg.qp, pad_w=cfg.pad_width,
                pad_h=cfg.pad_height, rdoq=cfg.rdoq)

        def decide_stage(ys, cbs, crs, params):
            # [F, H, W] batched over frames -> frame-level decision maps
            if params is not None:
                F = ys.shape[0]
                H64, W64 = cfg.ctus_y * 64, cfg.ctus_x * 64
                ypad = jnp.pad(ys, ((0, 0), (0, H64 - ys.shape[1]),
                                    (0, W64 - ys.shape[2])))
                ctus = ypad.reshape(F, cfg.ctus_y, 64, cfg.ctus_x, 64)
                ctus = ctus.transpose(0, 1, 3, 2, 4).reshape(-1, 64, 64)
                qp = jnp.full((ctus.shape[0],), float(cfg.qp))
                probs = eth_cnn.apply(params, ctus, qp,
                                      thr_l1=self.thr.l1_lower,
                                      thr_l2=self.thr.l2_lower)
                probs = probs.reshape(F, -1, 21)
            else:
                probs = None

            def assemble(t, u):
                F = ys.shape[0]
                nx, ny = cfg.ctus_x, cfg.ctus_y
                a = t.reshape(F, ny, nx, u, u).transpose(0, 1, 3, 2, 4)
                a = a.reshape(F, ny * u, nx * u)
                return a[:, :cfg.pad_height * u // 64,
                         :cfg.pad_width * u // 64]

            if probs is not None:
                d8s, m8s, m4s, nxns = jax.vmap(decide_one)(ys, cbs, crs,
                                                           probs)
            else:
                d8s, m8s, m4s, nxns = jax.vmap(
                    lambda y, cb, cr: decide_one(y, cb, cr, None))(
                    ys, cbs, crs)

            return (assemble(d8s, 8), assemble(m8s, 8),
                    assemble(m4s, 16), assemble(nxns, 8))

        def recon_stage(ys, cbs, crs, d, m4, nxn):
            if self.recon_backend == "pallas":
                from ..pipeline import recon_pallas
                return recon_pallas.encode_frame_planes_pallas(
                    ys, cbs, crs, d, m4, nxn, qp=cfg.qp,
                    pad_w=cfg.pad_width, pad_h=cfg.pad_height,
                    rdoq=cfg.rdoq, interpret=False)
            return jax.vmap(recon_one)(ys, cbs, crs, d, m4, nxn)

        def full(ys, cbs, crs, params):
            d, m, m4, nxn = decide_stage(ys, cbs, crs, params)
            planes = recon_stage(ys, cbs, crs, d, m4, nxn)
            return d, m, m4, nxn, planes

        def decide_only(ys, cbs, crs, params):
            # tu-backend decide: NxN forced off (recon_tu codes TU == CU)
            if params is not None:
                F = ys.shape[0]
                H64, W64 = cfg.ctus_y * 64, cfg.ctus_x * 64
                ypad = jnp.pad(ys, ((0, 0), (0, H64 - ys.shape[1]),
                                    (0, W64 - ys.shape[2])))
                ctus = ypad.reshape(F, cfg.ctus_y, 64, cfg.ctus_x, 64)
                ctus = ctus.transpose(0, 1, 3, 2, 4).reshape(-1, 64, 64)
                qp = jnp.full((ctus.shape[0],), float(cfg.qp))
                probs = eth_cnn.apply(params, ctus, qp,
                                      thr_l1=self.thr.l1_lower,
                                      thr_l2=self.thr.l2_lower)
                probs = probs.reshape(F, -1, 21)
            else:
                probs = None

            def one(y, cb, cr, pr):
                res = search.search_frame(
                    y, self._origins, pad_w=cfg.pad_width,
                    pad_h=cfg.pad_height, n_ctu_x=cfg.ctus_x, qp=cfg.qp,
                    hcpm_probs=pr, thr_up=self.thr.up,
                    thr_down=self.thr.down, cb_plane=cb, cr_plane=cr,
                    nxn=False)
                return res.depth8, res.modes8

            if probs is not None:
                d8s, m8s = jax.vmap(one)(ys, cbs, crs, probs)
            else:
                d8s, m8s = jax.vmap(
                    lambda y, cb, cr: one(y, cb, cr, None))(ys, cbs, crs)
            nx, ny = cfg.ctus_x, cfg.ctus_y
            F = ys.shape[0]
            d = d8s.reshape(F, ny, nx, 8, 8).transpose(0, 1, 3, 2, 4)
            d = d.reshape(F, ny * 8, nx * 8)[:, :cfg.pad_height // 8,
                                             :cfg.pad_width // 8]
            m = m8s.reshape(F, ny, nx, 8, 8).transpose(0, 1, 3, 2, 4)
            m = m.reshape(F, ny * 8, nx * 8)[:, :cfg.pad_height // 8,
                                             :cfg.pad_width // 8]
            return d, m

        self._full = jax.jit(full)
        self._decide_stage = jax.jit(decide_stage)
        self._recon_stage = jax.jit(recon_stage)
        self._decide = jax.jit(decide_only)
        self._recon_tu_cache = {}

        # --- frame-bucketed max-depth narrowing (gated only) ----------
        # The TPU-native counterpart of the reference's RD-check
        # skipping (TEncCu.cpp:862-873): frames whose HCPM gates rule
        # out the deep CU levels dispatch to a SHALLOWER compiled
        # decide program (no depth-3 / NxN work at all), grouped so
        # each program runs at a fixed sub-batch shape. Stream-
        # identical to the full program (tests/test_max_depth.py
        # narrowing equivalence + test_frame_parallel bucketing test).
        def cnn_probs(ys, params):
            F = ys.shape[0]
            H64, W64 = cfg.ctus_y * 64, cfg.ctus_x * 64
            ypad = jnp.pad(ys, ((0, 0), (0, H64 - ys.shape[1]),
                                (0, W64 - ys.shape[2])))
            ctus = ypad.reshape(F, cfg.ctus_y, 64, cfg.ctus_x, 64)
            ctus = ctus.transpose(0, 1, 3, 2, 4).reshape(-1, 64, 64)
            qp = jnp.full((ctus.shape[0],), float(cfg.qp))
            p = eth_cnn.apply(params, ctus, qp,
                              thr_l1=self.thr.l1_lower,
                              thr_l2=self.thr.l2_lower)
            return p.reshape(F, -1, 21)

        self._cnn = jax.jit(cnn_probs)
        self._decide_md_cache = {}

        def make_decide_md(md):
            def decide_md(ys, cbs, crs, probs):
                def one(y, cb, cr, pr):
                    res = search.search_frame(
                        y, self._origins, pad_w=cfg.pad_width,
                        pad_h=cfg.pad_height, n_ctu_x=cfg.ctus_x,
                        qp=cfg.qp, hcpm_probs=pr, thr_up=self.thr.up,
                        thr_down=self.thr.down, cb_plane=cb,
                        cr_plane=cr, nxn=cfg.nxn, max_depth=md)
                    return (res.depth8, res.modes8, res.modes4,
                            res.nxn8)

                d8s, m8s, m4s, nxns = jax.vmap(one)(ys, cbs, crs, probs)
                return (assemble(d8s, 8), assemble(m8s, 8),
                        assemble(m4s, 16), assemble(nxns, 8))

            def assemble(t, u):
                F = t.shape[0]
                nx, ny = cfg.ctus_x, cfg.ctus_y
                a = t.reshape(F, ny, nx, u, u).transpose(0, 1, 3, 2, 4)
                a = a.reshape(F, ny * u, nx * u)
                return a[:, :cfg.pad_height * u // 64,
                         :cfg.pad_width * u // 64]

            return jax.jit(decide_md)

        self._make_decide_md = make_decide_md

    def _decide_md(self, md: int):
        if md not in self._decide_md_cache:
            self._decide_md_cache[md] = self._make_decide_md(md)
        return self._decide_md_cache[md]

    def _frame_max_depths(self, probs_h):
        """Per-frame deepest gated CU level (host; [F, B, 21] probs)."""
        from ..models import hcpm as hcpm_lib
        from ..pipeline import search as search_lib
        F, B, _ = probs_h.shape
        cs = np.asarray(hcpm_lib.split_gates(
            jnp.asarray(probs_h.reshape(F * B, 21)), self.thr)[1])
        cs = cs.reshape(F, B, 21)
        floor = search_lib.forced_depth_floor(self.cfg.pad_width,
                                              self.cfg.pad_height)
        out = []
        for f in range(F):
            if cs[f, :, 5:21].any():
                md = 3
            elif cs[f, :, 1:5].any():
                md = 2
            elif cs[f, :, 0].any():
                md = 1
            else:
                md = 0
            out.append(max(md, floor))
        return out

    def _decide_bucketed(self, ys, cbs, crs, params):
        """CNN once, then per-max-depth decide programs over frame
        buckets (fixed decide_chunk sub-batch shapes; ragged buckets
        pad by repeating their last frame)."""
        F = ys.shape[0]
        probs = self._cnn(ys, params)
        md_f = self._frame_max_depths(np.asarray(probs))
        dc = self.decide_chunk if self.decide_chunk > 0 else F
        outs = [None] * F
        for md in sorted(set(md_f)):
            idx = [i for i in range(F) if md_f[i] == md]
            fn = self._decide_md(md)
            for i0 in range(0, len(idx), dc):
                grp = idx[i0:i0 + dc]
                sel = grp + [grp[-1]] * (dc - len(grp))
                sel_a = np.asarray(sel)
                o = fn(ys[sel_a], cbs[sel_a], crs[sel_a], probs[sel_a])
                for k, i in enumerate(grp):
                    outs[i] = tuple(x[k] for x in o)
        d, m, m4, nxn = (jnp.stack([o[k] for o in outs])
                         for k in range(4))
        return d, m, m4, nxn

    def _run_full(self, ys, cbs, crs, params):
        """Full pipeline with optionally sub-batched decide (see
        __init__.decide_chunk)."""
        if params is not None and self.bucket_max_depth:
            d, m, m4, nxn = self._decide_bucketed(ys, cbs, crs, params)
            planes = self._recon_stage(ys, cbs, crs, d, m4, nxn)
            return d, m, m4, nxn, planes
        dc = self.decide_chunk
        F = ys.shape[0]
        if dc <= 0 or F <= dc:
            return self._full(ys, cbs, crs, params)
        # A ragged tail (F % dc != 0) pads its sub-batch up to dc by
        # repeating the last frame so the decide stage keeps one compiled
        # shape; the padded frames' decisions are dropped below.
        outs = []
        for i in range(0, F, dc):
            n = min(dc, F - i)
            sl = slice(i, i + n)
            yb, cbb, crb = ys[sl], cbs[sl], crs[sl]
            if n < dc:
                def pad(a):
                    reps = [1] * a.ndim
                    reps[0] = dc - n
                    return jnp.concatenate([a, jnp.tile(a[-1:], reps)])
                yb, cbb, crb = pad(yb), pad(cbb), pad(crb)
            o = self._decide_stage(yb, cbb, crb, params)
            outs.append(tuple(x[:n] for x in o) if n < dc else o)
        d, m, m4, nxn = (jnp.concatenate([o[k] for o in outs])
                         for k in range(4))
        planes = self._recon_stage(ys, cbs, crs, d, m4, nxn)
        return d, m, m4, nxn, planes

    def encode_batch(self, frames, need_recon=True):
        """Encode a batch of frames (ideally a multiple of the data-axis
        size). Returns (chunks, recons, decide+recon seconds).

        need_recon=False skips the reconstruction-plane D2H transfer
        (recons come back as None): the wavefront still computes recon on
        device (it IS the carry), but the host only needs it for the
        picture-hash SEI, and over the tunneled TPU link the transfer is
        ~3 MB/frame at ~25 MB/s — pure waste when no hash is requested."""
        cfg = self.cfg
        pfs = [pad_frame(f, cfg.pad_width, cfg.pad_height) for f in frames]
        # uint8 upload (4x smaller than int32); device code casts locally
        ys = jax.device_put(
            np.stack([p.y for p in pfs]), self._sharding)
        cbs = jax.device_put(
            np.stack([p.cb for p in pfs]), self._sharding)
        crs = jax.device_put(
            np.stack([p.cr for p in pfs]), self._sharding)
        params = self.cnn_params
        if params is not None:
            params = jax.device_put(params, self._replicated)

        t0 = time.perf_counter()
        if self.recon_backend == "tu":
            d, m, m4, nxn, planes = self._run_tu(ys, cbs, crs, params)
        else:
            d, m, m4, nxn, planes = self._run_full(ys, cbs, crs, params)
        jax.block_until_ready(planes)
        t1 = time.perf_counter()

        chunks = []
        recons = []
        from ..core.yuv import Frame
        d = np.asarray(d)
        m = np.asarray(m)
        m4 = np.asarray(m4)
        nxn = np.asarray(nxn)
        coef_y = np.asarray(planes.coef_y)
        coef_cb = np.asarray(planes.coef_cb)
        coef_cr = np.asarray(planes.coef_cr)
        if need_recon:
            rec_y = np.asarray(planes.recon_y)
            rec_cb = np.asarray(planes.recon_cb)
            rec_cr = np.asarray(planes.recon_cr)
        t2 = time.perf_counter()
        for i in range(len(frames)):
            decisions = dict(depth8=d[i], modes8=m[i], modes4=m4[i],
                             nxn8=nxn[i], coef_y=coef_y[i],
                             coef_cb=coef_cb[i], coef_cr=coef_cr[i])
            chunks.append(self._entropy(decisions))
            recons.append(Frame(rec_y[i], rec_cb[i], rec_cr[i])
                          if need_recon else None)
        t3 = time.perf_counter()
        self.last_stats = {"device_s": t1 - t0, "transfer_s": t2 - t1,
                           "entropy_s": t3 - t2}
        return chunks, recons, t1 - t0

    def _run_tu(self, ys, cbs, crs, params):
        """Decide (device) -> per-frame TU schedules (host) -> vmapped
        TU-wavefront reconstruction (device)."""
        from ..pipeline import recon_tu
        cfg = self.cfg
        d, m = self._decide(ys, cbs, crs, params)
        d_host = np.asarray(d)
        scheds = [recon_tu.build_schedule(d_host[i])[0]
                  for i in range(d_host.shape[0])]
        # pad all frames' schedules to common shapes
        stacked = {}
        for s8 in (1, 2, 4):
            n_steps = max(sc[s8][0].shape[0] for sc in scheds)
            cap = max(sc[s8][0].shape[1] for sc in scheds)
            idx = np.zeros((len(scheds), n_steps, cap, 2), np.int32)
            act = np.zeros((len(scheds), n_steps, cap), bool)
            for i, sc in enumerate(scheds):
                si, sa = sc[s8]
                idx[i, :si.shape[0], :si.shape[1]] = si
                act[i, :sa.shape[0], :sa.shape[1]] = sa
            stacked[s8] = (idx, act)
        key = tuple(stacked[s][0].shape for s in (1, 2, 4))
        if key not in self._recon_tu_cache:
            import functools
            self._recon_tu_cache[key] = jax.jit(jax.vmap(functools.partial(
                recon_tu.encode_frame_planes_tu_inner, qp=cfg.qp,
                pad_w=cfg.pad_width, pad_h=cfg.pad_height)))
        fn = self._recon_tu_cache[key]
        planes = fn(ys, cbs, crs, m,
                    jnp.asarray(stacked[1][0]), jnp.asarray(stacked[1][1]),
                    jnp.asarray(stacked[2][0]), jnp.asarray(stacked[2][1]),
                    jnp.asarray(stacked[4][0]), jnp.asarray(stacked[4][1]))
        m4 = jnp.repeat(jnp.repeat(m, 2, 1), 2, 2)
        nxn = jnp.zeros(d.shape, bool)
        return d, m, m4, nxn, planes

    def _entropy(self, decisions) -> bytes:
        from ..pipeline.ai import entropy_encode_slice
        return entropy_encode_slice(self.cfg, decisions)

    def encode(self, frames, with_hash_sei: bool = True,
               chunk: int = 0):
        """chunk > 0 pipelines the encode: the device computes chunk N+1
        while the host drains chunk N (D2H transfer + CABAC packing on a
        worker thread). JAX dispatch is async, so launching the next
        chunk before touching the previous chunk's arrays overlaps
        device and host work with no extra machinery."""
        cfg = self.cfg
        out = [headers.write_vps(cfg), headers.write_sps(cfg),
               headers.write_pps(cfg)]
        if chunk <= 0 or chunk >= len(frames):
            chunks, recons, device_s = self.encode_batch(
                frames, need_recon=with_hash_sei)
            stats = dict(self.last_stats)
        else:
            import collections
            import concurrent.futures as cf
            groups = [frames[i:i + chunk]
                      for i in range(0, len(frames), chunk)]
            chunks, recons = [], []
            stats = {"device_s": 0.0, "transfer_s": 0.0, "entropy_s": 0.0}
            # Launch at most 2 groups ahead of the drain so live device
            # buffers stay bounded regardless of sequence length, while
            # keeping device compute overlapped with host CABAC.
            with cf.ThreadPoolExecutor(max_workers=2) as pool:
                pending = collections.deque()  # (future, group) in order
                gi = 0
                while gi < len(groups) or pending:
                    while gi < len(groups) and len(pending) < 2:
                        g = groups[gi]
                        launched = self._launch(g)
                        pending.append(pool.submit(self._drain, launched,
                                                   len(g), with_hash_sei))
                        gi += 1
                    ch, rc, st = pending.popleft().result()
                    chunks.extend(ch)
                    recons.extend(rc)
                    for k in stats:
                        stats[k] += st[k]
            self.last_stats = stats
        for ch, rec in zip(chunks, recons):
            out.append(ch)
            if with_hash_sei:
                tid, hs = golden.pic_hashes(rec, cfg.hash_type)
                out.append(headers.write_hash_sei(*hs, hash_type=tid))
        return b"".join(out), dict(stats)

    def _launch(self, frames):
        """Dispatch the device program for a frame group (async)."""
        cfg = self.cfg
        pfs = [pad_frame(f, cfg.pad_width, cfg.pad_height) for f in frames]
        ys = jax.device_put(np.stack([p.y for p in pfs]), self._sharding)
        cbs = jax.device_put(np.stack([p.cb for p in pfs]), self._sharding)
        crs = jax.device_put(np.stack([p.cr for p in pfs]), self._sharding)
        params = self.cnn_params
        if params is not None:
            params = jax.device_put(params, self._replicated)
        t0 = time.perf_counter()
        if self.recon_backend == "tu":
            out = self._run_tu(ys, cbs, crs, params)
        else:
            out = self._run_full(ys, cbs, crs, params)
        return out + (t0,)

    def _drain(self, launched, n_frames, need_recon=True):
        """Transfer one group's results and pack its slices (host)."""
        from ..core.yuv import Frame
        d, m, m4, nxn, planes, t0 = launched
        jax.block_until_ready(planes)
        t1 = time.perf_counter()
        d = np.asarray(d)
        m = np.asarray(m)
        m4 = np.asarray(m4)
        nxn = np.asarray(nxn)
        coef_y = np.asarray(planes.coef_y)
        coef_cb = np.asarray(planes.coef_cb)
        coef_cr = np.asarray(planes.coef_cr)
        if need_recon:
            rec_y = np.asarray(planes.recon_y)
            rec_cb = np.asarray(planes.recon_cb)
            rec_cr = np.asarray(planes.recon_cr)
        t2 = time.perf_counter()
        chunks, recons = [], []
        for i in range(n_frames):
            decisions = dict(depth8=d[i], modes8=m[i], modes4=m4[i],
                             nxn8=nxn[i], coef_y=coef_y[i],
                             coef_cb=coef_cb[i], coef_cr=coef_cr[i])
            chunks.append(self._entropy(decisions))
            recons.append(Frame(rec_y[i], rec_cb[i], rec_cr[i])
                          if need_recon else None)
        t3 = time.perf_counter()
        return chunks, recons, {"device_s": t1 - t0,
                                "transfer_s": t2 - t1,
                                "entropy_s": t3 - t2}


class ChainParallelLDP:
    """GOP-chain pipeline parallelism for Low-Delay-P (SURVEY.md 7.3).

    With a periodic IDR every `intra_period` frames the sequence splits
    into independent prediction chains. Chains ride the mesh 'data'
    axis: ONE vmapped program per lockstep position encodes frame i of
    every chain (pre-encode, ETH-LSTM HCPM with the resident state
    sharded chain-major, HCPM-gated quadtree psearch), frames stay
    sequential inside a chain (the inter reconstruction dependency),
    and per-chain entropy/loop-filter host work drains in chain order.
    The output stream is the byte-exact concatenation of the per-chain
    LDPEncoder streams (tests/test_frame_parallel.py).

    The reference encodes strictly sequentially (single-threaded HM,
    SURVEY.md 2.4); this is the TPU-native scale-out of its LDP
    operating point: throughput scales with chains/devices at equal
    output bytes.
    """

    def __init__(self, cfg: headers.EncoderConfig, mesh,
                 cnn_params=None, lstm_params=None, thresholds=None,
                 rect_pu: bool = True, use_gop_qp: bool = True):
        import dataclasses
        from ..pipeline.pframe import LDPEncoder

        if cfg.pad_width % 64 or cfg.pad_height % 64:
            cfg = dataclasses.replace(cfg, pad_align=64)
        self.cfg = cfg
        self.mesh = mesh
        self._sharding = NamedSharding(mesh, P("data"))
        self._replicated = NamedSharding(mesh, P())
        # one LDPEncoder supplies the per-frame host logic (frame QP
        # schedule, slice NALs, intra head path) so the lockstep
        # encoder cannot drift from the sequential semantics
        self._enc = LDPEncoder(cfg, cnn_params=cnn_params,
                               lstm_params=lstm_params,
                               thresholds=thresholds, rect_pu=rect_pu,
                               use_gop_qp=use_gop_qp)
        self.lstm_params = lstm_params
        self._head = None
        if not (cfg.deblock or cfg.sao) and cnn_params is None:
            # batched multi-device intra heads (byte-identical to the
            # AIEncoder path); loop-filtered/gated cfgs take the
            # sequential head path below
            self._head = FrameParallelAI(cfg, mesh)
        self._psearch_jit = {}

    # -- device programs --------------------------------------------------

    def _search_chains(self, gated: bool):
        """Jitted chain-vmapped psearch (frame QP traced, shared)."""
        import functools
        from ..pipeline import psearch as psearch_mod
        key = gated
        if key not in self._psearch_jit:
            cfg = self.cfg
            kw = dict(pad_w=cfg.pad_width, pad_h=cfg.pad_height,
                      use_rdoq=cfg.rdoq, rect_pu=self._enc.rect_pu,
                      qp_set=self._enc._qp_set())
            if gated:
                thr = self._enc.predictor.thr
                kw.update(thr_up=thr.up, thr_down=thr.down)
            fn = functools.partial(psearch_mod.p_search_frame, **kw)
            in_hcpm = 0 if gated else None
            self._psearch_jit[key] = jax.jit(jax.vmap(
                lambda cy, cb, cr, ry, rcb, rcr, org, qp, hc, na: fn(
                    cy, cb, cr, ry, rcb, rcr, org, qp=qp,
                    hcpm_probs=hc, n_active_refs=na),
                in_axes=(0, 0, 0, 0, 0, 0, None, None, in_hcpm, None)))
        return self._psearch_jit[key]

    # -- encode -----------------------------------------------------------

    def encode(self, frames, intra_period: int,
               with_hash_sei: bool = False):
        """Returns (stream, per-chain recon lists flattened in display
        order). len(frames) is padded up to a chain multiple by
        repeating the last frame; padded outputs are dropped."""
        import functools
        from ..core.yuv import Frame, crop_frame
        from ..entropy import headers as hdr
        from ..models import eth_lstm
        from ..pipeline import golden, ldp as ldp_mod
        from ..pipeline import search as search_lib

        cfg = self.cfg
        enc = self._enc
        L = intra_period
        F = len(frames)
        C = -(-F // L)
        frames = list(frames) + [frames[-1]] * (C * L - F)
        chains = [frames[c * L:(c + 1) * L] for c in range(C)]
        W, H = cfg.pad_width, cfg.pad_height
        origins = jnp.asarray(search_lib.ctu_grid(W, H))
        B = origins.shape[0]

        # --- chain heads (intra, poc 0 of each chain) --------------------
        head_frames = [ch[0] for ch in chains]
        chain_chunks = [[] for _ in range(C)]
        dpb = []                                  # per chain, newest first
        if self._head is not None:
            hchunks, hrecons, _ = self._head.encode_batch(head_frames)
            for c in range(C):
                chain_chunks[c].append(hchunks[c])
                dpb.append([hrecons[c]])
        else:
            for c in range(C):
                pf = pad_frame(head_frames[c], W, H)
                d8, m8, m4, nxn = enc.intra.decide_frame_full(
                    pf.y, cfg.qp, pf.cb, pf.cr)
                decisions, rec = enc.intra.reconstruct(
                    pf, d8, m8, cfg.qp, modes4=m4, nxn8=nxn)
                chain_chunks[c].append(
                    enc.intra._entropy_encode(decisions, cfg.qp))
                dpb.append([rec])

        # --- resident LSTM state, sharded chain-major --------------------
        state = None
        if enc.predictor is not None:
            state = jax.device_put(
                np.asarray(eth_lstm.zero_state(C * B)), self._sharding)

        pre_v = jax.jit(jax.vmap(functools.partial(
            ldp_mod.pre_encode, pad_w=W, pad_h=H)))

        # --- lockstep P steps -------------------------------------------
        padded = [[dpb[c][0]] for c in range(C)]   # per-chain, display order
        recons = [[crop_frame(dpb[c][0], cfg.width, cfg.height)]
                  for c in range(C)]
        for i in range(1, L):
            frame_qp = enc._frame_qp(i)
            n_act = min(i, cfg.num_refs)
            pfs = [pad_frame(chains[c][i], W, H) for c in range(C)]
            cur_y = jax.device_put(
                np.stack([p.y for p in pfs]).astype(np.int32),
                self._sharding)
            cur_cb = jax.device_put(
                np.stack([p.cb for p in pfs]).astype(np.int32),
                self._sharding)
            cur_cr = jax.device_put(
                np.stack([p.cr for p in pfs]).astype(np.int32),
                self._sharding)

            def ref_stack(get):
                a = np.stack([
                    np.stack([get(r) for r in
                              (dpb[c] + [dpb[c][-1]] * cfg.num_refs)
                              [:cfg.num_refs]])
                    for c in range(C)]).astype(np.int32)
                return jax.device_put(a, self._sharding)

            ref_y = ref_stack(lambda r: r.y)
            ref_cb = ref_stack(lambda r: r.cb)
            ref_cr = ref_stack(lambda r: r.cr)

            hcpm = None
            if enc.predictor is not None:
                prev_y = jax.device_put(
                    np.stack([np.asarray(dpb[c][0].y) for c in range(C)
                              ]).astype(np.int32), self._sharding)
                prev_cb = jax.device_put(
                    np.stack([np.asarray(dpb[c][0].cb) for c in range(C)
                              ]).astype(np.int32), self._sharding)
                prev_cr = jax.device_put(
                    np.stack([np.asarray(dpb[c][0].cr) for c in range(C)
                              ]).astype(np.int32), self._sharding)
                ry, _, _, _ = pre_v(cur_y, prev_y, cur_cb, prev_cb,
                                    cur_cr, prev_cr)
                resi = ry.reshape(C * B, 64, 64)
                qp_in = jnp.full((C * B,), float(cfg.qp), jnp.float32)
                fig = jnp.full((C * B,), i % eth_lstm.GOP_LENGTH,
                               jnp.int32)
                thr = enc.predictor.thr
                probs, state = eth_lstm.step_jit(
                    enc.predictor.params, resi, qp_in, fig, state,
                    thr.l1_lower, thr.l2_lower)
                hcpm = probs.reshape(C, B, 21)

            res = self._search_chains(hcpm is not None)(
                cur_y, cur_cb, cur_cr, ref_y, ref_cb, ref_cr, origins,
                jnp.int32(frame_qp), hcpm, jnp.int32(n_act))

            # --- per-chain host drain (entropy, loop filters) ------------
            for c in range(C):
                one = type(res)(*[np.asarray(x[c]) for x in res])
                rec, chunk = enc.finish_p_frame(
                    pfs[c], one, i, frame_qp, n_act)
                chain_chunks[c].append(chunk)
                dpb[c].insert(0, rec)
                del dpb[c][max(cfg.num_refs, 1):]
                padded[c].append(rec)
                recons[c].append(crop_frame(rec, cfg.width, cfg.height))

        out = [hdr.write_vps(cfg), hdr.write_sps(cfg), hdr.write_pps(cfg)]
        flat_recons = []
        kept = 0
        for c in range(C):
            for i in range(L):
                if kept >= F:
                    break
                out.append(chain_chunks[c][i])
                if with_hash_sei:
                    tid, hs = golden.pic_hashes(padded[c][i],
                                                cfg.hash_type)
                    out.append(hdr.write_hash_sei(*hs, hash_type=tid))
                flat_recons.append(recons[c][i])
                kept += 1
        return b"".join(out), flat_recons
