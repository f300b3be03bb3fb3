"""TPU wavefront reconstruction (phase B of the AI pipeline).

Computes the normative reconstruction + quantized coefficients for a whole
frame on device. Intra prediction needs reconstructed neighbours, which
serializes CTUs along raster order — the TPU formulation is the WPP-style
wavefront: CTUs on the anti-diagonal d = ctu_x + 2*ctu_y are independent
(left, above and above-right neighbours all lie on earlier diagonals), so
each lax.scan step vmaps the per-CTU coding over one diagonal's lanes.

Inside a CTU, the 85 quadtree nodes (1+4+16+64, DFS pre-order = coding
order) are a lax.scan with a 4-way lax.switch on CU size; each branch
runs predict -> DCT -> quant -> dequant -> IDCT -> recon with static
shapes on an extended local tile (interior + context row/column).

Parity oracle: pipeline/golden.py (sequential NumPy, HM-decoder-verified).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import intra, quant, refs, transforms


class FramePlanes(NamedTuple):
    recon_y: jax.Array
    recon_cb: jax.Array
    recon_cr: jax.Array
    coef_y: jax.Array
    coef_cb: jax.Array
    coef_cr: jax.Array


@functools.lru_cache(maxsize=None)
def node_table():
    """(depth_class, x0, y0) of the 85 quadtree nodes, DFS pre-order."""
    nodes = []

    def rec(d, x, y):
        nodes.append((d, x, y))
        if d < 3:
            h = 64 >> (d + 1)
            for (dx, dy) in ((0, 0), (h, 0), (0, h), (h, h)):
                rec(d + 1, x + dx, y + dy)

    rec(0, 0, 0)
    return np.array(nodes, np.int32)


import os as _os

#: "1" (default): share one compiled body per TB class via inner jit —
#: much cheaper to compile, but each call is an XLA call site whose
#: invocation overhead (~0.3 ms) SERIALIZES along the CTU's 520-call
#: dependency chain inside the wavefront scan (measured: the whole scan
#: drops from ~7 s to sub-ms when the chain is broken). "0" inlines
#: every TB chain so XLA fuses across them — slower compile, fast run.
_INNER_JIT = _os.environ.get("HEVC_TPU_INNER_JIT", "1") == "1"

#: TB sizes <= this are inlined even when _INNER_JIT is on: the 4x4/8x8
#: calls are ~456 of the 520-call chain, so inlining just the small
#: classes removes most of the per-call-site dispatch overhead at a
#: fraction of the full-inline compile cost. Default 0 = classic
#: behavior (everything shares inner-jitted bodies).
_INLINE_MAX_N = int(_os.environ.get("HEVC_TPU_INLINE_MAX_N", "0"))


def _inline_tu(n: int) -> bool:
    return (not _INNER_JIT) or n <= _INLINE_MAX_N


def _tu_core_impl(r, avail, orig, mode, n, component, qp, rdoq, use_dst):
    """Predict -> transform -> quantize -> reconstruct one TB."""
    r = intra.substitute_refs(r[None], avail[None])[0]
    if component == "luma":
        r_use = intra.select_filtered(r, intra.filter_refs(r), mode, n)
    else:
        r_use = r
    pred = intra.predict_one_mode(r_use, mode, n, component=component)
    resi = orig.astype(jnp.int32) - pred
    cf = transforms.forward_transform(resi, use_dst=use_dst)
    if rdoq:
        from ..ops import rdoq as rdoq_lib
        lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
        lvl = rdoq_lib.rd_quantize(cf, qp, lam,
                                   is_luma=component == "luma")
    else:
        lvl = quant.quantize(cf, qp)
    rresi = transforms.inverse_transform(quant.dequantize(lvl, qp),
                                         use_dst=use_dst)
    rec = jnp.clip(pred + rresi, 0, 255)
    return lvl, rec


_tu_core_jit = functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))(
    _tu_core_impl)


def _tu_core(*args):
    n = args[4]
    return (_tu_core_impl if _inline_tu(n) else _tu_core_jit)(*args)


def _tu_window_core_impl(win, cwin, orig, mode, leaf, origin,
                         n, component, qp, rdoq, use_dst, grid):
    """Code one TB on its local [2n+1, 2n+1] context window (interior at
    [1:n+1, 1:n+1]); cwin = its [n, n] coefficient window. origin =
    traced [2] global sample coords; grid = (pad_w, pad_h, n_ctu_x,
    scale) statics.

    Inner-jitted so the ~520 per-TU call sites of the unrolled CTU DFS
    share one compiled body per (n, component, qp) class — without it
    whole-frame recon compiles cost ~880 s / 10.6 GB on CPU."""
    pad_w, pad_h, n_ctu_x, scale = grid
    left_col = win[1:1 + 2 * n, 0]
    top_row = win[0, 0:2 * n + 1]
    r = jnp.concatenate([left_col[::-1], top_row])  # [4n+1] linear layout

    avail = refs.availability(origin[None], n, pad_w, pad_h, n_ctu_x,
                              scale)[0]
    lvl, rec = _tu_core(r, avail, orig, mode, n, component, qp, rdoq,
                        use_dst)
    cwin = jnp.where(leaf, lvl, cwin)
    win = win.at[1:1 + n, 1:1 + n].set(
        jnp.where(leaf, rec, win[1:1 + n, 1:1 + n]))
    return win, cwin


_tu_window_core_jit = functools.partial(
    jax.jit, static_argnums=(6, 7, 8, 9, 10, 11))(_tu_window_core_impl)


def _tu_window_core(*args):
    n = args[6]
    return (_tu_window_core_impl if _inline_tu(n)
            else _tu_window_core_jit)(*args)


def _code_tu(ext, coef, orig_tile, x0, y0, n, mode, leaf, qp, *,
             component, g_origin, pad_w, pad_h, n_ctu_x, scale,
             rdoq=True, use_dst=False):
    """Code one TB inside the extended tile [2S+1, 2S+1] (interior at
    [1:S+1, 1:S+1], context in row 0 / col 0). Returns (ext, coef).

    x0/y0 are STATIC ints (the node table is unrolled at trace time), so
    every slice below lowers to a static slice/update — no dynamic
    addressing on the hot path. The compute happens in _tu_window_core
    on a local window so XLA compiles one shared body per TB class."""
    # y0 + 2n <= S + n <= 2S and x0 + 2n + 1 <= 2S + 1: always in bounds
    w = 2 * n + 1
    win = ext[y0:y0 + w, x0:x0 + w]
    cwin = coef[y0:y0 + n, x0:x0 + n]
    orig = orig_tile[y0:y0 + n, x0:x0 + n]
    origin = (jnp.asarray(g_origin, jnp.int32)
              + jnp.asarray([x0, y0], jnp.int32))
    win, cwin = _tu_window_core(
        win, cwin, orig, mode, leaf, origin, n, component, qp, bool(rdoq),
        bool(use_dst), (pad_w, pad_h, n_ctu_x, scale))
    ext = ext.at[y0:y0 + w, x0:x0 + w].set(win)
    coef = coef.at[y0:y0 + n, x0:x0 + n].set(cwin)
    return ext, coef


def code_ctu(orig_y_t, orig_cb_t, orig_cr_t, ctx_y, ctx_cb, ctx_cr,
             depth8_t, modes4_t, nxn8_t, g_origin, *, qp, cqp, pad_w,
             pad_h, n_ctu_x, rdoq=True):
    """Code one CTU. ctx_*: (top [2S], left [S], corner scalar) tuples.
    Returns (rec_y [64,64], rec_cb, rec_cr, coef_y, coef_cb, coef_cr)."""

    def make_ext(S, ctx):
        top, left, corner = ctx
        ext = jnp.zeros((2 * S + 1, 2 * S + 1), jnp.int32)
        ext = ext.at[0, 0].set(corner)
        ext = ext.at[0, 1:2 * S + 1].set(top)
        ext = ext.at[1:S + 1, 0].set(left)
        return ext

    carry0 = (make_ext(64, ctx_y), make_ext(32, ctx_cb),
              make_ext(32, ctx_cr), jnp.zeros((64, 64), jnp.int32),
              jnp.zeros((32, 32), jnp.int32), jnp.zeros((32, 32), jnp.int32))

    def branch_fn(size, carry, x0, y0, leaf, mode, nxn):
        ext_y, ext_cb, ext_cr, coef_y, coef_cb, coef_cr = carry
        g_chroma = g_origin // 2
        ckw = dict(component="chroma", g_origin=g_chroma, pad_w=pad_w // 2,
                   pad_h=pad_h // 2, n_ctu_x=n_ctu_x, scale=2, rdoq=rdoq)
        lkw = dict(component="luma", g_origin=g_origin, pad_w=pad_w,
                   pad_h=pad_h, n_ctu_x=n_ctu_x, scale=1, rdoq=rdoq)
        if size == 64:
            for (dx, dy) in ((0, 0), (32, 0), (0, 32), (32, 32)):
                ext_y, coef_y = _code_tu(ext_y, coef_y, orig_y_t,
                                         x0 + dx, y0 + dy, 32, mode, leaf,
                                         qp, **lkw)
            for (dx, dy) in ((0, 0), (16, 0), (0, 16), (16, 16)):
                cx, cy = (x0 >> 1) + dx, (y0 >> 1) + dy
                ext_cb, coef_cb = _code_tu(ext_cb, coef_cb, orig_cb_t,
                                           cx, cy, 16, mode, leaf, cqp,
                                           **ckw)
                ext_cr, coef_cr = _code_tu(ext_cr, coef_cr, orig_cr_t,
                                           cx, cy, 16, mode, leaf, cqp,
                                           **ckw)
        else:
            if size == 8:
                # 2Nx2N 8x8 TU (leaf & ~nxn) then the four 4x4 NxN
                # PUs/TUs (leaf & nxn, DST, per-PU modes) — both chains
                # are in the graph; the leaf masks select which one
                # lands in the carry.
                ext_y, coef_y = _code_tu(ext_y, coef_y, orig_y_t, x0, y0,
                                         8, mode, leaf & ~nxn, qp, **lkw)
                for (dx, dy) in ((0, 0), (4, 0), (0, 4), (4, 4)):
                    m4 = modes4_t[(y0 + dy) >> 2, (x0 + dx) >> 2]
                    ext_y, coef_y = _code_tu(ext_y, coef_y, orig_y_t,
                                             x0 + dx, y0 + dy, 4, m4,
                                             leaf & nxn, qp,
                                             use_dst=True, **lkw)
            else:
                ext_y, coef_y = _code_tu(ext_y, coef_y, orig_y_t, x0, y0,
                                         size, mode, leaf, qp, **lkw)
            half = size >> 1
            ext_cb, coef_cb = _code_tu(ext_cb, coef_cb, orig_cb_t,
                                       x0 >> 1, y0 >> 1, half, mode, leaf,
                                       cqp, **ckw)
            ext_cr, coef_cr = _code_tu(ext_cr, coef_cr, orig_cr_t,
                                       x0 >> 1, y0 >> 1, half, mode, leaf,
                                       cqp, **ckw)
        return (ext_y, ext_cb, ext_cr, coef_y, coef_cb, coef_cr)

    # The node table is static: unroll the 85-node DFS at trace time so
    # every tile slice/update is static and XLA fuses the whole CTU
    # program (a lax.scan + lax.switch here costs a full carry copy and a
    # dynamic dispatch per node — measured ~20x slower at 1080p).
    carry = carry0
    for (d, x0, y0) in node_table():
        d, x0, y0 = int(d), int(x0), int(y0)
        leaf = depth8_t[y0 >> 3, x0 >> 3] == d
        # CU mode = the PU0 (top-left 4x4) mode; chroma DM likewise
        mode = modes4_t[y0 >> 2, x0 >> 2]
        nxn = nxn8_t[y0 >> 3, x0 >> 3]
        carry = branch_fn(64 >> d, carry, x0, y0, leaf, mode, nxn)
    ext_y, ext_cb, ext_cr, coef_y, coef_cb, coef_cr = carry
    return (ext_y[1:65, 1:65], ext_cb[1:33, 1:33], ext_cr[1:33, 1:33],
            coef_y, coef_cb, coef_cr)


@functools.lru_cache(maxsize=None)
def _diag_lanes(nx, ny):
    """Wavefront schedule arrays: (cxs, cys, active) [n_diag, wmax]."""
    n_diag = (nx - 1) + 2 * (ny - 1) + 1
    per_diag = [[(d - 2 * cy, cy) for cy in range(ny)
                 if 0 <= d - 2 * cy < nx] for d in range(n_diag)]
    wmax = max(len(p) for p in per_diag)
    cxs = np.zeros((n_diag, wmax), np.int32)
    cys = np.zeros((n_diag, wmax), np.int32)
    act = np.zeros((n_diag, wmax), bool)
    for d, lanes in enumerate(per_diag):
        for i, (cx, cy) in enumerate(lanes):
            cxs[d, i], cys[d, i], act[d, i] = cx, cy, True
    return cxs, cys, act


def encode_frame_planes(orig_y, orig_cb, orig_cr, depth8, modes4, nxn8, *,
                        qp: int, pad_w: int, pad_h: int,
                        rdoq: bool = True) -> FramePlanes:
    """Jittable whole-frame normative reconstruction + coefficients.

    modes4: [pad_h/4, pad_w/4] per-4x4 luma modes (the PU modes; for
    2Nx2N CUs each 4x4 carries the CU mode). nxn8: [pad_h/8, pad_w/8]
    bool NxN part flags at depth-3 CUs.

    pad_w/pad_h are the coded (min-CU-aligned) dims; internally everything
    is CTU-aligned — boundary CTUs extend past the frame, their outside
    nodes are never leaves (depth8 is padded with -1), and availability
    uses the true pad_w/pad_h.
    """
    nx, ny = -(-pad_w // 64), -(-pad_h // 64)
    W64, H64 = nx * 64, ny * 64
    cqp = quant.chroma_qp(qp)
    cxs, cys, act = _diag_lanes(nx, ny)

    def pad_to(a, th, tw, value=0):
        return jnp.pad(jnp.asarray(a, jnp.int32),
                       ((0, th - a.shape[0]), (0, tw - a.shape[1])),
                       constant_values=value)

    orig_y = pad_to(orig_y, H64, W64)
    orig_cb = pad_to(orig_cb, H64 // 2, W64 // 2)
    orig_cr = pad_to(orig_cr, H64 // 2, W64 // 2)
    depth8 = pad_to(depth8, H64 // 8, W64 // 8, value=-1)
    modes4 = pad_to(modes4, H64 // 4, W64 // 4)
    nxn8 = pad_to(nxn8, H64 // 8, W64 // 8).astype(bool)

    # Recon planes live PRE-PADDED in the scan carry (1-sample top/left
    # border + tile bottom/right slack) so every context read and tile
    # write is an exact dynamic slice / dynamic_update_slice. The
    # previous formulation re-padded the whole planes and index-vector
    # scattered every diagonal step — at 1080p the scatters alone made
    # the scan ~70x slower than the CTU compute (measured: 520-TU
    # code_ctu = 0.1 ms vs ~115 ms/step all-in).
    planes = FramePlanes(
        recon_y=jnp.zeros((H64 + 65, W64 + 65), jnp.int32),
        recon_cb=jnp.zeros((H64 // 2 + 33, W64 // 2 + 33), jnp.int32),
        recon_cr=jnp.zeros((H64 // 2 + 33, W64 // 2 + 33), jnp.int32),
        coef_y=jnp.zeros((H64, W64), jnp.int32),
        coef_cb=jnp.zeros((H64 // 2, W64 // 2), jnp.int32),
        coef_cr=jnp.zeros((H64 // 2, W64 // 2), jnp.int32),
    )
    wmax = cxs.shape[1]

    def diag_step(planes, diag):
        cx_l, cy_l, act_l = diag
        pry, prcb, prcr = planes.recon_y, planes.recon_cb, planes.recon_cr

        def lane(cx, cy):
            ox, oy = cx * 64, cy * 64
            oxc, oyc = ox // 2, oy // 2

            def ctx(pp, o_y, o_x, S):
                import os
                if os.environ.get("HEVC_TPU_DEBUG_ZERO_CTX") == "1":
                    # perf-bisection aid: breaks the carry-read
                    # dependency (output is WRONG; never ship)
                    return (jnp.zeros((2 * S,), jnp.int32),
                            jnp.zeros((S,), jnp.int32), jnp.int32(0))
                top = jax.lax.dynamic_slice(pp, (o_y, o_x + 1),
                                            (1, 2 * S))[0]
                left = jax.lax.dynamic_slice(pp, (o_y + 1, o_x),
                                             (S, 1))[:, 0]
                corner = jax.lax.dynamic_slice(pp, (o_y, o_x), (1, 1))[0, 0]
                return (top, left, corner)

            return code_ctu(
                jax.lax.dynamic_slice(orig_y, (oy, ox), (64, 64)),
                jax.lax.dynamic_slice(orig_cb, (oyc, oxc), (32, 32)),
                jax.lax.dynamic_slice(orig_cr, (oyc, oxc), (32, 32)),
                ctx(pry, oy, ox, 64), ctx(prcb, oyc, oxc, 32),
                ctx(prcr, oyc, oxc, 32),
                jax.lax.dynamic_slice(depth8, (cy * 8, cx * 8), (8, 8)),
                jax.lax.dynamic_slice(modes4, (cy * 16, cx * 16),
                                      (16, 16)),
                jax.lax.dynamic_slice(nxn8, (cy * 8, cx * 8), (8, 8)),
                jnp.stack([ox, oy]),
                qp=qp, cqp=cqp, pad_w=pad_w, pad_h=pad_h, n_ctu_x=nx,
                rdoq=rdoq)

        outs = jax.vmap(lane)(cx_l, cy_l)
        rec_y_t, rec_cb_t, rec_cr_t, cf_y_t, cf_cb_t, cf_cr_t = outs

        def put(plane, tiles, s, border):
            # per-lane conditional dynamic updates: in-place on the
            # carry, no gather/scatter lowering
            for i in range(wmax):
                py = cy_l[i] * s + border
                px = cx_l[i] * s + border
                cur = jax.lax.dynamic_slice(plane, (py, px), (s, s))
                new = jnp.where(act_l[i], tiles[i], cur)
                plane = jax.lax.dynamic_update_slice(plane, new, (py, px))
            return plane

        planes = FramePlanes(
            recon_y=put(planes.recon_y, rec_y_t, 64, 1),
            recon_cb=put(planes.recon_cb, rec_cb_t, 32, 1),
            recon_cr=put(planes.recon_cr, rec_cr_t, 32, 1),
            coef_y=put(planes.coef_y, cf_y_t, 64, 0),
            coef_cb=put(planes.coef_cb, cf_cb_t, 32, 0),
            coef_cr=put(planes.coef_cr, cf_cr_t, 32, 0),
        )
        return planes, None

    planes, _ = jax.lax.scan(
        diag_step, planes,
        (jnp.asarray(cxs), jnp.asarray(cys), jnp.asarray(act)))
    # narrow dtypes: recon fits u8, levels fit i16 — halves/quarters the
    # device->host transfer that feeds the host CABAC stage.
    return FramePlanes(
        recon_y=planes.recon_y[1:1 + pad_h,
                               1:1 + pad_w].astype(jnp.uint8),
        recon_cb=planes.recon_cb[1:1 + pad_h // 2,
                                 1:1 + pad_w // 2].astype(jnp.uint8),
        recon_cr=planes.recon_cr[1:1 + pad_h // 2,
                                 1:1 + pad_w // 2].astype(jnp.uint8),
        coef_y=planes.coef_y[:pad_h, :pad_w].astype(jnp.int16),
        coef_cb=planes.coef_cb[:pad_h // 2, :pad_w // 2].astype(jnp.int16),
        coef_cr=planes.coef_cr[:pad_h // 2, :pad_w // 2].astype(jnp.int16),
    )


@functools.partial(jax.jit,
                   static_argnames=("qp", "pad_w", "pad_h", "rdoq"))
def encode_frame_planes_jit(orig_y, orig_cb, orig_cr, depth8, modes4,
                            nxn8, *, qp, pad_w, pad_h, rdoq=True):
    return encode_frame_planes(orig_y, orig_cb, orig_cr, depth8, modes4,
                               nxn8, qp=qp, pad_w=pad_w, pad_h=pad_h,
                               rdoq=rdoq)
