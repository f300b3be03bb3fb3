"""TU-granular wavefront reconstruction (fast phase-B backend).

The CTU-diagonal engine (pipeline/recon.py) serializes 62 diagonals x 85
quadtree nodes ~= 5270 tiny steps at 1080p. Intra dependencies actually
live at TU granularity, so this backend schedules *every TU of the frame*
into dependency levels (host-side longest-path over the ref-sample DAG,
~ms of NumPy) and runs one lax.scan step per level — ~70-120 wide steps
at 1080p, each a dense batched predict->DCT->quant->IDCT->recon over all
TUs of the level, grouped by size class. Same normative math as
pipeline/recon.py (shared ops); parity-tested against the golden encoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import intra, quant, refs, transforms
from .recon import FramePlanes

RDOQ_ON = True  # keep in sync with EncoderConfig.rdoq default


# ---------------------------------------------------------------------------
# Host-side schedule
# ---------------------------------------------------------------------------

def _leaf_tus(depth8):
    """Enumerate luma TUs in coding order: (u0, v0, s8) in 8-px cells.

    64-CUs emit their four 32x32 TUs (implicit split); smaller CUs emit
    TU == CU.
    """
    h8, w8 = depth8.shape
    tus = []

    def rec(u, v, size8, depth):
        if u >= w8 or v >= h8:
            return
        d = depth8[v, u]
        if d > depth or (u + size8 > w8) or (v + size8 > h8):
            h = size8 // 2
            for (du, dv) in ((0, 0), (h, 0), (0, h), (h, h)):
                rec(u + du, v + dv, h, depth + 1)
        else:
            if size8 == 8:
                for (du, dv) in ((0, 0), (4, 0), (0, 4), (4, 4)):
                    tus.append((u + du, v + dv, 4))
            else:
                tus.append((u, v, size8))

    for cv in range(0, h8, 8):
        for cu in range(0, w8, 8):
            rec(cu, cv, 8, 0)
    return tus


def build_schedule(depth8):
    """Assign each TU a dependency level; group by (level, size class).

    Returns dict size8 -> (idx [n_steps, cap, 2] int32, act [n_steps, cap]
    bool) plus n_steps. Levels: level(TU) = 1 + max(level of coded cells
    its reference samples touch).
    """
    depth8 = np.asarray(depth8)
    h8, w8 = depth8.shape
    tus = _leaf_tus(depth8)
    level_map = np.full((h8, w8), -1, np.int32)
    levels = []
    for (u, v, s8) in tus:
        lv = 0
        # left column cells (incl. below-left) and top row (incl. top-right)
        if u > 0:
            vv = slice(v, min(v + 2 * s8, h8))
            cells = level_map[vv, u - 1]
            if cells.size:
                lv = max(lv, int(cells.max()) + 1)
        if v > 0:
            lo = max(u - 1, 0)
            hi = min(u + 2 * s8, w8)
            cells = level_map[v - 1, lo:hi]
            if cells.size:
                lv = max(lv, int(cells.max()) + 1)
        levels.append(lv)
        level_map[v:v + s8, u:u + s8] = lv

    n_steps = max(levels) + 1 if levels else 1
    # pad step count to a bucket so jit shape variants stay bounded
    n_steps = -(-n_steps // 16) * 16
    out = {}
    for s8 in (1, 2, 4):
        per_level = [[] for _ in range(n_steps)]
        for (tu, lv) in zip(tus, levels):
            if tu[2] == s8:
                per_level[lv].append((tu[0], tu[1]))
        cap = max((len(p) for p in per_level), default=0)
        cap = max(cap, 1)
        # quantize cap to powers of two to bound jit variants
        cap = 1 << (cap - 1).bit_length()
        idx = np.zeros((n_steps, cap, 2), np.int32)
        act = np.zeros((n_steps, cap), bool)
        for lv, p in enumerate(per_level):
            for i, (u, v) in enumerate(p):
                idx[lv, i] = (u, v)
                act[lv, i] = True
        out[s8] = (idx, act)
    return out, n_steps


# ---------------------------------------------------------------------------
# Device compute
# ---------------------------------------------------------------------------

def _code_class(planes_y, coef_y, planes_c, coef_c, orig_y, orig_cb, orig_cr,
                modes8, idx, act, s8, *, qp, cqp, pad_w, pad_h, n_ctu_x):
    """Code all active TUs of one size class at one level.

    planes_c/coef_c/orig_c*: chroma pairs (cb, cr). Returns updated planes.
    """
    n = s8 * 8
    lanes = idx.shape[0]
    origins = idx * 8  # luma pixel coords [lanes, 2]

    def gather_block(plane, org, size):
        h, w = plane.shape
        ys = jnp.clip(org[:, 1:2, None] + jnp.arange(size)[None, :, None],
                      0, h - 1)
        xs = jnp.clip(org[:, 0:1, None] + jnp.arange(size)[None, None, :],
                      0, w - 1)
        return jnp.take(plane.reshape(-1), ys * w + xs, axis=0
                        ).astype(jnp.int32), (ys, xs)

    def scatter_block(plane, vals, org, size, active):
        h, w = plane.shape
        ys = org[:, 1:2, None] + jnp.arange(size)[None, :, None]
        xs = org[:, 0:1, None] + jnp.arange(size)[None, None, :]
        flat = (ys * w + xs).reshape(-1)
        keep = jnp.repeat(active, size * size)
        flat = jnp.where(keep, flat, plane.size)
        return plane.reshape(-1).at[flat].set(
            vals.reshape(-1), mode="drop").reshape(plane.shape)

    modes = modes8[idx[:, 1], idx[:, 0]]

    # ---- luma ----
    r = refs.gather_refs(planes_y, origins, n)
    av = refs.availability(origins, n, pad_w, pad_h, n_ctu_x, 1)
    r = intra.substitute_refs(r, av)
    rf = intra.filter_refs(r)
    r_use = intra.select_filtered_batch(r, rf, modes, n)
    pred = intra.predict_selected_modes(r_use, modes, n)
    orig, _ = gather_block(orig_y, origins, n)
    use_dst = (n == 4)
    from ..ops import rdoq as rdoq_lib
    lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
    cf = transforms.forward_transform(orig - pred, use_dst=use_dst)
    lvl = rdoq_lib.rd_quantize(cf, qp, lam) if RDOQ_ON else \
        quant.quantize(cf, qp)
    rres = transforms.inverse_transform(quant.dequantize(lvl, qp),
                                        use_dst=use_dst)
    rec = jnp.clip(pred + rres, 0, 255)
    planes_y = scatter_block(planes_y, rec, origins, n, act)
    coef_y = scatter_block(coef_y, lvl, origins, n, act)

    # ---- chroma (only TU == CU leaves carry chroma; the four 32-TUs of a
    # 64-CU each carry their co-located 16x16 chroma, which is exactly
    # every 32-TU here; 4px TUs (NxN) never occur in round-1 trees) ----
    cn = n // 2
    corg = origins // 2
    out_c = []
    for (plane_c, coef_pc, orig_c) in ((planes_c[0], coef_c[0], orig_cb),
                                       (planes_c[1], coef_c[1], orig_cr)):
        rc = refs.gather_refs(plane_c, corg, cn)
        avc = refs.availability(corg, cn, pad_w // 2, pad_h // 2, n_ctu_x, 2)
        rc = intra.substitute_refs(rc, avc)
        predc = intra.predict_selected_modes(rc, modes, cn,
                                             component="chroma")
        origc, _ = gather_block(orig_c, corg, cn)
        cfc = transforms.forward_transform(origc - predc)
        lamc = 0.57 * 2.0 ** ((cqp - 12) / 3.0)
        lvlc = rdoq_lib.rd_quantize(cfc, cqp, lamc, is_luma=False) \
            if RDOQ_ON else quant.quantize(cfc, cqp)
        rresc = transforms.inverse_transform(quant.dequantize(lvlc, cqp))
        recc = jnp.clip(predc + rresc, 0, 255)
        plane_c = scatter_block(plane_c, recc, corg, cn, act)
        coef_pc = scatter_block(coef_pc, lvlc, corg, cn, act)
        out_c.append((plane_c, coef_pc))
    return planes_y, coef_y, out_c


@functools.lru_cache(maxsize=8)
def _jitted(qp, pad_w, pad_h, shape_key):
    return jax.jit(functools.partial(
        encode_frame_planes_tu_inner, qp=qp, pad_w=pad_w, pad_h=pad_h))


def encode_frame_planes_tu_inner(orig_y, orig_cb, orig_cr, modes8,
                                 s1i, s1a, s2i, s2a, s4i, s4a, *,
                                 qp, pad_w, pad_h):
    """Traced whole-frame TU-wavefront reconstruction core."""
    nx = -(-pad_w // 64)
    cqp = quant.chroma_qp(qp)
    orig_y = jnp.asarray(orig_y, jnp.int32)
    orig_cb = jnp.asarray(orig_cb, jnp.int32)
    orig_cr = jnp.asarray(orig_cr, jnp.int32)
    modes8 = jnp.asarray(modes8, jnp.int32)
    recon_y = jnp.zeros((pad_h, pad_w), jnp.int32)
    recon_cb = jnp.zeros((pad_h // 2, pad_w // 2), jnp.int32)
    recon_cr = jnp.zeros((pad_h // 2, pad_w // 2), jnp.int32)
    coef_y = jnp.zeros((pad_h, pad_w), jnp.int32)
    coef_cb = jnp.zeros((pad_h // 2, pad_w // 2), jnp.int32)
    coef_cr = jnp.zeros((pad_h // 2, pad_w // 2), jnp.int32)
    kw = dict(qp=qp, cqp=cqp, pad_w=pad_w, pad_h=pad_h, n_ctu_x=nx)

    def step(carry, s):
        ry, rcb, rcr, cy, ccb, ccr = carry
        class_arrays = {1: (s[0], s[1]), 2: (s[2], s[3]), 4: (s[4], s[5])}
        for s8 in (4, 2, 1):
            idx, act = class_arrays[s8]
            ry, cy, outc = _code_class(
                ry, cy, (rcb, rcr), (ccb, ccr), orig_y, orig_cb, orig_cr,
                modes8, idx, act, s8, **kw)
            (rcb, ccb), (rcr, ccr) = outc
        return (ry, rcb, rcr, cy, ccb, ccr), None

    carry = (recon_y, recon_cb, recon_cr, coef_y, coef_cb, coef_cr)
    carry, _ = jax.lax.scan(step, carry, (s1i, s1a, s2i, s2a, s4i, s4a))
    ry, rcb, rcr, cy, ccb, ccr = carry
    return FramePlanes(
        recon_y=ry.astype(jnp.uint8), recon_cb=rcb.astype(jnp.uint8),
        recon_cr=rcr.astype(jnp.uint8),
        coef_y=cy.astype(jnp.int16), coef_cb=ccb.astype(jnp.int16),
        coef_cr=ccr.astype(jnp.int16))


def reconstruct_tu(pf_y, pf_cb, pf_cr, depth8, modes8, *, qp, pad_w, pad_h):
    """Host wrapper: build schedule, call the (shape-keyed) jitted fn."""
    schedule, n_steps = build_schedule(np.asarray(depth8))
    shapes = tuple(schedule[s][0].shape for s in (1, 2, 4))
    fn = _jitted(qp, pad_w, pad_h, shapes)
    return fn(pf_y, pf_cb, pf_cr, modes8,
              jnp.asarray(schedule[1][0]), jnp.asarray(schedule[1][1]),
              jnp.asarray(schedule[2][0]), jnp.asarray(schedule[2][1]),
              jnp.asarray(schedule[4][0]), jnp.asarray(schedule[4][1]))
