"""HEVC intra prediction: reference samples + the 35 prediction modes.

Normative per H.265 8.4.4.2 (the decoder computes exactly this, so encoder
reconstruction must match bit-for-bit). Behavioral counterpart in the
reference: TComPrediction.cpp:412 (predIntraAng) + TComPattern.cpp
(reference-sample substitution/filtering).

TPU-first formulation: reference samples live in one linear array
r[0..4N] (bottom-left .. corner .. top-right). For every (mode, N) the
angular projection/interp indices are STATIC tables, so a whole mode's
prediction is two gathers + one weighted add — vectorizable over
[batch, mode] with no data-dependent control flow. The 35-mode sweep used
by RDO search is a single batched einsum-free gather pipeline.

Layout of r (length 4N+1):
  r[0]        = p[-1][2N-1]      (bottom-most left sample)
  r[2N-1]     = p[-1][0]
  r[2N]       = p[-1][-1]        (corner)
  r[2N+1]     = p[0][-1]
  r[4N]       = p[2N-1][-1]      (right-most top sample)
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# Mode -> displacement angle (H.265 Table 8-4).
INTRA_ANGLES = {
    2: 32, 3: 26, 4: 21, 5: 17, 6: 13, 7: 9, 8: 5, 9: 2, 10: 0,
    11: -2, 12: -5, 13: -9, 14: -13, 15: -17, 16: -21, 17: -26, 18: -32,
    19: -26, 20: -21, 21: -17, 22: -13, 23: -9, 24: -5, 25: -2, 26: 0,
    27: 2, 28: 5, 29: 9, 30: 13, 31: 17, 32: 21, 33: 26, 34: 32,
}
# Mode -> inverse angle (round(8192/|angle|), Table 8-5; modes 11..25 only).
INV_ANGLES = {
    11: -4096, 12: -1638, 13: -910, 14: -630, 15: -482, 16: -390, 17: -315,
    18: -256, 19: -315, 20: -390, 21: -482, 22: -630, 23: -910, 24: -1638,
    25: -4096,
}
PLANAR, DC, HOR, VER = 0, 1, 10, 26


def ref_filter_flag(mode: int, n: int) -> bool:
    """Luma reference-smoothing decision (8.4.4.2.3)."""
    if mode == DC or n == 4:
        return False
    min_dist = min(abs(mode - HOR), abs(mode - VER))
    # n=64 only occurs in 64x64 PB *search* (TUs are <=32); treat like 32.
    thres = {8: 7, 16: 1, 32: 0, 64: 0}[n]
    return min_dist > thres


# ---------------------------------------------------------------------------
# Static index tables
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _angular_tables(mode: int, n: int):
    """Static gather tables for one angular mode at TU size n.

    Returns (idx0, idx1, fact): arrays of shape [n, n] with indices into the
    linear ref array r[0..4n] and the 5-bit interpolation factor, such that
      pred[y][x] = ((32-fact)*r[idx0] + fact*r[idx1] + 16) >> 5
    For modes < 18 the prediction is computed transposed internally; these
    tables already account for that (they are expressed in output [y][x]).
    """
    assert 2 <= mode <= 34
    angle = INTRA_ANGLES[mode]
    vertical = mode >= 18

    # Work in the "main-reference" frame (top row for vertical modes, left
    # column for horizontal ones; horizontal output is transposed into place).
    # Extended main array em[k], k in [-n .. 2n]:
    #   vertical:   em[k>=0] = p[k-1][-1] -> r[2n+k]; projected side samples
    #               em[k<0] = p[-1][j], j = ((k*invAngle+128)>>8)-1 -> r[2n-1-j]
    #   horizontal: em[k>=0] = p[-1][k-1] -> r[2n-k]; side = p[j][-1] -> r[2n+1+j]
    idx0 = np.zeros((n, n), np.int32)
    idx1 = np.zeros((n, n), np.int32)
    fact = np.zeros((n, n), np.int32)
    for y in range(n):
        i_idx = ((y + 1) * angle) >> 5
        i_fact = ((y + 1) * angle) & 31
        for x in range(n):
            k1 = x + i_idx + 1   # em index of first tap
            k2 = k1 + 1
            if vertical:
                def em(k):
                    if k >= 0:
                        return 2 * n + k          # p[k-1][-1]
                    j = ((k * INV_ANGLES[mode] + 128) >> 8) - 1
                    return 2 * n - 1 - j          # p[-1][j]
            else:
                def em(k):
                    if k >= 0:
                        return 2 * n - k          # p[-1][k-1]
                    j = ((k * INV_ANGLES[mode] + 128) >> 8) - 1
                    return 2 * n + 1 + j          # p[j][-1]
            a = em(k1)
            # When iFact == 0 the spec uses the single-tap branch; the second
            # tap (weight 0) may fall outside the ref array — alias it to the
            # first so the gather stays in bounds.
            b = em(k2) if i_fact != 0 else a
            if vertical:
                idx0[y, x], idx1[y, x], fact[y, x] = a, b, i_fact
            else:
                idx0[x, y], idx1[x, y], fact[x, y] = a, b, i_fact
    return idx0, idx1, fact


# ---------------------------------------------------------------------------
# NumPy oracle
# ---------------------------------------------------------------------------

def substitute_refs_np(r, avail, bit_depth=8):
    """Reference sample substitution (8.4.4.2.2) on linear arrays.

    r: [B, 4N+1] sample values (garbage where unavailable).
    avail: [B, 4N+1] bool.
    """
    r = np.array(r, np.int32)
    avail = np.asarray(avail, bool)
    out = np.empty_like(r)
    for b in range(r.shape[0]):
        if not avail[b].any():
            out[b] = 1 << (bit_depth - 1)
            continue
        row = r[b].copy()
        # forward fill from index 0; leading unavailable take first available
        first = np.argmax(avail[b])
        row[:first] = row[first]
        for i in range(1, row.shape[0]):
            if not avail[b, i] and i > first:
                row[i] = row[i - 1]
        out[b] = row
    return out


def filter_refs_np(r):
    """[1 2 1]/4 smoothing along the linear ref array, endpoints kept."""
    r = np.asarray(r, np.int32)
    f = r.copy()
    f[..., 1:-1] = (r[..., :-2] + 2 * r[..., 1:-1] + r[..., 2:] + 2) >> 2
    return f


def predict_np(r, mode, n, *, component="luma", bit_depth=8):
    """Predict one [B, n, n] block from linear refs [B, 4n+1] for `mode`."""
    r = np.asarray(r, np.int32)
    B = r.shape[0]
    left = r[:, 2 * n - 1::-1]        # left[j] = p[-1][j], j=0..2n-1
    top = r[:, 2 * n + 1:]            # top[i] = p[i][-1], i=0..2n-1
    corner = r[:, 2 * n]
    maxv = (1 << bit_depth) - 1

    if mode == PLANAR:
        T = top[:, :n]
        L = left[:, :n]
        pred = np.zeros((B, n, n), np.int32)
        for yy in range(n):
            for xx in range(n):
                pred[:, yy, xx] = (
                    (n - 1 - xx) * L[:, yy] + (xx + 1) * top[:, n]
                    + (n - 1 - yy) * T[:, xx] + (yy + 1) * left[:, n]
                    + n) >> (int(n).bit_length() - 1 + 1)
        return pred

    if mode == DC:
        dc = (top[:, :n].sum(1) + left[:, :n].sum(1) + n) >> (
            int(n).bit_length() - 1 + 1)
        pred = np.broadcast_to(dc[:, None, None], (B, n, n)).copy()
        if component == "luma" and n < 32:
            pred[:, 0, 1:] = (top[:, 1:n] + 3 * dc[:, None] + 2) >> 2
            pred[:, 1:, 0] = (left[:, 1:n] + 3 * dc[:, None] + 2) >> 2
            pred[:, 0, 0] = (left[:, 0] + 2 * dc + top[:, 0] + 2) >> 2
        return pred.astype(np.int32)

    idx0, idx1, fact = _angular_tables(mode, n)
    p0 = r[:, idx0]
    p1 = r[:, idx1]
    pred = ((32 - fact)[None] * p0 + fact[None] * p1 + 16) >> 5
    if component == "luma" and n < 32:
        if mode == VER:
            delta = (left[:, :n].astype(np.int32) - corner[:, None]) >> 1
            pred[:, :, 0] = np.clip(top[:, 0][:, None] + delta, 0, maxv)
        elif mode == HOR:
            delta = (top[:, :n].astype(np.int32) - corner[:, None]) >> 1
            pred[:, 0, :] = np.clip(left[:, 0][:, None] + delta, 0, maxv)
    return pred.astype(np.int32)


# ---------------------------------------------------------------------------
# JAX batched versions
# ---------------------------------------------------------------------------

def substitute_refs(r, avail, bit_depth=8):
    """Vectorized substitution: forward-fill last-available, then head fill."""
    r = jnp.asarray(r, jnp.int32)
    avail = jnp.asarray(avail, bool)
    L = r.shape[-1]
    pos = jnp.where(avail, jnp.arange(L), -1)
    last = jax.lax.associative_scan(jnp.maximum, pos, axis=-1)
    first = jnp.argmax(avail, axis=-1)                     # first available idx
    gather_idx = jnp.where(last >= 0, last, first[..., None])
    out = jnp.take_along_axis(r, gather_idx, axis=-1)
    any_avail = avail.any(axis=-1, keepdims=True)
    return jnp.where(any_avail, out, 1 << (bit_depth - 1))


def filter_refs(r):
    r = jnp.asarray(r, jnp.int32)
    mid = (r[..., :-2] + 2 * r[..., 1:-1] + r[..., 2:] + 2) >> 2
    return jnp.concatenate([r[..., :1], mid, r[..., -1:]], axis=-1)


@functools.lru_cache(maxsize=None)
def _all_mode_tables(n: int):
    """Stacked gather tables for modes 2..34: [33, n, n] each."""
    i0 = np.stack([_angular_tables(m, n)[0] for m in range(2, 35)])
    i1 = np.stack([_angular_tables(m, n)[1] for m in range(2, 35)])
    fa = np.stack([_angular_tables(m, n)[2] for m in range(2, 35)])
    return i0, i1, fa


def predict_all_modes(r, n, *, component="luma", bit_depth=8):
    """All 35 modes batched: r [B, 4n+1] -> pred [B, 35, n, n] int32.

    Mode order: index 0 = planar, 1 = DC, 2..34 = angular (HEVC numbering).
    Luma applies the normative DC/H/V boundary smoothing for n < 32.
    """
    r = jnp.asarray(r, jnp.int32)
    B = r.shape[0]
    log2n = int(n).bit_length() - 1
    left = r[:, 2 * n - 1::-1]
    top = r[:, 2 * n + 1:]
    corner = r[:, 2 * n]
    maxv = (1 << bit_depth) - 1

    # Angular modes: one gather over stacked tables.
    i0, i1, fa = _all_mode_tables(n)
    i0 = jnp.asarray(i0.reshape(-1))
    i1 = jnp.asarray(i1.reshape(-1))
    fa = jnp.asarray(fa.reshape(33, n, n))
    p0 = jnp.take(r, i0, axis=1).reshape(B, 33, n, n)
    p1 = jnp.take(r, i1, axis=1).reshape(B, 33, n, n)
    ang = ((32 - fa)[None] * p0 + fa[None] * p1 + 16) >> 5

    # Planar.
    xs = jnp.arange(n)
    T = top[:, :n]
    Lf = left[:, :n]
    tr = top[:, n]
    bl = left[:, n]
    pl = ((n - 1 - xs)[None, None, :] * Lf[:, :, None]
          + (xs + 1)[None, None, :] * tr[:, None, None]
          + (n - 1 - xs)[None, :, None] * T[:, None, :]
          + (xs + 1)[None, :, None] * bl[:, None, None]
          + n) >> (log2n + 1)

    # DC.
    dc = (T.sum(1) + Lf.sum(1) + n) >> (log2n + 1)
    dcp = jnp.broadcast_to(dc[:, None, None], (B, n, n))
    if component == "luma" and n < 32:
        row0 = (T + 3 * dc[:, None] + 2) >> 2
        col0 = (Lf + 3 * dc[:, None] + 2) >> 2
        c00 = (Lf[:, 0] + 2 * dc + T[:, 0] + 2) >> 2
        dcp = dcp.at[:, 0, :].set(row0)
        dcp = dcp.at[:, :, 0].set(col0)
        dcp = dcp.at[:, 0, 0].set(c00)
        # VER (mode 26 = angular idx 24): leftmost column smoothing.
        delta_v = (Lf - corner[:, None]) >> 1
        ver = ang[:, VER - 2].at[:, :, 0].set(
            jnp.clip(top[:, 0][:, None] + delta_v, 0, maxv))
        # HOR (mode 10 = angular idx 8): top row smoothing.
        delta_h = (T - corner[:, None]) >> 1
        hor = ang[:, HOR - 2].at[:, 0, :].set(
            jnp.clip(left[:, 0][:, None] + delta_h, 0, maxv))
        ang = ang.at[:, VER - 2].set(ver).at[:, HOR - 2].set(hor)

    return jnp.concatenate([pl[:, None], dcp[:, None], ang], axis=1)


def predict_mode(r, mode, n, **kw):
    """Single-mode convenience wrapper over predict_all_modes tables."""
    return predict_all_modes(r, n, **kw)[:, mode]


def predict_one_mode(r, mode, n, *, component="luma", bit_depth=8):
    """Predict one block for a *traced* mode scalar.

    r: [4n+1] int32 substituted refs (already filtered appropriately by the
    caller — see select_filtered). mode: int32 scalar (0..34).
    Returns [n, n] int32. Used by the reconstruction pipeline where the
    mode is data-dependent (chosen by the search phase).
    """
    r = jnp.asarray(r, jnp.int32)
    log2n = int(n).bit_length() - 1
    left = r[2 * n - 1::-1]
    top = r[2 * n + 1:]
    corner = r[2 * n]
    maxv = (1 << bit_depth) - 1

    i0s, i1s, fas = _all_mode_tables(n)
    midx = jnp.clip(mode - 2, 0, 32)
    i0 = jnp.take(jnp.asarray(i0s.reshape(33, -1)), midx, axis=0)
    i1 = jnp.take(jnp.asarray(i1s.reshape(33, -1)), midx, axis=0)
    fa = jnp.take(jnp.asarray(fas.reshape(33, -1)), midx, axis=0)
    p0 = jnp.take(r, i0).reshape(n, n)
    p1 = jnp.take(r, i1).reshape(n, n)
    fa = fa.reshape(n, n)
    ang = ((32 - fa) * p0 + fa * p1 + 16) >> 5

    xs = jnp.arange(n)
    T = top[:n]
    Lf = left[:n]
    pl = ((n - 1 - xs)[None, :] * Lf[:, None]
          + (xs + 1)[None, :] * top[n]
          + (n - 1 - xs)[:, None] * T[None, :]
          + (xs + 1)[:, None] * left[n]
          + n) >> (log2n + 1)

    dc = (T.sum() + Lf.sum() + n) >> (log2n + 1)
    dcp = jnp.full((n, n), dc, jnp.int32)
    if component == "luma" and n < 32:
        dcp = dcp.at[0, :].set((T + 3 * dc + 2) >> 2)
        dcp = dcp.at[:, 0].set((Lf + 3 * dc + 2) >> 2)
        dcp = dcp.at[0, 0].set((Lf[0] + 2 * dc + T[0] + 2) >> 2)
        ver_col = jnp.clip(top[0] + ((Lf - corner) >> 1), 0, maxv)
        hor_row = jnp.clip(left[0] + ((T - corner) >> 1), 0, maxv)
        ang = jnp.where(mode == VER, ang.at[:, 0].set(ver_col), ang)
        ang = jnp.where(mode == HOR, ang.at[0, :].set(hor_row), ang)

    out = jnp.where(mode == PLANAR, pl, jnp.where(mode == DC, dcp, ang))
    return out


def select_filtered(r, rf, mode, n):
    """Choose filtered vs unfiltered refs for a traced mode (luma)."""
    fmask = jnp.asarray(
        np.array([ref_filter_flag(m, n) for m in range(35)], bool))
    return jnp.where(jnp.take(fmask, mode), rf, r)


def predict_selected_modes(r, modes, n, *, component="luma", bit_depth=8):
    """Batched single-mode prediction with per-block traced modes.

    r: [B, 4n+1] substituted refs (caller picks filtered/unfiltered per
    block via select_filtered_batch); modes: [B] int32.
    Returns [B, n, n] int32. Vectorized twin of predict_one_mode used by
    the RD-refined search (one prediction per node instead of 35).
    """
    r = jnp.asarray(r, jnp.int32)
    B = r.shape[0]
    log2n = int(n).bit_length() - 1
    left = r[:, 2 * n - 1::-1]
    top = r[:, 2 * n + 1:]
    corner = r[:, 2 * n]
    maxv = (1 << bit_depth) - 1

    i0s, i1s, fas = _all_mode_tables(n)
    midx = jnp.clip(modes - 2, 0, 32)
    i0 = jnp.take(jnp.asarray(i0s.reshape(33, -1)), midx, axis=0)  # [B,n*n]
    i1 = jnp.take(jnp.asarray(i1s.reshape(33, -1)), midx, axis=0)
    fa = jnp.take(jnp.asarray(fas.reshape(33, -1)), midx, axis=0)
    p0 = jnp.take_along_axis(r, i0, axis=1).reshape(B, n, n)
    p1 = jnp.take_along_axis(r, i1, axis=1).reshape(B, n, n)
    fa = fa.reshape(B, n, n)
    ang = ((32 - fa) * p0 + fa * p1 + 16) >> 5

    xs = jnp.arange(n)
    T = top[:, :n]
    Lf = left[:, :n]
    pl = ((n - 1 - xs)[None, None, :] * Lf[:, :, None]
          + (xs + 1)[None, None, :] * top[:, n][:, None, None]
          + (n - 1 - xs)[None, :, None] * T[:, None, :]
          + (xs + 1)[None, :, None] * left[:, n][:, None, None]
          + n) >> (log2n + 1)

    dc = (T.sum(1) + Lf.sum(1) + n) >> (log2n + 1)
    dcp = jnp.broadcast_to(dc[:, None, None], (B, n, n))
    if component == "luma" and n < 32:
        row0 = (T + 3 * dc[:, None] + 2) >> 2
        col0 = (Lf + 3 * dc[:, None] + 2) >> 2
        c00 = (Lf[:, 0] + 2 * dc + T[:, 0] + 2) >> 2
        dcp = dcp.at[:, 0, :].set(row0).at[:, :, 0].set(col0)
        dcp = dcp.at[:, 0, 0].set(c00)
        ver_col = jnp.clip(top[:, 0][:, None] + ((Lf - corner[:, None]) >> 1),
                           0, maxv)
        hor_row = jnp.clip(left[:, 0][:, None] + ((T - corner[:, None]) >> 1),
                           0, maxv)
        ang = jnp.where((modes == VER)[:, None, None],
                        ang.at[:, :, 0].set(ver_col), ang)
        ang = jnp.where((modes == HOR)[:, None, None],
                        ang.at[:, 0, :].set(hor_row), ang)

    out = jnp.where((modes == PLANAR)[:, None, None], pl,
                    jnp.where((modes == DC)[:, None, None], dcp, ang))
    return out


def select_filtered_batch(r, rf, modes, n):
    """Per-block filtered/unfiltered ref choice for traced modes [B]."""
    fmask = jnp.asarray(
        np.array([ref_filter_flag(m, n) for m in range(35)], bool))
    sel = jnp.take(fmask, modes)
    return jnp.where(sel[:, None], rf, r)
