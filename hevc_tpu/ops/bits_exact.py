"""Context-exact CABAC rate estimation for RDO (frozen init states).

Replaces the per-event-class weights of ops/bits.py with the exact
fractional-bit cost of every bin of a TU's residual_coding() syntax,
evaluated at the slice-init context states (entropy/cabac.ENTROPY_BITS
at the state each bin would see with adaptation disabled) — the same
estimation model HM uses inside RDO (estBitsSbac fractional-bit tables,
TComTrQuant::xGetIC{Rate,Cost}, TEncSbac bit counting mode), where the
estimate also prices each bin against a context state treated as a
constant for the whole TU.

Everything is vectorized over a TU batch with static shapes; the only
sequential pieces of the syntax — the greater1 c1 track, the previous-
coded-subset ctx-set bit, and the Golomb-Rice adaptation — become a
closed form, a small unrolled subset scan, and a 16-step unrolled rank
loop respectively, all elementwise over [batch, n_cg].

Validated bit-exact against a frozen-state counting twin of
entropy/residual.code_residual (tests/test_bits_exact.py).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..entropy import residual as res_lib, scan as scanlib
from ..entropy.cabac import ENTROPY_BITS
from ..entropy.contexts import ContextModels

C1FLAG_NUMBER = res_lib.C1FLAG_NUMBER


# ---------------------------------------------------------------------------
# Trace-time constant tables (per size/scan/component/qp/slice-type)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _tables(n: int, scan_type: int, is_luma: bool, qp: int,
            init_type: int):
    import os
    ctx = ContextModels(init_type, qp)
    if os.environ.get("HEVC_TPU_BITS_STATES", "adapted") == "adapted":
        # mid-slice adapted states (HM estBitsSbac reads the live
        # adapted contexts; init states overprice bins -> over-zeroing)
        from . import adapted_states as ast
        state, mps = ast.adapted_states(int(qp), int(init_type))
        ctx.state[:] = state
        ctx.mps[:] = mps
    eb = ENTROPY_BITS.astype(np.float64) / 32768.0

    def bin_cost(idx: int, v: int) -> float:
        s = int(ctx.state[idx])
        m = int(ctx.mps[idx])
        return float(eb[s, int(v != m)])

    scan = scanlib.grouped_scan(scan_type, n)          # scan idx -> raster
    cgs = scanlib.cg_scan(scan_type, n)                # subset -> cg blk
    ncg = max(n // 4, 1) ** 2
    n_cg_w = max(n // 4, 1)

    # last_sig_coeff_{x,y} cost per possible last scan position
    class _Count:
        def __init__(self):
            self.bits = 0.0

        def encode_bin(self, _ctx, idx, v):
            self.bits += bin_cost(idx, v)

        def encode_bypass(self, v):
            self.bits += 1.0

    cost_last = np.zeros(n * n, np.float32)
    for k in range(n * n):
        rp = int(scan[k])
        cnt = _Count()
        res_lib._code_last_xy(cnt, ctx, rp % n, rp // n, n, is_luma,
                              scan_type)
        cost_last[k] = cnt.bits

    # significance flag cost per scan position / neighbour pattern / bin
    sig_base = ctx.idx("sig_flag", res_lib.SIG_LUMA_OFFSET if is_luma
                       else res_lib.SIG_CHROMA_OFFSET)
    first_ctx = res_lib._first_sig_ctx(n, is_luma, scan_type)
    npat = 1 if n == 4 else 4
    cost_sig = np.zeros((npat, n * n, 2), np.float32)
    for k in range(n * n):
        rp = int(scan[k])
        py, px = rp // n, rp % n
        for p in range(npat):
            inc = res_lib._sig_ctx_inc(p, px, py, n, is_luma, first_ctx)
            for v in (0, 1):
                cost_sig[p, k, v] = bin_cost(sig_base + inc, v)

    # coded_sub_block_flag cost [ctx inc, bin]
    cg_base = ctx.idx("sig_cg", 0 if is_luma else 2)
    cost_cg = np.array([[bin_cost(cg_base + i, v) for v in (0, 1)]
                        for i in (0, 1)], np.float32)

    # greater1 cost [ctx_set, c1, bin]; greater2 cost [ctx_set, bin]
    nset = 4 if is_luma else 2
    one_off = 0 if is_luma else 16
    abs_off = 0 if is_luma else 4
    cost_one = np.zeros((nset, 4, 2), np.float32)
    cost_abs = np.zeros((nset, 2), np.float32)
    for s in range(nset):
        for c1 in range(4):
            for v in (0, 1):
                cost_one[s, c1, v] = bin_cost(
                    ctx.idx("one_flag", one_off + s * 4 + c1), v)
        for v in (0, 1):
            cost_abs[s, v] = bin_cost(ctx.idx("abs_flag", abs_off + s), v)

    # CG neighbour subset indices (right / lower in block coords)
    blk_to_sub = np.full(ncg, -1, np.int32)
    for s in range(ncg):
        blk_to_sub[int(cgs[s])] = s
    right_sub = np.full(ncg, -1, np.int32)
    lower_sub = np.full(ncg, -1, np.int32)
    for s in range(ncg):
        blk = int(cgs[s])
        cy, cx = blk // n_cg_w, blk % n_cg_w
        if cx < n_cg_w - 1:
            right_sub[s] = blk_to_sub[cy * n_cg_w + cx + 1]
        if cy < n_cg_w - 1:
            lower_sub[s] = blk_to_sub[(cy + 1) * n_cg_w + cx]

    # gather map raster -> CG-grouped scan order
    return dict(scan=scan.astype(np.int32), cost_last=cost_last,
                cost_sig=cost_sig, cost_cg=cost_cg, cost_one=cost_one,
                cost_abs=cost_abs, right_sub=right_sub,
                lower_sub=lower_sub, ncg=ncg)


@functools.lru_cache(maxsize=None)
def _stacked_tables(n: int, scan_type: int, is_luma: bool,
                    qp_set: tuple, init_type: int):
    """Per-QP cost tables stacked over a leading qp_set axis, plus the
    qp -> qp_set-index map (58 entries). Enables traced/per-block QP:
    the compiled program gathers the right table row at runtime."""
    ts = [_tables(n, scan_type, is_luma, int(q), init_type)
          for q in qp_set]
    out = dict(ts[0])
    for k in ("cost_last", "cost_sig", "cost_cg", "cost_one", "cost_abs"):
        out[k] = np.stack([t[k] for t in ts])
    idx = np.zeros(58, np.int32)
    for i, q in enumerate(qp_set):
        idx[int(q)] = i
    out["qp_idx"] = idx
    return out


def _golomb_bits(value, rice):
    """coeff_abs_level_remaining bit length (value >= 0, rice 0..4)."""
    thresh = 3 << rice
    small = (value >> rice) + 1 + rice
    w = jnp.maximum(value - thresh + (1 << rice), 1)
    length = jnp.floor(jnp.log2(w.astype(jnp.float32))).astype(jnp.int32)
    big = 4 + 2 * length - rice
    return jnp.where(value < thresh, small, big).astype(jnp.float32)


def tu_bits_exact(levels, *, qp, is_luma: bool = True,
                  scan_type: int = scanlib.SCAN_DIAG,
                  init_type: int = 0, qp_set=None):
    """Exact frozen-state CABAC bits of one TU's residual syntax.

    levels: [..., n, n] int -> [...] float32 (0 for all-zero TUs).
    qp static (python int): tables are trace-time constants. qp traced
    (scalar or per-block array over the leading batch dims): pass the
    static tuple `qp_set` of possible QP values; the compiled program
    gathers the matching cost-table rows at runtime (GOP QP offsets and
    LCU-level rate control share one compile)."""
    from ..ops.quant import is_static_qp

    n = levels.shape[-1]
    batch = levels.shape[:-2]
    static = is_static_qp(qp)
    if static:
        t = _tables(n, scan_type, is_luma, int(qp), init_type)

        def lk_last(idx):
            return jnp.take(jnp.asarray(t["cost_last"]), idx, axis=0)

        def lk_cg(inc, v):
            return jnp.asarray(t["cost_cg"])[inc, v]

        def lk_sig(pat, k, v):
            return jnp.asarray(t["cost_sig"])[pat, k, v]

        def lk_one(cs, c1, v):
            return jnp.asarray(t["cost_one"])[cs[..., None], c1, v]

        def lk_abs(cs, v):
            return jnp.asarray(t["cost_abs"])[cs, v]
    else:
        assert qp_set is not None, "traced qp requires static qp_set"
        t = _stacked_tables(n, scan_type, is_luma,
                            tuple(int(q) for q in qp_set), init_type)
        qa = jnp.asarray(qp, jnp.int32)
        qi = jnp.asarray(t["qp_idx"])[jnp.clip(qa, 0, 57)]  # [] or batch

        def _q(extra):  # qi broadcast helper: append `extra` axes
            return qi.reshape(qi.shape + (1,) * extra) if qi.ndim else qi

        def lk_last(idx):
            return jnp.asarray(t["cost_last"])[qi, idx]

        def lk_cg(inc, v):
            return jnp.asarray(t["cost_cg"])[_q(1), inc, v]

        def lk_sig(pat, k, v):
            return jnp.asarray(t["cost_sig"])[_q(1), pat, k, v]

        def lk_one(cs, c1, v):
            return jnp.asarray(t["cost_one"])[_q(2), cs[..., None], c1, v]

        def lk_abs(cs, v):
            return jnp.asarray(t["cost_abs"])[_q(1), cs, v]
    ncg = t["ncg"]

    a_r = jnp.abs(levels.reshape(*batch, n * n)).astype(jnp.int32)
    a = jnp.take(a_r, jnp.asarray(t["scan"]), axis=-1)   # scan order
    nz = a > 0
    any_nz = nz.any(-1)

    k_idx = jnp.arange(n * n)
    last_k = jnp.max(jnp.where(nz, k_idx, -1), axis=-1)  # [...]
    last_cg = last_k >> 4

    bits = lk_last(jnp.maximum(last_k, 0))

    acg = a.reshape(*batch, ncg, 16)
    nzcg = acg > 0
    cg_nz = nzcg.any(-1)                                  # [..., ncg]
    subs = jnp.arange(ncg)
    sub_of_k = k_idx >> 4

    # --- coded_sub_block_flag -------------------------------------------
    def nbr_flag(nbr):
        nbr = jnp.asarray(nbr)
        f = jnp.take(cg_nz, jnp.maximum(nbr, 0), axis=-1)
        return jnp.where(nbr >= 0, f, False)

    nz_r = nbr_flag(t["right_sub"])
    nz_l = nbr_flag(t["lower_sub"])
    pattern = nz_r.astype(jnp.int32) + 2 * nz_l.astype(jnp.int32)
    cg_coded = (subs >= 1) & (subs < last_cg[..., None])
    inc = (pattern > 0).astype(jnp.int32)
    bits = bits + jnp.where(
        cg_coded,
        lk_cg(inc, cg_nz.astype(jnp.int32)), 0.0).sum(-1)

    # --- significant_coeff_flag -----------------------------------------
    # effective decoder flag: true significance, subset 0 and last forced 1
    cg_flag = cg_nz | (subs == 0) | (subs == last_cg[..., None])
    i_in_cg = jnp.arange(16)
    nz_above0 = (nzcg & (i_in_cg > 0)).any(-1)            # [..., ncg]
    infer_skip = ((k_idx & 15) == 0) & (sub_of_k != 0) \
        & ~jnp.take(nz_above0 | False, sub_of_k, axis=-1)
    sig_coded = (k_idx < last_k[..., None]) \
        & jnp.take(cg_flag, sub_of_k, axis=-1) & ~infer_skip
    npat = 1 if n == 4 else 4
    pat_of_k = (jnp.take(pattern, sub_of_k, axis=-1) if npat > 1 else
                jnp.zeros((*batch, n * n), jnp.int32))
    bits = bits + jnp.where(
        sig_coded,
        lk_sig(pat_of_k, k_idx, nz.astype(jnp.int32)), 0.0).sum(-1)

    # --- greater1 / greater2 --------------------------------------------
    # coding order within a CG = descending within-CG scan index
    rev = nzcg[..., ::-1]
    rank_rev = jnp.cumsum(rev.astype(jnp.int32), -1) - rev  # exclusive
    rank = rank_rev[..., ::-1]                            # [..., ncg, 16]
    v = acg > 1
    gt1_rev = (v & nzcg)[..., ::-1].astype(jnp.int32)
    cumgt1 = (jnp.cumsum(gt1_rev, -1) - gt1_rev)[..., ::-1]
    c1 = jnp.where(cumgt1 > 0, 0, jnp.minimum(1 + rank, 3))
    coded1 = nzcg & (rank < C1FLAG_NUMBER)

    nnz_cg = nzcg.sum(-1)                                 # [..., ncg]
    gt1_in8 = (v & nzcg & (rank < C1FLAG_NUMBER))
    has_gt1 = gt1_in8.any(-1)                             # [..., ncg]
    n_gt1 = gt1_in8.sum(-1)

    # ctx-set bit 1: previous *coded* (nnz>0) subset had a greater1.
    # Unrolled scan over subsets in coding order (high -> low).
    prev_list = []
    carry = jnp.zeros(batch, bool)
    for s in range(ncg - 1, -1, -1):
        prev_list.append(carry)
        coded_s = nnz_cg[..., s] > 0
        carry = jnp.where(coded_s, has_gt1[..., s], carry)
    prev_gt1 = jnp.stack(prev_list[::-1], axis=-1)        # [..., ncg]

    if is_luma:
        ctx_set = jnp.where(subs > 0, 2, 0) + prev_gt1.astype(jnp.int32)
    else:
        ctx_set = prev_gt1.astype(jnp.int32) * jnp.ones(ncg, jnp.int32)
    bits = bits + jnp.where(
        coded1,
        lk_one(ctx_set, c1, v.astype(jnp.int32)),
        0.0).sum((-2, -1))

    # rank-ordered abs values per CG (rank 0 first; zeros pushed back)
    order = jnp.argsort(jnp.where(nzcg, -i_in_cg - 1, 1), axis=-1)
    ar = jnp.take_along_axis(acg, order, axis=-1)         # [..., ncg, 16]

    # value of the first greater1-coded coefficient (0 if none): the
    # lowest-rank entry of ar[..., :8] that exceeds 1
    vr8 = ar[..., :C1FLAG_NUMBER] > 1
    idx8 = jnp.argmax(vr8, axis=-1)
    first_gt1_val = jnp.where(
        vr8.any(-1),
        jnp.take_along_axis(ar, idx8[..., None], axis=-1)[..., 0], 0)
    gt2v = (first_gt1_val > 2).astype(jnp.int32)
    bits = bits + jnp.where(has_gt1,
                            lk_abs(ctx_set, gt2v), 0.0).sum(-1)

    # --- signs (no sign hiding in our PPS) -------------------------------
    bits = bits + nz.sum(-1).astype(jnp.float32)

    # --- coeff_abs_level_remaining ---------------------------------------
    escape = (nnz_cg > C1FLAG_NUMBER) | (n_gt1 >= 2) | (first_gt1_val > 2)
    rice = jnp.zeros((*batch, ncg), jnp.int32)
    first2 = jnp.ones((*batch, ncg), jnp.int32)
    rem_bits = jnp.zeros((*batch, ncg), jnp.float32)
    for r in range(16):
        val = ar[..., r]
        active = escape & (r < nnz_cg)
        base = (2 + first2) if r < C1FLAG_NUMBER \
            else jnp.ones_like(first2)
        has_rem = active & (val >= base)
        rem_bits = rem_bits + jnp.where(
            has_rem, _golomb_bits(jnp.maximum(val - base, 0), rice), 0.0)
        rice = jnp.where(has_rem & (val > (3 << rice)),
                         jnp.minimum(rice + 1, 4), rice)
        first2 = jnp.where(active & (val >= 2), 0, first2)
    bits = bits + rem_bits.sum(-1)

    return jnp.where(any_nz, bits, 0.0).astype(jnp.float32)
