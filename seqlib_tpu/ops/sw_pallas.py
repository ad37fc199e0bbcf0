"""Pallas TPU kernel for the affine-gap extension DP (v2).

Same contract as ops.sw.extend_batch, but the whole row loop runs
inside one Mosaic kernel with DP state resident in VMEM.

v2 design (the v1 lessons are in git history — v1 kept the batch in
sublanes and did a masked O(LQ) query select per row, landing at
12.5 Gcells/s vs XLA's 17; v2 fixes both):

* TRANSPOSED layout [TW, B]: the batch rides the 128 LANES, the
  target axis rides sublanes.  Selecting query character i is then a
  dynamic SUBLANE index into the [LQ, B] query block — one cheap
  slice per row instead of v1's masked O(LQ) reduction per row
  (which made the whole kernel O(LQ^2)).
* DP state is int32 IN PRACTICE: the design targets int16 (scores of
  bwa-scale extensions fit in int16, and (16, 128) int16 tiles would
  double VPU throughput), but this Mosaic version does not lower
  int16 compares/rotates, so ``i16 = jnp.int32`` below.  Operand
  layout (16-sublane-aligned query blocks) is already int16-shaped so
  the switch is a one-line change when Mosaic supports it.  See
  docs/SW_SPEED_OF_LIGHT.md for the measured-vs-roofline analysis.
* the same-row E dependency uses the running-max trick: one log2(TW)
  shift-max scan per row along sublanes (pltpu.roll axis 0) with the
  step masks hoisted out of the row loop.
* per-column best (score, row) kept as two int16 planes, merged into
  packed int32 once after the loop; cross-column reductions happen
  once.
* optional zdrop (ksw_extend's row-loop break) adds one sublane
  max+argmin reduction per row, matching ops.sw.extend_batch's
  semantics lane-for-lane.

Replaces the inner loop of the reference's ``mem_align1`` extension
stage (ksw_extend, /root/reference/src/BWAAligner.cpp:104-109).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BL = 128          # batch lanes per program
NEG16 = -16384    # -inf surrogate that survives int16 adds


def _roll16(x, shift):
    """Sublane roll (int32 lanes; this Mosaic lowers rotates and
    compares only for 32-bit data, so the DP state is int32)."""
    return pltpu.roll(x, shift=shift, axis=0)


def _extend_kernel(q_ref, ql_ref, t_ref, tl_ref, h0_ref,
                   score_ref, qle_ref, tle_ref, gscore_ref, gtle_ref,
                   *, LQ: int, TW: int, o_del: int, e_del: int,
                   o_ins: int, e_ins: int, match: int, mismatch: int,
                   zdrop: int):
    i16 = jnp.int32    # int16 compares/rotates unsupported by this Mosaic
    tt = t_ref[:].astype(jnp.int32)                # [TW, BL] (row j-1)
    ql = ql_ref[:]                                 # [1, BL] int32
    tl = tl_ref[:]
    h0 = h0_ref[:].astype(i16)

    jt32 = jax.lax.broadcasted_iota(jnp.int32, (TW, BL), 0)
    jt = jt32.astype(i16)
    tmask = jt32 <= tl                             # [TW, BL]
    neg = jnp.full((TW, BL), NEG16, i16)

    # row 0 boundary: H(0,j) = h0 - (o_del + e_del*j); dead cells NEG
    h_row0 = h0 - jnp.int32(o_del) - jnp.int32(e_del) * jt
    h_row0 = jnp.where(h_row0 < 0, neg, h_row0)
    h_row0 = jnp.where(jt32 == 0, h0, h_row0)
    h_row0 = jnp.where(tmask, h_row0, neg)

    # hoisted scan masks: step s valid where j >= s
    n_steps = max(TW - 1, 1).bit_length()
    ecoef = jnp.int32(e_del) * jt

    def row_body(i, qi, st):
        h_prev, f_prev, bscore, brow, g_row, zstate = st
        zbest, zbi, zbj, stopped = zstate
        is_match = (tt == qi) & (tt < 4) & (qi < 4)
        sub = jnp.where(is_match, jnp.int32(match), jnp.int32(-mismatch))
        # M(j) = h_prev(j-1) + sub(j): shift h_prev down one sublane
        h_up = _roll16(h_prev, 1)
        h_up = jnp.where(jt32 >= 1, h_up, neg)
        M = h_up + sub
        F = jnp.maximum(h_prev - jnp.int32(o_ins + e_ins),
                        f_prev - jnp.int32(e_ins))
        hnd = jnp.where(jt32 >= 1, jnp.maximum(M, F), F)
        hnd = jnp.maximum(hnd, neg)
        # E(j) = max_{j'<j}(hnd(j') + e*j') - o - e*j
        g = hnd + ecoef
        s = 1
        for _ in range(n_steps):
            rolled = _roll16(g, s)
            g = jnp.maximum(g, jnp.where(jt32 >= s, rolled, neg))
            s *= 2
        g1 = _roll16(g, 1)
        E = jnp.where(jt32 >= 1, g1, neg) - jnp.int32(o_del) - ecoef
        h = jnp.maximum(hnd, E)
        h = jnp.where(tmask, h, neg)
        act32 = (i < ql) & (stopped == 0)          # [1, BL] bool
        h = jnp.where(act32, h, h_prev)
        f = jnp.where(act32, F, f_prev)
        # per-column running best (strictly greater keeps earliest row)
        hcl = jnp.where(act32 & (jt32 > 0), jnp.maximum(h, -1),
                        jnp.int32(-1))
        better = hcl > bscore
        bscore = jnp.where(better, hcl, bscore)
        brow = jnp.where(better, i, brow)
        g_row = jnp.where(act32 & (i == ql - 1), h, g_row)
        if zdrop > 0:
            m = jnp.max(hcl, axis=0, keepdims=True)          # [1, BL]
            mj = jnp.min(jnp.where(hcl == m, jt32, 0x7FFF),
                         axis=0, keepdims=True)
            m32 = m.astype(jnp.int32)
            better_z = m32 > zbest
            di = i - zbi
            dj = mj - zbj
            gap = jnp.abs(di - dj)
            pen = jnp.where(di > dj, e_del, e_ins) * gap
            zstop = act32 & ~better_z & (zbest - m32 - pen > zdrop)
            stopped = jnp.maximum(
                stopped, (zstop | (act32 & (m32 <= 0))).astype(jnp.int32))
            zbest = jnp.where(act32 & better_z, m32, zbest)
            zbi = jnp.where(act32 & better_z, i, zbi)
            zbj = jnp.where(act32 & better_z, mj, zbj)
        return (h, f, bscore, brow, g_row, (zbest, zbi, zbj, stopped))

    # outer loop over aligned 16-row query blocks (int16 sublane
    # alignment: dynamic loads must start at a tile boundary), inner
    # 16 rows unrolled on the loaded block
    assert LQ % 16 == 0

    def blk_body(ib, st):
        i0 = ib * 16
        qblk = q_ref[pl.ds(pl.multiple_of(i0, 16), 16), :].astype(jnp.int32)
        for k in range(16):
            st = row_body(i0 + k, qblk[k:k + 1, :], st)
        return st

    zero1 = jnp.zeros((1, BL), jnp.int32)
    zinit = (h0_ref[:].astype(jnp.int32), zero1, zero1,
             jnp.zeros((1, BL), jnp.int32))
    init = (h_row0, neg, jnp.full((TW, BL), -1, i16), jnp.zeros((TW, BL),
            i16), neg, zinit)
    h, f, bscore, brow, g_row, _ = jax.lax.fori_loop(
        0, LQ // 16, blk_body, init)

    # one-time packed reductions (int32)
    BIG = jnp.int32(0x7FFFFFFF)
    pack = ((bscore.astype(jnp.int32) + 2) << 12) \
        + (4095 - brow.astype(jnp.int32))
    colmax = jnp.max(pack, axis=0, keepdims=True)            # [1, BL]
    btle = jnp.min(jnp.where(pack == colmax, jt32, BIG), axis=0,
                   keepdims=True)
    score = (colmax >> 12) - 2
    bqle = 4095 - (colmax & 0xFFF) + 1
    found = score > 0
    score_ref[:] = jnp.where(found, score, 0)
    qle_ref[:] = jnp.where(found, bqle, 0)
    tle_ref[:] = jnp.where(found, btle, 0)
    g32 = g_row.astype(jnp.int32)
    gbest = jnp.max(g32, axis=0, keepdims=True)
    gscore_ref[:] = jnp.where(gbest <= NEG16, jnp.int32(-0x40000000),
                              gbest)
    gtle_ref[:] = jnp.min(jnp.where(g32 == gbest, jt32, BIG), axis=0,
                          keepdims=True)


def _extend_kernel_banded(q_ref, ql_ref, t_ref, tl_ref, h0_ref,
                          score_ref, qle_ref, tle_ref, gscore_ref,
                          gtle_ref,
                          *, LQ: int, DW: int, DB: int, W: int,
                          o_del: int, e_del: int, o_ins: int,
                          e_ins: int, match: int, mismatch: int,
                          zdrop: int):
    """Banded extension in RELATIVE-DIAGONAL coordinates (v5).

    DP state planes are indexed by rd = j - R + W (R = DP row, j =
    target column, W = band half-width): the diagonal dependency
    becomes the IDENTITY (no roll), the insertion chain is one
    roll(-1), and every plane has extent DW ~ 2W+2 instead of the
    rectangle's TW — the roll/VMEM traffic per row shrinks by
    DW/TW.  Matches ksw_extend's static band |j - R| <= W exactly
    (ops.sw.extend_batch(band=W) is the pinned XLA twin).

    t_ref: [TB, BL] buffer with row r = target char consumed at
    column j = r - (W + 7) (so a 16-row block's window slice starts
    at the 8-aligned row 16*ib + 8); q_ref as in the rectangle
    kernel.
    """
    i16 = jnp.int32
    ql = ql_ref[:]
    tl = tl_ref[:]
    h0 = h0_ref[:].astype(i16)

    rd32 = jax.lax.broadcasted_iota(jnp.int32, (DW, BL), 0)
    neg = jnp.full((DW, BL), NEG16, i16)
    n_steps = max(DW - 1, 1).bit_length()
    ecoef = jnp.int32(e_del) * rd32

    # row-0 state: H[0][j] at rd = j + W (R = 0)
    j0 = rd32 - W
    h_row0 = h0 - jnp.int32(o_del) - jnp.int32(e_del) * j0
    h_row0 = jnp.where(h_row0 < 0, neg, h_row0)
    h_row0 = jnp.where(j0 == 0, h0, h_row0)
    # strict band applies to row 0 as well: j in [0, W]
    h_row0 = jnp.where((j0 >= 0) & (j0 <= tl) & (j0 <= W), h_row0, neg)

    def row_body(i, qi, tchars, st):
        (h_prev, f_prev, g_rel, zstate) = st
        zbest, zbi, zbj, stopped, best, bi, bj = zstate
        R = i + 1
        jv = rd32 + (R - W)                      # column j of each rd
        mask = (jv >= 0) & (jv <= tl) & (rd32 <= 2 * W)
        is_match = (tchars == qi) & (tchars < 4) & (qi < 4)
        sub = jnp.where(is_match, jnp.int32(match), jnp.int32(-mismatch))
        M = h_prev + sub                          # identity diagonal
        # prev[rd+1] via a cyclic roll by DW-1 (top row masked below)
        h_shift = _roll16(h_prev, DW - 1)
        f_shift = _roll16(f_prev, DW - 1)
        h_shift = jnp.where(rd32 <= DW - 2, h_shift, neg)
        f_shift = jnp.where(rd32 <= DW - 2, f_shift, neg)
        F = jnp.maximum(h_shift - jnp.int32(o_ins + e_ins),
                        f_shift - jnp.int32(e_ins))
        F = jnp.where(mask, F, neg)   # strict band: F dead outside too
        F = jnp.maximum(F, neg)
        hnd = jnp.where(jv >= 1, jnp.maximum(M, F), F)
        hnd = jnp.where(mask, hnd, neg)
        hnd = jnp.maximum(hnd, neg)
        # E scan along rd (e*j and e*rd differ by a per-row constant
        # that cancels between the scan and the final subtraction)
        g = hnd + ecoef
        s = 1
        for _ in range(n_steps):
            rolled = _roll16(g, s)
            g = jnp.maximum(g, jnp.where(rd32 >= s, rolled, neg))
            s *= 2
        g1 = _roll16(g, 1)
        E = jnp.where(rd32 >= 1, g1, neg) - jnp.int32(o_del) - ecoef
        h = jnp.maximum(hnd, E)
        h = jnp.where(mask, h, neg)
        act32 = (i < ql) & (stopped == 0)         # [1, BL]
        h = jnp.where(act32, h, h_prev)
        f = jnp.where(act32, F, f_prev)
        # ONE row reduction serves best-tracking and zdrop
        hcl = jnp.where(act32 & (jv > 0) & mask, jnp.maximum(h, -1),
                        jnp.int32(-1))
        rpack = ((hcl + 2) << 12) + (4095 - rd32)
        colmax = jnp.max(rpack, axis=0, keepdims=True)      # [1, BL]
        m = (colmax >> 12) - 2
        mrd = 4095 - (colmax & 0xFFF)
        mj = mrd + (R - W)
        better = act32 & (m > best)
        best = jnp.where(better, m, best)
        bi = jnp.where(better, i, bi)
        bj = jnp.where(better, mj, bj)
        # g capture (end-of-query row, per lane): elementwise plane
        at_last = act32 & (i == ql - 1)
        g_rel = jnp.where(at_last & mask, h, g_rel)
        if zdrop > 0:
            better_z = m > zbest
            di = i - zbi
            dj = mj - zbj
            gap = jnp.abs(di - dj)
            pen = jnp.where(di > dj, e_del, e_ins) * gap
            zstop = act32 & ~better_z & (zbest - m - pen > zdrop)
            stopped = jnp.maximum(
                stopped, (zstop | (act32 & (m <= 0))).astype(jnp.int32))
            zbest = jnp.where(act32 & better_z, m, zbest)
            zbi = jnp.where(act32 & better_z, i, zbi)
            zbj = jnp.where(act32 & better_z, mj, zbj)
        return (h, f, g_rel,
                (zbest, zbi, zbj, stopped, best, bi, bj))

    assert LQ % 16 == 0

    def blk_body(ib, st):
        i0 = ib * 16
        qblk = q_ref[pl.ds(pl.multiple_of(i0, 16), 16), :].astype(jnp.int32)
        tblk = t_ref[pl.ds(pl.multiple_of(i0 + 8, 8), DB), :] \
            .astype(jnp.int32)
        for k in range(16):
            # char consumed at column j = R - W + rd sits at buffer row
            # j + W + 7 = (16*ib + 8) + (k + rd): within-slice k + rd
            st = row_body(i0 + k, qblk[k:k + 1, :],
                          jax.lax.slice_in_dim(tblk, k, k + DW, axis=0),
                          st)
        return st

    zero1 = jnp.zeros((1, BL), jnp.int32)
    zinit = (h0_ref[:].astype(jnp.int32), zero1, zero1,
             jnp.zeros((1, BL), jnp.int32),
             jnp.zeros((1, BL), jnp.int32), zero1, zero1)
    init = (h_row0, neg, neg, zinit)
    h, f, g_rel, zfin = jax.lax.fori_loop(0, LQ // 16, blk_body, init)
    _, _, _, _, best, bi, bj = zfin

    found = best > 0
    score_ref[:] = jnp.where(found, best, 0)
    qle_ref[:] = jnp.where(found, bi + 1, 0)
    tle_ref[:] = jnp.where(found, bj, 0)
    # g planes -> (value, min-rd) in one packed reduction; j = ql-W+rd
    BIG = jnp.int32(0x7FFFFFFF)
    gpack = ((g_rel + 32768) << 12) + (4095 - rd32)
    gmax = jnp.max(gpack, axis=0, keepdims=True)
    gval = (gmax >> 12) - 32768
    grd = 4095 - (gmax & 0xFFF)
    found_g = gval > NEG16
    gscore_ref[:] = jnp.where(found_g, gval, jnp.int32(-0x40000000))
    gtle_ref[:] = jnp.where(found_g, grd + (ql - W), 0)


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins",
                                             "e_ins", "match", "mismatch",
                                             "zdrop", "band", "interpret"))
def extend_batch_pallas_banded(query, qlen, target, tlen, h0,
                               o_del: int = 6, e_del: int = 1,
                               o_ins: int = 6, e_ins: int = 1,
                               match: int = 1, mismatch: int = 4,
                               zdrop: int = 0, band: int = 100,
                               interpret: bool = False):
    """Banded Pallas extension: drop-in for
    ``ops.sw.extend_batch(band=band)`` (bit-identical outputs)."""
    assert band > 0
    B, LQ0 = query.shape
    _, LT = target.shape
    W = band
    DW = ((2 * W + 2 + 7) // 8) * 8
    LQ = ((LQ0 + 15) // 16) * 16
    DB = DW + 16                      # block slice: 16 rows of windows
    # buffer rows: last slice reaches LQ - 8 + DB; target chars occupy
    # rows [W + 8, W + 8 + LT)
    TB = ((max(LQ + DB - 8, W + 8 + LT) + 7) // 8) * 8
    Bp = ((B + BL - 1) // BL) * BL
    qp = jnp.full((LQ, Bp), 4, jnp.int16).at[:LQ0, :B].set(
        query.astype(jnp.int16).T)
    # tb[r] = char consumed at column j = r - (W + 7)
    tp = jnp.full((TB, Bp), 4, jnp.int16).at[W + 8:W + 8 + LT, :B].set(
        target.astype(jnp.int16).T)
    qlp = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(
        qlen.astype(jnp.int32))
    tlp = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(
        tlen.astype(jnp.int32))
    h0p = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(
        h0.astype(jnp.int32))

    kern = functools.partial(
        _extend_kernel_banded, LQ=LQ, DW=DW, DB=DB, W=W,
        o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins,
        match=match, mismatch=mismatch, zdrop=zdrop)
    grid = (Bp // BL,)

    def bspec(rows, dt):
        return pl.BlockSpec((rows, BL), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bspec(LQ, jnp.int16), bspec(1, jnp.int32),
                  bspec(TB, jnp.int16), bspec(1, jnp.int32),
                  bspec(1, jnp.int32)],
        out_specs=[bspec(1, jnp.int32)] * 5,
        out_shape=[jax.ShapeDtypeStruct((1, Bp), jnp.int32)] * 5,
        interpret=interpret,
    )(qp, qlp, tp, tlp, h0p)
    score, qle, tle, gscore, gtle = [o[0, :B] for o in out]
    return dict(score=score, qle=qle, tle=tle, gscore=gscore, gtle=gtle)


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins",
                                             "e_ins", "match", "mismatch",
                                             "zdrop", "band", "w1",
                                             "rerun_cap", "interpret"))
def extend_batch_adaptive(query, qlen, target, tlen, h0,
                          o_del: int = 6, e_del: int = 1,
                          o_ins: int = 6, e_ins: int = 1,
                          match: int = 1, mismatch: int = 4,
                          zdrop: int = 0, band: int = 100,
                          w1: int = 32, rerun_cap: int = 256,
                          interpret: bool = False):
    """Adaptive-band extension: bit-equal to ``extend_batch(band=band)``
    at a fraction of the computed cells (ksw_extend's band-trimming
    idea mapped to a lockstep batch).

    Pass 1 runs the narrow band ``w1``.  A lane is PROVABLY
    band-invariant when its pass-1 score exceeds the upper bound of
    any path that leaves the narrow band:

        UB = h0 + match*qlen - min(o_del + e_del*(w1+1),
                                   o_ins + e_ins*(w1+1))

    (leaving the band needs a net gap > w1, whose cheapest affine cost
    is one gap of length w1+1; every path scores at most h0 +
    match*qlen before gap penalties).  ``score > UB`` strictly rules
    out both better AND equal-scoring out-of-band paths, so score,
    qle, tle are exact; the same test on gscore pins gscore/gtle.
    Empty lanes (qlen == 0) are trivially exact.

    Failing lanes are COMPACTED (up to ``rerun_cap``) into a narrow
    second pass at the full band; if more than rerun_cap lanes fail,
    the whole batch reruns at the full band (lax.cond — only the
    taken branch executes).
    """
    if band <= w1:
        return extend_batch_pallas_banded(
            query, qlen, target, tlen, h0, o_del=o_del, e_del=e_del,
            o_ins=o_ins, e_ins=e_ins, match=match, mismatch=mismatch,
            zdrop=zdrop, band=band, interpret=interpret)
    kw = dict(o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins,
              match=match, mismatch=mismatch, zdrop=zdrop,
              interpret=interpret)
    r1 = extend_batch_pallas_banded(query, qlen, target, tlen, h0,
                                    band=w1, **kw)
    gap_pen = min(o_del + e_del * (w1 + 1), o_ins + e_ins * (w1 + 1))
    ub = h0.astype(jnp.int32) + match * qlen.astype(jnp.int32) - gap_pen
    ok = ((r1["score"] > ub) & (r1["gscore"] > ub)) | (qlen == 0)
    B = query.shape[0]
    n_bad = jnp.sum((~ok).astype(jnp.int32))

    def rerun_compact(_):
        K = min(rerun_cap, B)
        dst = jnp.cumsum((~ok).astype(jnp.int32)) - 1
        sel = (~ok) & (dst < K)
        scat = jnp.where(sel, dst, K)
        idx = jnp.zeros(K, jnp.int32).at[scat].set(
            jnp.arange(B, dtype=jnp.int32), mode="drop")
        r2 = extend_batch_pallas_banded(
            query[idx], qlen[idx], target[idx], tlen[idx], h0[idx],
            band=band, **kw)
        out = {}
        for k in r1:
            upd = jnp.asarray(r1[k]).at[idx].set(r2[k])
            out[k] = jnp.where(ok, r1[k], upd)
        return out

    def rerun_full(_):
        return extend_batch_pallas_banded(query, qlen, target, tlen,
                                          h0, band=band, **kw)

    def keep(_):
        return {k: jnp.asarray(v) for k, v in r1.items()}

    return jax.lax.cond(
        n_bad == 0, keep,
        lambda _: jax.lax.cond(n_bad <= min(rerun_cap, B),
                               rerun_compact, rerun_full, None),
        None)


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins",
                                             "e_ins", "match", "mismatch",
                                             "zdrop", "interpret"))
def extend_batch_pallas(query, qlen, target, tlen, h0,
                        o_del: int = 6, e_del: int = 1,
                        o_ins: int = 6, e_ins: int = 1,
                        match: int = 1, mismatch: int = 4,
                        zdrop: int = 0,
                        interpret: bool = False):
    """Pallas drop-in for ops.sw.extend_batch (same outputs)."""
    B, LQ0 = query.shape
    _, LT = target.shape
    TW = ((LT + 1 + 7) // 8) * 8           # sublane axis: mult of 8
    LQ = ((LQ0 + 15) // 16) * 16           # aligned query blocks
    Bp = ((B + BL - 1) // BL) * BL
    # transposed operands: [LQ, B] query, [TW, B] target (row j = base
    # j-1 so DP column j matches), pads hold 4 (N)
    qp = jnp.full((LQ, Bp), 4, jnp.int16).at[:LQ0, :B].set(
        query.astype(jnp.int16).T)
    tp = jnp.full((TW, Bp), 4, jnp.int16).at[1:LT + 1, :B].set(
        target.astype(jnp.int16).T)
    qlp = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(
        qlen.astype(jnp.int32))
    tlp = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(
        tlen.astype(jnp.int32))
    h0p = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(
        h0.astype(jnp.int32))

    kern = functools.partial(
        _extend_kernel, LQ=LQ, TW=TW, o_del=o_del, e_del=e_del,
        o_ins=o_ins, e_ins=e_ins, match=match, mismatch=mismatch,
        zdrop=zdrop)
    grid = (Bp // BL,)

    def bspec(rows, dt):
        return pl.BlockSpec((rows, BL), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bspec(LQ, jnp.int16), bspec(1, jnp.int32),
                  bspec(TW, jnp.int16), bspec(1, jnp.int32),
                  bspec(1, jnp.int32)],
        out_specs=[bspec(1, jnp.int32)] * 5,
        out_shape=[jax.ShapeDtypeStruct((1, Bp), jnp.int32)] * 5,
        interpret=interpret,
    )(qp, qlp, tp, tlp, h0p)
    score, qle, tle, gscore, gtle = [o[0, :B] for o in out]
    return dict(score=score, qle=qle, tle=tle, gscore=gscore, gtle=gtle)
