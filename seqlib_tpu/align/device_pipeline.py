"""Fused device stages of the alignment pipeline.

Each batch makes exactly TWO device round-trips (the axon/PCIe/ICI
link latency dominates per-call cost, so stages are fused jits):

1. ``seed_chain_extend`` — lockstep seed scan + sampled-SA lookup +
   on-device chaining (lexsort + segmented reductions + top-k) +
   left/right affine extension of every chain anchor, including bwa's
   soft-clip decisions, window gathers from the device-resident 2L
   text, and strand-boundary clamping.  Only [B, C] chain results
   cross the link.
2. ``global_and_traceback`` — banded global DP for each final region
   plus an on-device traceback walk that emits per-step op codes and
   NM counts (the [M, Lq, Lt] direction matrix never leaves HBM).

``seed_and_locate`` / ``extend_chains`` / ``chain_device`` remain
callable standalone (tests, parity checks vs the host chainer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.fm import DeviceFMIndex, collect_seeds, sa_lookup
from ..ops.sw import (BIT_EEXT, BIT_FEXT, BIT_MIS, DIR_E, DIR_M, NEG,
                      extend_batch, global_batch)


def _extend_impl():
    """Production extension kernel: the adaptive-band Pallas kernel on
    TPU (narrow first pass + provably-safe acceptance + full-band
    rerun of the rest — ops/sw_pallas.extend_batch_adaptive, bit-equal
    to the banded XLA loop), banded XLA elsewhere (Pallas on CPU would
    run interpreted).  Both sides compute ksw_extend's static band
    |j - R| <= w (the reference passes mem_opt_t.w = 100,
    /root/reference/src/BWAAligner.cpp:75-80) — the pre-r5 kernels
    computed the full rectangle, a superset bwa itself never scores."""
    import jax
    if jax.default_backend() != "cpu":
        from ..ops.sw_pallas import extend_batch_adaptive
        return extend_batch_adaptive
    return extend_batch

OP_M, OP_D, OP_I, OP_NONE = 0, 1, 2, 3

# per-seed second-extension slots appended to the max_chains region
# slots (mem_chain2aln's seed loop, distinct-query-start candidates)
ESC_SLOTS = 3


def dp_rows(B: int) -> int:
    """Compacted DP-row budget for a batch of B reads.  Measured on
    the canonical wgsim 150 bp workload: ~56% of chains are
    non-trivial at the extension stage (1151/2048) and ~50% of live
    regions need a global-DP row (1016/2048) — so 3B/4 compacts both
    stages with ~1.3x margin.  (B//2 was tried and OVERFLOWED on this
    exact workload, silently routing every batch to the classic-path
    fallback at ~2.5x the cost — see stats['fused_overflow_fallback']
    and tests/test_aligner.py::test_dp_slot_overflow_fallback.)
    Overflow is flagged to the host fallback paths, never dropped."""
    return max(3 * B // 4, 64)


@functools.partial(jax.jit, static_argnames=("max_seeds", "min_seed_len",
                                             "max_occ", "k_occ",
                                             "split_len", "split_width",
                                             "max_mem_intv", "p3_seeds"))
def seed_and_locate(fm: DeviceFMIndex, reads, lens,
                    max_seeds: int = 16, min_seed_len: int = 19,
                    max_occ: int = 500, k_occ: int = 16,
                    split_len: int = 28, split_width: int = 10,
                    max_mem_intv: int = 20, p3_seeds: int = 8):
    """Seed scan (all 3 bwa passes) + SA locate in one dispatch.

    Passes: (1) bidirectional SMEMs, (2) re-seeding of the longest
    near-unique seed (split_factor rule; one extra seed column), (3)
    bwt_seed_strategy1 low-occurrence tiling seeds (max_mem_intv;
    p3_seeds extra columns; 0 disables).  Returns seeds dict + ``pos``
    [B, S+1+p3, K] text positions (-1 invalid) + ``rep_cov`` [B] query
    bases covered by over-max_occ seeds (for frac_rep in the MAPQ
    formula).
    """
    from ..ops.fm import smem_collect, smem_reseed
    B = reads.shape[0]
    seeds = smem_collect(fm, reads, lens, max_seeds=max_seeds,
                         min_seed_len=min_seed_len,
                         p3_seeds=p3_seeds if max_mem_intv > 0 else 0,
                         p3_max_intv=max_mem_intv)
    n, sz, il = seeds["n_seeds"], seeds["intv_sz"], seeds["intv_l"]
    qb_s, qe_s = seeds["qbeg"], seeds["qend"]
    s_idx = jnp.arange(max_seeds)[None, :]
    in_range = s_idx < n[:, None]
    repetitive = in_range & (sz > max_occ)
    seed_valid = in_range & (sz > 0) & (sz <= max_occ)

    # re-seed the longest qualifying seed per read (split_factor rule)
    seed_len = qe_s - qb_s
    qualifies = seed_valid & (seed_len >= split_len) & (sz <= split_width)
    pick = jnp.argmax(jnp.where(qualifies, seed_len, -1), axis=1)
    bidx = jnp.arange(B)
    r_active = qualifies[bidx, pick]
    r_qb, r_qe, r_il, r_sz = smem_reseed(
        fm, reads, lens, qb_s[bidx, pick], qe_s[bidx, pick],
        sz[bidx, pick], r_active, min_seed_len=min_seed_len)

    # append the re-seed as an extra seed column
    qb_all = jnp.concatenate([qb_s, r_qb[:, None]], axis=1)
    qe_all = jnp.concatenate([qe_s, r_qe[:, None]], axis=1)
    sz_all = jnp.concatenate([sz, r_sz[:, None]], axis=1)
    il_all = jnp.concatenate([il, r_il[:, None]], axis=1)
    valid_all = jnp.concatenate(
        [seed_valid, ((r_sz > 0) & (r_sz <= max_occ))[:, None]], axis=1)

    # pass 3: low-occurrence tiling seeds (bwt_seed_strategy1),
    # computed INSIDE smem_collect's while loop (fused lanes — the two
    # scans share steps and gathers; a separate machine cost ~30 ms a
    # batch in-program)
    if max_mem_intv > 0 and p3_seeds > 0:
        p3_valid = (jnp.arange(p3_seeds)[None, :] < seeds["p3_n"][:, None]) \
            & (seeds["p3_intv_sz"] > 0) & (seeds["p3_intv_sz"] <= max_occ)
        qb_all = jnp.concatenate([qb_all, seeds["p3_qbeg"]], axis=1)
        qe_all = jnp.concatenate([qe_all, seeds["p3_qend"]], axis=1)
        sz_all = jnp.concatenate([sz_all, seeds["p3_intv_sz"]], axis=1)
        il_all = jnp.concatenate([il_all, seeds["p3_intv_l"]], axis=1)
        valid_all = jnp.concatenate([valid_all, p3_valid], axis=1)

    S1 = valid_all.shape[1]
    k_take = jnp.minimum(sz_all, k_occ)
    ranks = il_all[:, :, None] + jnp.arange(k_occ)[None, None, :]
    occ_valid = valid_all[:, :, None] \
        & (jnp.arange(k_occ)[None, None, :] < k_take[:, :, None])
    ranks = jnp.where(occ_valid, ranks, -1).astype(jnp.int32)
    # compact valid ranks before the SA walk: the [B, S1, K] grid is
    # ~99% padding at typical seed counts (mean ~1.6 seeds x 1-2
    # occurrences vs S1*K = 272 slots) and sa_lookup's gathers are
    # element-cost-bound on TPU.  Budget 8 locates/read on average;
    # overflow falls back to the full uncompacted walk (lax.cond: only
    # the taken branch runs).
    flat = ranks.reshape(-1)
    N = flat.shape[0]
    Mc = 12 * B   # budget grew with the pass-3 seed columns
    val = flat >= 0
    dst = jnp.cumsum(val.astype(jnp.int32)) - 1
    n_val = jnp.sum(val.astype(jnp.int32))
    ok = val & (dst < Mc)
    scat = jnp.where(ok, dst, Mc)
    buf = jnp.full(Mc, -1, jnp.int32).at[scat].set(flat, mode="drop")
    isrc = jnp.full(Mc, N, jnp.int32).at[scat].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop")

    def locate_compact(_):
        ps = sa_lookup(fm, buf)
        return jnp.full(N, -1, jnp.int32).at[isrc].set(ps, mode="drop")

    def locate_full(_):
        return sa_lookup(fm, flat)

    pos = jax.lax.cond(n_val <= Mc, locate_compact, locate_full,
                       operand=None).reshape(B, S1, k_occ)
    rep_cov = jnp.sum(jnp.where(repetitive, qe_s - qb_s, 0), axis=1)
    # truncation telemetry (VERDICT: no silent caps): occurrences per
    # seed beyond k_occ, and reads whose seed scan saturated max_seeds
    occ_clip = jnp.sum(jnp.where(valid_all,
                                 jnp.maximum(sz_all - k_occ, 0), 0),
                       axis=1)
    # exact truncation telemetry: SMEMs that passed the length filter
    # but found every one of the max_seeds slots taken
    seeds_full = (seeds["n_dropped"] > 0).astype(jnp.int32)
    # only what the host chaining needs crosses the link
    return dict(qbeg=qb_all, qend=qe_all, pos=pos, rep_cov=rep_cov,
                occ_clip=occ_clip, seeds_full=seeds_full)


def chain_device(qb_all, qe_all, pos, l_pac: int, band: int = 100,
                 max_chain_gap: int = 10000, drop_ratio: float = 0.5,
                 max_chains: int = 4, min_chain_weight: int = 0,
                 max_chain_extend: int = 1 << 30):
    """Device-side seed chaining (mem_chain equivalent; mirrors
    align.chain.chain_batch exactly — see its docstring for the
    algorithm and /root/reference/src/BWAAligner.cpp:104-109 for the
    reference call site).

    qb_all/qe_all [B, S] seed query spans; pos [B, S, K] occurrence
    text positions in 2L space (-1 invalid).  Groups occurrences into
    colinear chains by (strand, diagonal-within-band, proximity) using
    a 3-pass stable lexsort + segmented scatter reductions, scores by
    bounded coverage, and keeps each read's top chains per bwa's
    drop_ratio rule.

    Returns per-chain [B, C] arrays: anchor_q, anchor_len, anchor_r,
    weight, keep (bool).  Requires reads shorter than 1024 bp (packed
    anchor sort keys) and S*K <= 512.
    """
    B, S, K = pos.shape
    N = S * K
    oqb = jnp.broadcast_to(qb_all[:, :, None], (B, S, K)).reshape(B, N)
    oqe = jnp.broadcast_to(qe_all[:, :, None], (B, S, K)).reshape(B, N)
    opos = pos.reshape(B, N).astype(jnp.int32)
    olen = (oqe - oqb).astype(jnp.int32)
    # valid: located, and not spanning the fwd/rev midpoint
    ovalid = (opos >= 0) & ~((opos < l_pac) & (opos + olen > l_pac))
    strand = jnp.where(ovalid, (opos >= l_pac).astype(jnp.int32), 3)
    diag = jnp.where(ovalid, opos - oqb.astype(jnp.int32), 0)
    spos = jnp.where(ovalid, opos, jnp.int32(2**30))

    # ONE stable lexicographic sort carrying the payload directly
    # (lax.sort with num_keys; the previous 2-3 argsort+gather rounds
    # were the chain stage's hot spot on TPU)
    pl = (oqb.astype(jnp.int32) << 16) | olen
    if 2 * l_pac + 1024 < 2**29:
        key2 = (strand << 29) | jnp.where(ovalid, diag + 1024, 0)
        k2s, s_pos, s_pl = jax.lax.sort(
            (key2, spos, pl), dimension=1, num_keys=2, is_stable=True)
        s_strand = k2s >> 29
        s_diag = (k2s & (2**29 - 1)) - 1024
        s_valid = s_strand != 3
    else:
        s_strand, s_diag, s_pos, s_pl = jax.lax.sort(
            (strand, diag, spos, pl), dimension=1, num_keys=3,
            is_stable=True)
        s_valid = s_strand != 3
    s_qb = s_pl >> 16
    s_len = s_pl & 0xffff

    brk = jnp.ones((B, N), dtype=bool)
    brk = brk.at[:, 1:].set(
        (s_strand[:, 1:] != s_strand[:, :-1])
        | (s_diag[:, 1:] - s_diag[:, :-1] > band)
        | (s_pos[:, 1:] - s_pos[:, :-1] > max_chain_gap))
    # segments are contiguous in sort order, so all per-segment
    # aggregates come from ONE segmented associative_scan (log-depth,
    # no scatters — TPU scatter is serial-ish and was the hot spot)
    BIG = jnp.int32(2**30)
    n_idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :],
                             (B, N))
    vlen = jnp.where(s_valid, s_len, 0)
    qbv = jnp.where(s_valid, s_qb, BIG)
    qev = jnp.where(s_valid, s_qb + s_len, -1)
    rbv = jnp.where(s_valid, s_pos, BIG)
    rev = jnp.where(s_valid, s_pos + s_len, -1)
    # anchor = longest seed (ties: smallest qb, then first in sort
    # order) — packed so one max carries the whole tuple
    aval = jnp.where(
        s_valid, (s_len << 19) | ((1023 - s_qb) << 9) | (511 - n_idx),
        -1)

    # manual Hillis-Steele segmented scan: log2(N) unrolled steps of
    # pure elementwise shift+select (associative_scan's Blelchoch
    # lowering was ~100 ms here; this is HBM-bandwidth bound)
    def shr(x, d, fill):
        return jnp.concatenate(
            [jnp.full((B, d), fill, x.dtype), x[:, :-d]], axis=1)

    f = brk
    len_sum, qb_min, qe_max = vlen, qbv, qev
    rb_min, re_max, anchor = rbv, rev, aval
    d = 1
    while d < N:
        nf = ~f
        len_sum = jnp.where(nf, shr(len_sum, d, 0) + len_sum, len_sum)
        qb_min = jnp.where(nf, jnp.minimum(shr(qb_min, d, BIG), qb_min),
                           qb_min)
        qe_max = jnp.where(nf, jnp.maximum(shr(qe_max, d, -1), qe_max),
                           qe_max)
        rb_min = jnp.where(nf, jnp.minimum(shr(rb_min, d, BIG), rb_min),
                           rb_min)
        re_max = jnp.where(nf, jnp.maximum(shr(re_max, d, -1), re_max),
                           re_max)
        anchor = jnp.where(nf, jnp.maximum(shr(anchor, d, -1), anchor),
                           anchor)
        f = f | shr(f, d, True)
        d *= 2
    is_last = jnp.concatenate(
        [brk[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    weight = jnp.minimum(len_sum,
                         jnp.minimum(qe_max - qb_min, re_max - rb_min))
    # a segment counts only at its last element, and only if it holds
    # at least one valid occurrence (anchor >= 0)
    weight = jnp.where(is_last & (anchor >= 0), weight, -1)

    # per-read top-C by (weight desc, segment order asc); last-element
    # index is monotone in segment index, so it is the tiebreaker
    n_seg = jnp.sum((weight >= 0).astype(jnp.int32), axis=1)     # [B]
    pk = jnp.where(weight >= 0, weight * 512 + (511 - n_idx), -1)
    _, top = jax.lax.top_k(pk, max_chains)                       # [B, C]
    w_c = jnp.take_along_axis(weight, top, axis=1)               # [B, C]
    best_w = w_c[:, :1]
    keep = (w_c > 0) & (w_c.astype(jnp.float32)
                        >= drop_ratio * best_w.astype(jnp.float32))
    # mem_chain_flt's remaining knobs: drop chains below
    # min_chain_weight, and extend at most max_chain_extend chains
    # (w_c is already weight-descending, so a positional cap is the
    # weight-order cap)
    if min_chain_weight > 0:
        keep = keep & (w_c >= min_chain_weight)
    if max_chain_extend < max_chains:
        keep = keep & (jnp.arange(max_chains)[None, :]
                       < max_chain_extend)
    packed = jnp.take_along_axis(anchor, top, axis=1)
    a_len = packed >> 19
    a_qb = 1023 - ((packed >> 9) & 1023)
    a_n = 511 - (packed & 511)
    a_pos = jnp.take_along_axis(s_pos, a_n, axis=1)
    return dict(anchor_q=jnp.where(keep, a_qb, 0),
                anchor_len=jnp.where(keep, a_len, 0),
                anchor_r=jnp.where(keep, a_pos, 0),
                weight=jnp.where(keep, w_c, 0), keep=keep,
                n_seg=n_seg)


@functools.partial(jax.jit, static_argnames=(
    "l_pac", "max_seeds", "min_seed_len", "max_occ", "k_occ",
    "band", "max_chain_gap", "drop_ratio", "max_chains",
    "o_del", "e_del", "o_ins", "e_ins", "match", "mismatch",
    "pen_clip5", "pen_clip3", "w", "zdrop",
    "split_len", "split_width", "min_chain_weight",
    "max_chain_extend", "max_mem_intv"))
def seed_chain_extend(fm: DeviceFMIndex, text, reads, lens,
                      l_pac: int,
                      max_seeds: int = 16, min_seed_len: int = 19,
                      max_occ: int = 500, k_occ: int = 16,
                      band: int = 100, max_chain_gap: int = 10000,
                      drop_ratio: float = 0.5, max_chains: int = 4,
                      o_del: int = 6, e_del: int = 1, o_ins: int = 6,
                      e_ins: int = 1, match: int = 1, mismatch: int = 4,
                      pen_clip5: int = 5, pen_clip3: int = 5,
                      w: int = 100, zdrop: int = 0,
                      split_len: int = 28, split_width: int = 10,
                      min_chain_weight: int = 0,
                      max_chain_extend: int = 1 << 30,
                      max_mem_intv: int = 20):
    """Fully fused stage 1+2: seed scan + SA locate + chaining +
    left/right extension in ONE device dispatch.

    Replaces the seed_and_locate → host chain_batch → extend_chains
    sequence (two link round trips and a [B,S,K] position fetch) with
    a single dispatch whose output is just [B, C] chain/region arrays.

    Returns dict: qb, qe, rb, re, score, weight [B, C] int32;
    keep [B, C] bool; rep_cov [B] int32.
    """
    B, L = reads.shape
    s1 = seed_and_locate(fm, reads, lens, max_seeds=max_seeds,
                         min_seed_len=min_seed_len, max_occ=max_occ,
                         k_occ=k_occ, split_len=split_len,
                         split_width=split_width,
                         max_mem_intv=max_mem_intv)
    ch = chain_device(s1["qbeg"], s1["qend"], s1["pos"], l_pac,
                      band=band, max_chain_gap=max_chain_gap,
                      drop_ratio=drop_ratio, max_chains=max_chains,
                      min_chain_weight=min_chain_weight,
                      max_chain_extend=max_chain_extend)
    C = max_chains
    keep = ch["keep"]
    aq, alen, ar = ch["anchor_q"], ch["anchor_len"], ch["anchor_r"]

    # DP compaction: a chain whose anchor covers the whole read is
    # 'trivial' — extend_chains' no_left/no_right branches return
    # exactly (qb=aq, qe=aq+alen, rb=ar, re=ar+alen, score=alen*match)
    # for it, so it needs no DP row.  At wgsim-like error rates that is
    # the majority; compacting the rest into M2=B rows cuts the
    # extension batch ~4x.  n_dp > M2 overflow (pathological inputs) is
    # reported for the host to re-extend uncompacted.
    rlen2 = lens.astype(jnp.int32)[:, None]
    trivial = keep & (aq == 0) & (alen == rlen2)
    need = (keep & ~trivial).reshape(-1)                  # [B*C]
    dest = jnp.cumsum(need.astype(jnp.int32)) - 1
    n_dp = jnp.sum(need.astype(jnp.int32)).reshape(1)
    M2 = dp_rows(B)
    ok = need & (dest < M2)
    scat = jnp.where(ok, dest, M2)                        # M2 = dropped
    src_b = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, C)).reshape(-1)
    cb = jnp.full(M2, -1, jnp.int32).at[scat].set(
        src_b, mode="drop")
    caq = jnp.zeros(M2, jnp.int32).at[scat].set(
        aq.reshape(-1), mode="drop")
    calen = jnp.zeros(M2, jnp.int32).at[scat].set(
        alen.reshape(-1), mode="drop")
    car = jnp.zeros(M2, jnp.int32).at[scat].set(
        ar.reshape(-1), mode="drop")
    dqb, dqe, drb, dre, dscore = extend_chains(
        text, reads, lens, cb, caq, calen, car, l_pac=l_pac,
        o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins,
        match=match, mismatch=mismatch,
        pen_clip5=pen_clip5, pen_clip3=pen_clip3, w=w, zdrop=zdrop)

    gidx = jnp.clip(dest, 0, M2 - 1).reshape(B, C)
    okg = ok.reshape(B, C)

    def pick(dp, triv_val):
        return jnp.where(trivial, triv_val,
                         jnp.where(okg, dp[gidx.reshape(-1)].reshape(B, C),
                                   0)).astype(jnp.int32)

    qb = pick(dqb, aq)
    qe = pick(dqe, aq + alen)
    rb = pick(drb, ar)
    re = pick(dre, ar + alen)
    score = pick(dscore, alen * match)

    # ---- mem_chain2aln's per-seed loop (second extension): bwa
    # extends EVERY seed of a chain that is not contained in an
    # already-produced region (the containment `continue`).  Fixed
    # shape approximation: ONE extra extension per read, from the
    # longest located occurrence that (a) belongs to the best
    # region's merged chain (diagonal within band, same strand
    # half) and (b) escapes that region's query x ref span.  Reads
    # with further escapees are counted in esc_over, never silent.
    bsel = jnp.argmax(jnp.where(keep, score, -1), axis=1)
    def col(x):
        return jnp.take_along_axis(x, bsel[:, None], axis=1)[:, 0]
    qb1, qe1 = col(qb), col(qe)
    rb1, re1 = col(rb), col(re)
    diag1 = col(ar) - col(aq)
    has_best = jnp.any(keep & (score > 0), axis=1)
    qbs, qes = s1["qbeg"], s1["qend"]
    posg = s1["pos"]
    S1k = posg.shape[1] * posg.shape[2]
    olen3 = (qes - qbs)[:, :, None]
    same_half = (posg >= l_pac) == (rb1[:, None, None] >= l_pac)
    candv = (posg >= 0) & (olen3 > 0) & same_half \
        & (jnp.abs((posg - qbs[:, :, None])
                   - diag1[:, None, None]) <= w) \
        & ~((posg < l_pac) & (posg + olen3 > l_pac))
    contained = (qbs[:, :, None] >= qb1[:, None, None]) \
        & (qes[:, :, None] <= qe1[:, None, None]) \
        & (posg >= rb1[:, None, None]) \
        & (posg + olen3 <= re1[:, None, None])
    esc = candv & ~contained & has_best[:, None, None]
    escf = esc.reshape(B, S1k)
    olenf = jnp.broadcast_to(olen3, posg.shape).reshape(B, S1k)
    qbf = jnp.broadcast_to(qbs[:, :, None], posg.shape).reshape(B, S1k)
    posf = posg.reshape(B, S1k)
    pkf = jnp.where(escf, (olenf << 10) | (1023 - qbf), 0)
    # top-E candidates with DISTINCT query starts (a tandem read's
    # escaped copies of ONE seed share qb; the seed that rescues the
    # optimum is usually a different query piece)
    E = ESC_SLOTS
    cand_has, cand_aq, cand_alen, cand_ar = [], [], [], []
    pk_cur = pkf
    for _ in range(E):
        jx = jnp.argmax(pk_cur, axis=1)
        val = jnp.take_along_axis(pk_cur, jx[:, None], 1)[:, 0]
        h_e = val > 0
        aq_e = jnp.take_along_axis(qbf, jx[:, None], 1)[:, 0]
        cand_has.append(h_e)
        cand_aq.append(jnp.where(h_e, aq_e, 0))
        cand_alen.append(jnp.where(
            h_e, jnp.take_along_axis(olenf, jx[:, None], 1)[:, 0], 0))
        cand_ar.append(jnp.where(
            h_e, jnp.take_along_axis(posf, jx[:, None], 1)[:, 0], 0))
        pk_cur = jnp.where(qbf == aq_e[:, None], 0, pk_cur)
    left_over = jnp.any(pk_cur > 0, axis=1)
    hasx = jnp.stack(cand_has, axis=1)            # [B, E]
    x_aq = jnp.stack(cand_aq, axis=1)
    x_alen = jnp.stack(cand_alen, axis=1)
    x_ar = jnp.stack(cand_ar, axis=1)
    hf = hasx.reshape(-1)
    dstx = jnp.cumsum(hf.astype(jnp.int32)) - 1
    n_hf = jnp.sum(hf.astype(jnp.int32))
    src_be = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, E)).reshape(-1)
    # TIERED second extension: typical batches see a handful of
    # escapees (5/2048 measured on wgsim), so a small compacted pass
    # (B/16 rows) handles them at ~zero cost; only adversarial repeat
    # batches trigger the big pass.  Both run under conds, so a
    # clean batch skips extension entirely.
    M3a = max(B // 16, 64)
    M3b = max(B, 64)
    use_small = n_hf <= M3a

    def x_pass(M, gate):
        okm = hf & (dstx < M) & gate
        scm = jnp.where(okm, dstx, M)
        bx = jnp.full(M, -1, jnp.int32).at[scm].set(src_be,
                                                    mode="drop")
        aqx = jnp.zeros(M, jnp.int32).at[scm].set(
            x_aq.reshape(-1), mode="drop")
        alx = jnp.zeros(M, jnp.int32).at[scm].set(
            x_alen.reshape(-1), mode="drop")
        arx = jnp.zeros(M, jnp.int32).at[scm].set(
            x_ar.reshape(-1), mode="drop")

        def run(_):
            return extend_chains(
                text, reads, lens, bx, aqx, alx, arx, l_pac=l_pac,
                o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins,
                match=match, mismatch=mismatch,
                pen_clip5=pen_clip5, pen_clip3=pen_clip3, w=w,
                zdrop=zdrop)

        def skip(_):
            z = jnp.zeros(M, jnp.int32)
            return z, z, z, z, z

        res = jax.lax.cond(jnp.any(okm), run, skip, None)
        return okm, res

    ok_s, res_s = x_pass(M3a, use_small)
    ok_b, res_b = x_pass(M3b, ~use_small)
    okx = ok_s | ok_b
    gx = jnp.clip(dstx, 0, max(M3a, M3b) - 1)
    okg2 = okx.reshape(B, E)

    def back(i):
        v = jnp.where(ok_s, res_s[i][jnp.clip(dstx, 0, M3a - 1)],
                      res_b[i][jnp.clip(dstx, 0, M3b - 1)])
        return jnp.where(okg2, v.reshape(B, E), 0).astype(jnp.int32)

    esc_over = (hf & ~okx).reshape(B, E).sum(axis=1).astype(jnp.int32) \
        + left_over.astype(jnp.int32)

    qb = jnp.concatenate([qb, back(0)], axis=1)
    qe = jnp.concatenate([qe, back(1)], axis=1)
    rb = jnp.concatenate([rb, back(2)], axis=1)
    re = jnp.concatenate([re, back(3)], axis=1)
    score = jnp.concatenate([score, back(4)], axis=1)
    weight = jnp.concatenate(
        [ch["weight"], jnp.where(okg2, x_alen, 0)], axis=1)
    keep = jnp.concatenate([keep, okg2], axis=1)
    aq = jnp.concatenate([aq, jnp.where(okg2, x_aq, 0)], axis=1)
    alen = jnp.concatenate([alen, jnp.where(okg2, x_alen, 0)], axis=1)
    ar = jnp.concatenate([ar, jnp.where(okg2, x_ar, 0)], axis=1)
    return dict(qb=qb, qe=qe, rb=rb, re=re, score=score,
                weight=weight, keep=keep, rep_cov=s1["rep_cov"],
                n_dp=n_dp, anchor_q=aq, anchor_len=alen, anchor_r=ar,
                occ_clip=s1["occ_clip"], seeds_full=s1["seeds_full"],
                n_seg=ch["n_seg"], esc_over=esc_over)


@functools.partial(jax.jit, static_argnames=(
    "l_pac", "o_del", "e_del", "o_ins", "e_ins", "match", "mismatch",
    "pen_clip5", "pen_clip3", "w", "zdrop"))
def extend_chains(text, reads, lens, b_idx, aq, alen, ar,
                  l_pac: int,
                  o_del: int = 6, e_del: int = 1, o_ins: int = 6,
                  e_ins: int = 1, match: int = 1, mismatch: int = 4,
                  pen_clip5: int = 5, pen_clip3: int = 5, w: int = 100,
                  zdrop: int = 0):
    """Left+right extension of M chain anchors in one dispatch.

    b_idx/aq/alen/ar: [M] anchor description (read index, anchor query
    start, anchor length, anchor text position in 2L space).  Padded
    entries use b_idx = -1.

    Returns qb, qe, rb, re, score [M] int32.
    """
    M = b_idx.shape[0]
    B, L = reads.shape
    TW = L + w + 1
    valid = b_idx >= 0
    bsafe = jnp.maximum(b_idx, 0)
    rlens = lens[bsafe].astype(jnp.int32)
    rows = reads[bsafe]                                     # [M, L]
    jr = jnp.arange(L, dtype=jnp.int32)[None, :]
    jt = jnp.arange(TW, dtype=jnp.int32)[None, :]
    tlen_total = text.shape[0]

    ext = _extend_impl()
    # ---- left: reversed prefixes --------------------------------------
    lq = jnp.where(valid, aq, 0).astype(jnp.int32)
    q_l = jnp.take_along_axis(
        rows, jnp.clip(aq[:, None] - 1 - jr, 0, L - 1), axis=1)
    q_l = jnp.where(jr < lq[:, None], q_l, 4).astype(jnp.int8)
    floor = jnp.where(ar >= l_pac, l_pac, 0)
    wl = jnp.minimum(aq + w, ar - floor)
    wl = jnp.where(valid, jnp.maximum(wl, 0), 0).astype(jnp.int32)
    t_idx = jnp.clip(ar[:, None] - 1 - jt, 0, tlen_total - 1)
    t_l = jnp.where(jt < wl[:, None], text[t_idx], 4).astype(jnp.int8)
    h0 = (alen * match).astype(jnp.int32)
    out_l = ext(q_l, lq, t_l, wl, h0,
                         o_del=o_del, e_del=e_del, o_ins=o_ins,
                         e_ins=e_ins, match=match, mismatch=mismatch,
                         zdrop=zdrop, band=w)
    # clip decision (read 5'): local vs to-end.  ksw_extend seeds its
    # running max with h0 and only extends on a STRICT improvement —
    # the kernel's max excludes the zero-extension cell, so apply that
    # guard here (covers both the XLA and Pallas kernels).
    no_left = lq == 0
    ext_l = out_l["score"] > h0
    loc_l = jnp.maximum(out_l["score"], h0)
    use_gl = (out_l["gscore"] > 0) \
        & (out_l["gscore"] > loc_l - pen_clip5)
    qb = jnp.where(no_left, aq,
                   jnp.where(use_gl, 0,
                             jnp.where(ext_l, aq - out_l["qle"], aq)))
    rb = jnp.where(no_left, ar,
                   jnp.where(use_gl, ar - out_l["gtle"],
                             jnp.where(ext_l, ar - out_l["tle"], ar)))
    score_l = jnp.where(no_left, h0,
                        jnp.where(use_gl, out_l["gscore"], loc_l))

    # ---- right --------------------------------------------------------
    qstart = aq + alen
    rstart = ar + alen
    rlen = jnp.where(valid, rlens - qstart, 0).astype(jnp.int32)
    rlen = jnp.maximum(rlen, 0)
    q_r = jnp.take_along_axis(
        rows, jnp.clip(qstart[:, None] + jr, 0, L - 1), axis=1)
    q_r = jnp.where(jr < rlen[:, None], q_r, 4).astype(jnp.int8)
    ceil = jnp.where(ar < l_pac, l_pac, 2 * l_pac)
    wr = jnp.minimum(rlen + w, ceil - rstart)
    wr = jnp.where(valid, jnp.maximum(wr, 0), 0).astype(jnp.int32)
    t_idx = jnp.clip(rstart[:, None] + jt, 0, tlen_total - 1)
    t_r = jnp.where(jt < wr[:, None], text[t_idx], 4).astype(jnp.int8)
    out_r = ext(q_r, rlen, t_r, wr,
                         score_l.astype(jnp.int32),
                         o_del=o_del, e_del=e_del, o_ins=o_ins,
                         e_ins=e_ins, match=match, mismatch=mismatch,
                         zdrop=zdrop, band=w)
    no_right = rlen == 0
    ext_r = out_r["score"] > score_l
    loc_r = jnp.maximum(out_r["score"], score_l)
    use_gr = (out_r["gscore"] > 0) \
        & (out_r["gscore"] > loc_r - pen_clip3)
    qe = jnp.where(no_right, qstart,
                   jnp.where(use_gr, rlens,
                             jnp.where(ext_r, qstart + out_r["qle"],
                                       qstart)))
    re = jnp.where(no_right, rstart,
                   jnp.where(use_gr, rstart + out_r["gtle"],
                             jnp.where(ext_r, rstart + out_r["tle"],
                                       rstart)))
    score = jnp.where(no_right, score_l,
                      jnp.where(use_gr, out_r["gscore"], loc_r))
    return (qb.astype(jnp.int32), qe.astype(jnp.int32),
            rb.astype(jnp.int32), re.astype(jnp.int32),
            score.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=(
    "o_del", "e_del", "o_ins", "e_ins", "match", "mismatch", "band"))
def global_and_traceback(q, ql, t, tl,
                         o_del: int = 6, e_del: int = 1, o_ins: int = 6,
                         e_ins: int = 1, match: int = 1, mismatch: int = 4,
                         band: int = 208):
    """Banded global DP + on-device traceback.

    Returns (score [M], ops [M, T] int8 step codes in reverse walk
    order with OP_NONE padding, nm [M]).  The direction matrix stays on
    device.
    """
    M, Lq = q.shape
    _, Lt = t.shape
    score, dirs = global_batch(q, ql, t, tl, o_del=o_del, e_del=e_del,
                               o_ins=o_ins, e_ins=e_ins, match=match,
                               mismatch=mismatch, band=band)
    dirs_flat = dirs.reshape(M, Lq * (Lt + 1))
    T = (2 * (Lq + Lt) + 7) // 4 * 4

    def cond(st):
        sv, ops_w, s = st
        return (s < T) & jnp.any((sv[0] > 0) | (sv[1] > 0))

    def step(st):
        # carry = ONE [4, M] tensor (i, j, state, nm) + the packed op
        # words + the step scalar: per-buffer loop-carry cost dominates
        # on this runtime (see ops/fm.packed_while_loop)
        sv, ops_w, s = st
        i, j, state, nm = sv[0], sv[1], sv[2], sv[3]
        done = (i == 0) & (j == 0)
        code = jnp.take_along_axis(
            dirs_flat,
            (jnp.clip(i - 1, 0, Lq - 1) * (Lt + 1)
             + jnp.clip(j, 0, Lt))[:, None], axis=1)[:, 0].astype(jnp.int32)
        at_top = (i == 0) & (j > 0)       # forced D
        at_left = (j == 0) & (i > 0)      # forced I
        src = code & 3
        # H state resolution
        h_is_m = (state == 0) & (src == DIR_M)
        h_to_e = (state == 0) & (src == DIR_E)
        h_to_f = (state == 0) & (src > DIR_E)
        in_e = state == 1
        in_f = state == 2
        op = jnp.where(done, OP_NONE,
             jnp.where(at_top, OP_D,
             jnp.where(at_left, OP_I,
             jnp.where(h_is_m, OP_M,
             jnp.where(in_e, OP_D,
             jnp.where(in_f, OP_I, OP_NONE))))))
        # movement
        di = jnp.where((op == OP_M) | (op == OP_I), 1, 0)
        dj = jnp.where((op == OP_M) | (op == OP_D), 1, 0)
        # mismatch counting for NM: the direction code carries the
        # q-vs-t inequality bit (BIT_MIS), so the walk needs no
        # character gathers
        add_nm = jnp.where(op == OP_M,
                           ((code & BIT_MIS) != 0).astype(jnp.int32),
                           jnp.where((op == OP_D) | (op == OP_I), 1, 0))
        # state transition
        new_state = jnp.where(done, state,
                    jnp.where(at_top | at_left, state,
                    jnp.where(h_to_e, 1,
                    jnp.where(h_to_f, 2,
                    jnp.where(in_e & ((code & BIT_EEXT) == 0), 0,
                    jnp.where(in_f & ((code & BIT_FEXT) == 0), 0,
                    jnp.where(h_is_m, 0, state)))))))
        # write the 2-bit op code into its slot of the PACKED word
        # column (16 codes/int32).  The walk's loop carry is staged on
        # every while iteration (~250 us/MB on the axon runtime), so
        # carrying [M, T/16] words instead of [M, T] bytes cuts that
        # 16x.  Words start all-OP_NONE (0xFF..), hence clear-then-or.
        wi = s >> 4
        sh = 2 * (s & 15)
        col = jax.lax.dynamic_slice(ops_w, (0, wi), (M, 1))
        col = (col & ~(3 << sh)) | (op[:, None] << sh)
        ops_w2 = jax.lax.dynamic_update_slice(ops_w, col, (0, wi))
        return (jnp.stack([i - di, j - dj, new_state, nm + add_nm]),
                ops_w2, s + 1)

    def body(st):
        # 8 walk steps per while iteration: amortizes the sequential
        # loop's per-iteration overhead (each step is a tiny gather;
        # the walk is ~max(ql+tl) iterations otherwise)
        for _ in range(8):
            st = step(st)
        return st

    Tw = T // 16 + 1
    init = (jnp.stack([ql.astype(jnp.int32), tl.astype(jnp.int32),
                       jnp.zeros(M, jnp.int32),
                       jnp.zeros(M, jnp.int32)]),
            jnp.full((M, Tw), -1, jnp.int32),   # all slots OP_NONE (3)
            jnp.int32(0))
    sv, ops_w, _ = jax.lax.while_loop(cond, body, init)
    nm = sv[3]
    # emit the same 4-codes-per-byte layout the host unpacker expects:
    # byte b of word w holds codes 4b..4b+3 at bits 0/2/4/6
    Tp = (T + 3) // 4 * 4
    bts = jnp.stack([(ops_w >> (8 * b)) & 0xFF for b in range(4)],
                    axis=2).astype(jnp.uint8)          # [M, Tw, 4]
    packed = bts.reshape(M, Tw * 4)[:, :Tp // 4]
    return score, packed, nm


@functools.partial(jax.jit, static_argnames=(
    "l_pac", "max_seeds", "min_seed_len", "max_occ", "k_occ",
    "band", "max_chain_gap", "drop_ratio", "max_chains",
    "o_del", "e_del", "o_ins", "e_ins", "match", "mismatch",
    "pen_clip5", "pen_clip3", "w", "zdrop",
    "split_len", "split_width", "min_chain_weight",
    "max_chain_extend", "max_mem_intv"))
def seed_chain_extend_packed(fm: DeviceFMIndex, text, reads, lens,
                             l_pac: int, **kw):
    """seed_chain_extend with every output packed into ONE int32
    tensor [B, 10*S + 6] (S = max_chains + 1 region slots) — a single
    device->host fetch.  Through a remote device link (axon tunnel)
    each fetched buffer is a round trip, which dominated e2e wall
    time at ~15 buffers per batch.

    Column layout: qb, qe, rb, re, score, weight, keep, anchor_q,
    anchor_len, anchor_r (S columns each), then rep_cov, n_dp,
    occ_clip, seeds_full, n_seg, esc_over (1 column each).
    """
    out = seed_chain_extend(fm, text, reads, lens, l_pac=l_pac, **kw)
    B = reads.shape[0]
    cols = [out[k].astype(jnp.int32) for k in
            ("qb", "qe", "rb", "re", "score", "weight")]
    cols.append(out["keep"].astype(jnp.int32))
    cols += [out[k].astype(jnp.int32) for k in
             ("anchor_q", "anchor_len", "anchor_r")]
    extra = jnp.stack([
        out["rep_cov"].astype(jnp.int32),
        jnp.broadcast_to(out["n_dp"].astype(jnp.int32).reshape(-1)[:1],
                         (B,)),
        out["occ_clip"].astype(jnp.int32),
        out["seeds_full"].astype(jnp.int32),
        out["n_seg"].astype(jnp.int32),
        out["esc_over"].astype(jnp.int32)], axis=1)
    return jnp.concatenate(cols + [extra], axis=1)


def unpack_stage1(arr, n_slots: int):
    """Host-side inverse of seed_chain_extend_packed (numpy).
    ``n_slots`` = region slots per read (max_chains + 1: the chains
    plus the per-seed second-extension slot)."""
    import numpy as np
    C = n_slots
    names = ("qb", "qe", "rb", "re", "score", "weight", "keep",
             "anchor_q", "anchor_len", "anchor_r")
    out = {}
    for i, k in enumerate(names):
        out[k] = arr[:, i * C:(i + 1) * C]
    base = 10 * C
    out["rep_cov"] = arr[:, base]
    out["n_dp"] = arr[:, base + 1]
    out["occ_clip"] = arr[:, base + 2]
    out["seeds_full"] = arr[:, base + 3]
    out["n_seg"] = arr[:, base + 4]
    out["esc_over"] = arr[:, base + 5]
    out["keep"] = out["keep"].astype(bool)
    return out


@functools.partial(jax.jit, static_argnames=(
    "o_del", "e_del", "o_ins", "e_ins", "match", "mismatch", "band"))
def global_and_traceback_packed(q, ql, t, tl, **kw):
    """global_and_traceback with (score, nm) stacked into one [M, 2]
    int32 tensor — two device fetches per batch instead of three."""
    score, packed, nm = global_and_traceback(q, ql, t, tl, **kw)
    return jnp.stack([score.astype(jnp.int32),
                      nm.astype(jnp.int32)], axis=1), packed
