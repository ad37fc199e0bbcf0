"""Wide (hi/lo) twins of the fused stage-1 device pipeline — the
single-dispatch seed+locate+chain+extend path for references whose 2L
text exceeds 2^31 (hg38-scale single shards, docs/SHARDED_INDEX.md
milestones 3-4).

Mirrors ``align.device_pipeline`` stage by stage (see that module for
the dispatch-fusion rationale); every text POSITION rides as an
(hi, lo) int32 pair (value = hi * 2^30 + lo, ops/fm_hilo.py algebra),
and extension windows gather from a 2-bit PACKED text (uint32 words,
16 bases each, first base in the top bits) so gather indices stay
int32 for texts up to 2^35 bases.  Query-side coordinates (qb/qe,
lengths, scores) are untouched int32.

Stage 2 (banded global + traceback) needs no wide twin: its text
windows are gathered host-side with numpy int64 (align/aligner.py).

Pinned by tests/test_pipeline_wide.py: bit-identical stage-1 outputs
vs the int32 pipeline on sub-2^31 indexes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fm_hilo import (LO_BITS, DeviceFMIndexHiLo, hl_add_small,
                           hl_lt, hl_shift_right, hl_sub)
from ..ops.fm_wide import sa_lookup_wide, smem_collect_wide, smem_reseed_wide
from .device_pipeline import _extend_impl, dp_rows

_I32_MAX = (1 << 31) - 1


def pack_text_2bit(codes: np.ndarray) -> np.ndarray:
    """2-bit pack nt4 codes (all < 4) into uint32 words, 16 bases per
    word, base i in bits ``2 * (15 - i%16)`` (first base topmost —
    same convention as the FM-index's bwt words)."""
    n = codes.size
    nw = (n + 15) // 16
    padded = np.zeros(nw * 16, np.uint32)
    padded[:n] = codes.astype(np.uint32)
    q = padded.reshape(nw, 16)
    w = np.zeros(nw, np.uint32)
    for j in range(16):
        w |= q[:, j] << np.uint32(2 * (15 - j))
    return w


def _gather_codes(text_w: jax.Array, p_hi: jax.Array, p_lo: jax.Array,
                  valid: jax.Array) -> jax.Array:
    """Codes at positions (p_hi, p_lo); 4 where invalid."""
    widx = hl_shift_right(jnp.maximum(p_hi, 0),
                          jnp.where(p_hi < 0, 0, p_lo), 4)
    widx = jnp.clip(widx, 0, text_w.shape[0] - 1)
    word = text_w[widx]
    shift = (2 * (15 - (p_lo & 15))).astype(jnp.uint32)
    c = ((word >> shift) & jnp.uint32(3)).astype(jnp.int8)
    return jnp.where(valid & (p_hi >= 0), c, jnp.int8(4))


def _hl_min(ah, al, bh, bl):
    lt = hl_lt(ah, al, bh, bl)
    return jnp.where(lt, ah, bh), jnp.where(lt, al, bl)


def _hl_max(ah, al, bh, bl):
    lt = hl_lt(ah, al, bh, bl)
    return jnp.where(lt, bh, ah), jnp.where(lt, bl, al)


def _clamp32(hi, lo):
    return jnp.where(hi >= 2, jnp.int32(_I32_MAX),
                     jnp.where(hi < 0, jnp.int32(-_I32_MAX),
                               hi * (1 << LO_BITS) + lo))


@functools.partial(jax.jit, static_argnames=("max_seeds", "min_seed_len",
                                             "max_occ", "k_occ",
                                             "split_len", "split_width",
                                             "max_mem_intv", "p3_seeds"))
def seed_and_locate_wide(fm: DeviceFMIndexHiLo, reads, lens,
                         max_seeds: int = 16, min_seed_len: int = 19,
                         max_occ: int = 500, k_occ: int = 16,
                         split_len: int = 28, split_width: int = 10,
                         max_mem_intv: int = 20, p3_seeds: int = 8):
    """Wide twin of ``seed_and_locate``: all 3 bwa seeding passes + SA
    locate in one dispatch; positions come back as (hi, lo) planes."""
    B = reads.shape[0]
    seeds = smem_collect_wide(
        fm, reads, lens, max_seeds=max_seeds,
        min_seed_len=min_seed_len,
        p3_seeds=p3_seeds if max_mem_intv > 0 else 0,
        p3_max_intv=max_mem_intv)
    n, sz = seeds["n_seeds"], seeds["intv_sz"]
    ilh, ill = seeds["il_hi"], seeds["il_lo"]
    qb_s, qe_s = seeds["qbeg"], seeds["qend"]
    s_idx = jnp.arange(max_seeds)[None, :]
    in_range = s_idx < n[:, None]
    repetitive = in_range & (sz > max_occ)
    seed_valid = in_range & (sz > 0) & (sz <= max_occ)

    seed_len = qe_s - qb_s
    qualifies = seed_valid & (seed_len >= split_len) & (sz <= split_width)
    pick = jnp.argmax(jnp.where(qualifies, seed_len, -1), axis=1)
    bidx = jnp.arange(B)
    r_active = qualifies[bidx, pick]
    r_qb, r_qe, r_ilh, r_ill, r_sz = smem_reseed_wide(
        fm, reads, lens, qb_s[bidx, pick], qe_s[bidx, pick],
        sz[bidx, pick], r_active, min_seed_len=min_seed_len)

    qb_all = jnp.concatenate([qb_s, r_qb[:, None]], axis=1)
    qe_all = jnp.concatenate([qe_s, r_qe[:, None]], axis=1)
    sz_all = jnp.concatenate([sz, r_sz[:, None]], axis=1)
    ilh_all = jnp.concatenate([ilh, r_ilh[:, None]], axis=1)
    ill_all = jnp.concatenate([ill, r_ill[:, None]], axis=1)
    valid_all = jnp.concatenate(
        [seed_valid, ((r_sz > 0) & (r_sz <= max_occ))[:, None]], axis=1)

    if max_mem_intv > 0 and p3_seeds > 0:
        p3_valid = (jnp.arange(p3_seeds)[None, :]
                    < seeds["p3_n"][:, None]) \
            & (seeds["p3_intv_sz"] > 0) \
            & (seeds["p3_intv_sz"] <= max_occ)
        qb_all = jnp.concatenate([qb_all, seeds["p3_qbeg"]], axis=1)
        qe_all = jnp.concatenate([qe_all, seeds["p3_qend"]], axis=1)
        sz_all = jnp.concatenate([sz_all, seeds["p3_intv_sz"]], axis=1)
        ilh_all = jnp.concatenate([ilh_all, seeds["p3_il_hi"]], axis=1)
        ill_all = jnp.concatenate([ill_all, seeds["p3_il_lo"]], axis=1)
        valid_all = jnp.concatenate([valid_all, p3_valid], axis=1)

    S1 = valid_all.shape[1]
    k_take = jnp.minimum(sz_all, k_occ)
    kio = jnp.arange(k_occ, dtype=jnp.int32)[None, None, :]
    rk_h, rk_l = hl_add_small(
        jnp.broadcast_to(ilh_all[:, :, None], (B, S1, k_occ)),
        jnp.broadcast_to(ill_all[:, :, None], (B, S1, k_occ)),
        jnp.broadcast_to(kio, (B, S1, k_occ)))
    occ_valid = valid_all[:, :, None] & (kio < k_take[:, :, None])
    rk_h = jnp.where(occ_valid, rk_h, -1).astype(jnp.int32)
    rk_l = jnp.where(occ_valid, rk_l, 0).astype(jnp.int32)
    # compact valid ranks before the SA walk (same budget/fallback
    # scheme as the int32 pipeline; two scatter planes instead of one)
    fh = rk_h.reshape(-1)
    fl = rk_l.reshape(-1)
    N = fh.shape[0]
    Mc = 12 * B
    val = fh >= 0
    dst = jnp.cumsum(val.astype(jnp.int32)) - 1
    n_val = jnp.sum(val.astype(jnp.int32))
    ok = val & (dst < Mc)
    scat = jnp.where(ok, dst, Mc)
    buf_h = jnp.full(Mc, -1, jnp.int32).at[scat].set(fh, mode="drop")
    buf_l = jnp.zeros(Mc, jnp.int32).at[scat].set(fl, mode="drop")
    isrc = jnp.full(Mc, N, jnp.int32).at[scat].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop")

    def locate_compact(_):
        ph, pl = sa_lookup_wide(fm, buf_h, buf_l)
        oh = jnp.full(N, -1, jnp.int32).at[isrc].set(ph, mode="drop")
        ol = jnp.zeros(N, jnp.int32).at[isrc].set(pl, mode="drop")
        return oh, ol

    def locate_full(_):
        return sa_lookup_wide(fm, fh, fl)

    ph, pl = jax.lax.cond(n_val <= Mc, locate_compact, locate_full,
                          operand=None)
    pos_h = ph.reshape(B, S1, k_occ)
    pos_l = pl.reshape(B, S1, k_occ)
    rep_cov = jnp.sum(jnp.where(repetitive, qe_s - qb_s, 0), axis=1)
    occ_clip = jnp.sum(jnp.where(valid_all,
                                 jnp.maximum(sz_all - k_occ, 0), 0),
                       axis=1)
    seeds_full = (seeds["n_dropped"] > 0).astype(jnp.int32)
    return dict(qbeg=qb_all, qend=qe_all, pos_h=pos_h, pos_l=pos_l,
                rep_cov=rep_cov, occ_clip=occ_clip,
                seeds_full=seeds_full)


def chain_device_wide(qb_all, qe_all, pos_h, pos_l, l_pac: int,
                      band: int = 100, max_chain_gap: int = 10000,
                      drop_ratio: float = 0.5, max_chains: int = 4,
                      min_chain_weight: int = 0,
                      max_chain_extend: int = 1 << 30):
    """Wide twin of ``chain_device`` (mem_chain semantics; see the
    int32 docstring).  Positions as (hi, lo) pairs; the stable
    lexicographic sort carries 5 keys (strand, diag hi/lo, pos hi/lo)
    + the packed (qb, len) payload."""
    B, S, K = pos_h.shape
    N = S * K
    oqb = jnp.broadcast_to(qb_all[:, :, None], (B, S, K)).reshape(B, N)
    oqe = jnp.broadcast_to(qe_all[:, :, None], (B, S, K)).reshape(B, N)
    oph = pos_h.reshape(B, N)
    opl = pos_l.reshape(B, N)
    olen = (oqe - oqb).astype(jnp.int32)
    lp_h = np.int32(l_pac >> LO_BITS)
    lp_l = np.int32(l_pac & ((1 << LO_BITS) - 1))
    lp2 = 2 * l_pac
    lp2_h = np.int32(lp2 >> LO_BITS)
    lp2_l = np.int32(lp2 & ((1 << LO_BITS) - 1))
    pe_h, pe_l = hl_add_small(oph, opl, olen)      # pos + len
    located = oph >= 0
    spans_mid = hl_lt(oph, opl, lp_h, lp_l) \
        & hl_lt(lp_h, lp_l, pe_h, pe_l)
    ovalid = located & ~spans_mid
    on_rev = ~hl_lt(oph, opl, lp_h, lp_l)          # pos >= l_pac
    strand = jnp.where(ovalid, on_rev.astype(jnp.int32), 3)
    # diag = pos - qb (can dip to -1023); biased +1024 for sort keys
    dh0, dl0 = hl_sub(oph, opl, jnp.zeros_like(oph), oqb)
    dh, dl = hl_add_small(dh0, dl0, 1024)
    dh = jnp.where(ovalid, dh, 0)
    dl = jnp.where(ovalid, dl, 0)
    sp_h = jnp.where(ovalid, oph, jnp.int32(2**30))
    sp_l = jnp.where(ovalid, opl, 0)

    pl_pack = (oqb.astype(jnp.int32) << 16) | olen
    s_strand, s_dh, s_dl, s_ph, s_pl, s_pld = jax.lax.sort(
        (strand, dh, dl, sp_h, sp_l, pl_pack), dimension=1, num_keys=5,
        is_stable=True)
    s_valid = s_strand != 3
    s_qb = s_pld >> 16
    s_len = s_pld & 0xffff

    gap_dh, gap_dl = hl_sub(s_dh[:, 1:], s_dl[:, 1:],
                            s_dh[:, :-1], s_dl[:, :-1])
    gap_ph, gap_pl = hl_sub(s_ph[:, 1:], s_pl[:, 1:],
                            s_ph[:, :-1], s_pl[:, :-1])
    brk = jnp.ones((B, N), dtype=bool)
    brk = brk.at[:, 1:].set(
        (s_strand[:, 1:] != s_strand[:, :-1])
        | (gap_dh > 0) | ((gap_dh == 0) & (gap_dl > band))
        | (gap_ph > 0) | ((gap_ph == 0) & (gap_pl > max_chain_gap)))
    BIG = jnp.int32(2**30)
    n_idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :],
                             (B, N))
    vlen = jnp.where(s_valid, s_len, 0)
    qbv = jnp.where(s_valid, s_qb, BIG)
    qev = jnp.where(s_valid, s_qb + s_len, -1)
    seh, sel_ = hl_add_small(s_ph, s_pl, s_len)    # pos + len
    rbv_h = jnp.where(s_valid, s_ph, BIG)
    rbv_l = jnp.where(s_valid, s_pl, 0)
    rev_h = jnp.where(s_valid, seh, -1)
    rev_l = jnp.where(s_valid, sel_, 0)
    aval = jnp.where(
        s_valid, (s_len << 19) | ((1023 - s_qb) << 9) | (511 - n_idx),
        -1)

    def shr(x, d, fill):
        return jnp.concatenate(
            [jnp.full((B, d), fill, x.dtype), x[:, :-d]], axis=1)

    f = brk
    len_sum, qb_min, qe_max, anchor = vlen, qbv, qev, aval
    rb_h, rb_l, re_h, re_l = rbv_h, rbv_l, rev_h, rev_l
    d = 1
    while d < N:
        nf = ~f
        len_sum = jnp.where(nf, shr(len_sum, d, 0) + len_sum, len_sum)
        qb_min = jnp.where(nf, jnp.minimum(shr(qb_min, d, BIG), qb_min),
                           qb_min)
        qe_max = jnp.where(nf, jnp.maximum(shr(qe_max, d, -1), qe_max),
                           qe_max)
        mnh, mnl = _hl_min(shr(rb_h, d, BIG), shr(rb_l, d, 0),
                           rb_h, rb_l)
        rb_h = jnp.where(nf, mnh, rb_h)
        rb_l = jnp.where(nf, mnl, rb_l)
        mxh, mxl = _hl_max(shr(re_h, d, -1), shr(re_l, d, 0),
                           re_h, re_l)
        re_h = jnp.where(nf, mxh, re_h)
        re_l = jnp.where(nf, mxl, re_l)
        anchor = jnp.where(nf, jnp.maximum(shr(anchor, d, -1), anchor),
                           anchor)
        f = f | shr(f, d, True)
        d *= 2
    is_last = jnp.concatenate(
        [brk[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    rspan_h, rspan_l = hl_sub(re_h, re_l, rb_h, rb_l)
    weight = jnp.minimum(len_sum,
                         jnp.minimum(qe_max - qb_min,
                                     _clamp32(rspan_h, rspan_l)))
    weight = jnp.where(is_last & (anchor >= 0), weight, -1)

    n_seg = jnp.sum((weight >= 0).astype(jnp.int32), axis=1)
    pk = jnp.where(weight >= 0, weight * 512 + (511 - n_idx), -1)
    _, top = jax.lax.top_k(pk, max_chains)
    w_c = jnp.take_along_axis(weight, top, axis=1)
    best_w = w_c[:, :1]
    keep = (w_c > 0) & (w_c.astype(jnp.float32)
                        >= drop_ratio * best_w.astype(jnp.float32))
    if min_chain_weight > 0:
        keep = keep & (w_c >= min_chain_weight)
    if max_chain_extend < max_chains:
        keep = keep & (jnp.arange(max_chains)[None, :]
                       < max_chain_extend)
    packed = jnp.take_along_axis(anchor, top, axis=1)
    a_len = packed >> 19
    a_qb = 1023 - ((packed >> 9) & 1023)
    a_n = 511 - (packed & 511)
    a_ph = jnp.take_along_axis(s_ph, a_n, axis=1)
    a_pl = jnp.take_along_axis(s_pl, a_n, axis=1)
    return dict(anchor_q=jnp.where(keep, a_qb, 0),
                anchor_len=jnp.where(keep, a_len, 0),
                anchor_rh=jnp.where(keep, a_ph, 0),
                anchor_rl=jnp.where(keep, a_pl, 0),
                weight=jnp.where(keep, w_c, 0), keep=keep,
                n_seg=n_seg)


@functools.partial(jax.jit, static_argnames=(
    "l_pac", "o_del", "e_del", "o_ins", "e_ins", "match", "mismatch",
    "pen_clip5", "pen_clip3", "w", "zdrop"))
def extend_chains_wide(text_w, reads, lens, b_idx, aq, alen,
                       ar_h, ar_l, l_pac: int,
                       o_del: int = 6, e_del: int = 1, o_ins: int = 6,
                       e_ins: int = 1, match: int = 1, mismatch: int = 4,
                       pen_clip5: int = 5, pen_clip3: int = 5,
                       w: int = 100, zdrop: int = 0):
    """Wide twin of ``extend_chains``: anchor text positions as
    (hi, lo); window codes gathered from the packed 2-bit text."""
    M = b_idx.shape[0]
    B, L = reads.shape
    TW = L + w + 1
    valid = b_idx >= 0
    bsafe = jnp.maximum(b_idx, 0)
    rlens = lens[bsafe].astype(jnp.int32)
    rows = reads[bsafe]
    jr = jnp.arange(L, dtype=jnp.int32)[None, :]
    jt = jnp.arange(TW, dtype=jnp.int32)[None, :]
    lp_h = np.int32(l_pac >> LO_BITS)
    lp_l = np.int32(l_pac & ((1 << LO_BITS) - 1))

    ext = _extend_impl()
    # ---- left: reversed prefixes -------------------------------------
    lq = jnp.where(valid, aq, 0).astype(jnp.int32)
    q_l = jnp.take_along_axis(
        rows, jnp.clip(aq[:, None] - 1 - jr, 0, L - 1), axis=1)
    q_l = jnp.where(jr < lq[:, None], q_l, 4).astype(jnp.int8)
    on_rev = ~hl_lt(ar_h, ar_l, lp_h, lp_l)          # ar >= l_pac
    fl_h = jnp.where(on_rev, lp_h, 0)
    fl_l = jnp.where(on_rev, lp_l, 0)
    dist_h, dist_l = hl_sub(ar_h, ar_l, fl_h, fl_l)  # ar - floor >= 0
    wl = jnp.minimum(aq + w, _clamp32(dist_h, dist_l))
    wl = jnp.where(valid, jnp.maximum(wl, 0), 0).astype(jnp.int32)
    tp_h, tp_l = hl_sub(jnp.broadcast_to(ar_h[:, None], (M, TW)),
                        jnp.broadcast_to(ar_l[:, None], (M, TW)),
                        jnp.zeros((M, TW), jnp.int32), 1 + jt)
    t_l = _gather_codes(text_w, tp_h, tp_l, jt < wl[:, None])
    h0 = (alen * match).astype(jnp.int32)
    out_l = ext(q_l, lq, t_l, wl, h0,
                o_del=o_del, e_del=e_del, o_ins=o_ins,
                e_ins=e_ins, match=match, mismatch=mismatch,
                zdrop=zdrop, band=w)
    no_left = lq == 0
    ext_l = out_l["score"] > h0
    loc_l = jnp.maximum(out_l["score"], h0)
    use_gl = (out_l["gscore"] > 0) \
        & (out_l["gscore"] > loc_l - pen_clip5)
    qb = jnp.where(no_left, aq,
                   jnp.where(use_gl, 0,
                             jnp.where(ext_l, aq - out_l["qle"], aq)))
    shift_l = jnp.where(no_left, 0,
                        jnp.where(use_gl, out_l["gtle"],
                                  jnp.where(ext_l, out_l["tle"], 0)))
    rb_h, rb_l = hl_sub(ar_h, ar_l, jnp.zeros_like(ar_h), shift_l)
    score_l = jnp.where(no_left, h0,
                        jnp.where(use_gl, out_l["gscore"], loc_l))

    # ---- right -------------------------------------------------------
    qstart = aq + alen
    rs_h, rs_l = hl_add_small(ar_h, ar_l, alen)
    rlen = jnp.where(valid, rlens - qstart, 0).astype(jnp.int32)
    rlen = jnp.maximum(rlen, 0)
    q_r = jnp.take_along_axis(
        rows, jnp.clip(qstart[:, None] + jr, 0, L - 1), axis=1)
    q_r = jnp.where(jr < rlen[:, None], q_r, 4).astype(jnp.int8)
    ce_h = jnp.where(on_rev, np.int32((2 * l_pac) >> LO_BITS), lp_h)
    ce_l = jnp.where(on_rev,
                     np.int32((2 * l_pac) & ((1 << LO_BITS) - 1)), lp_l)
    room_h, room_l = hl_sub(ce_h, ce_l, rs_h, rs_l)
    wr = jnp.minimum(rlen + w, _clamp32(room_h, room_l))
    wr = jnp.where(valid, jnp.maximum(wr, 0), 0).astype(jnp.int32)
    tp_h, tp_l = hl_add_small(jnp.broadcast_to(rs_h[:, None], (M, TW)),
                              jnp.broadcast_to(rs_l[:, None], (M, TW)),
                              jnp.broadcast_to(jt, (M, TW)))
    t_r = _gather_codes(text_w, tp_h, tp_l, jt < wr[:, None])
    out_r = ext(q_r, rlen, t_r, wr, score_l.astype(jnp.int32),
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
    shift_r = jnp.where(no_right, 0,
                        jnp.where(use_gr, out_r["gtle"],
                                  jnp.where(ext_r, out_r["tle"], 0)))
    re_h, re_l = hl_add_small(rs_h, rs_l, shift_r)
    score = jnp.where(no_right, score_l,
                      jnp.where(use_gr, out_r["gscore"], loc_r))
    return (qb.astype(jnp.int32), qe.astype(jnp.int32),
            rb_h, rb_l, re_h, re_l, score.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=(
    "l_pac", "max_seeds", "min_seed_len", "max_occ", "k_occ",
    "band", "max_chain_gap", "drop_ratio", "max_chains",
    "o_del", "e_del", "o_ins", "e_ins", "match", "mismatch",
    "pen_clip5", "pen_clip3", "w", "zdrop",
    "split_len", "split_width", "min_chain_weight",
    "max_chain_extend", "max_mem_intv"))
def seed_chain_extend_wide(fm: DeviceFMIndexHiLo, text_w, reads, lens,
                           l_pac: int,
                           max_seeds: int = 16, min_seed_len: int = 19,
                           max_occ: int = 500, k_occ: int = 16,
                           band: int = 100, max_chain_gap: int = 10000,
                           drop_ratio: float = 0.5, max_chains: int = 4,
                           o_del: int = 6, e_del: int = 1, o_ins: int = 6,
                           e_ins: int = 1, match: int = 1,
                           mismatch: int = 4,
                           pen_clip5: int = 5, pen_clip3: int = 5,
                           w: int = 100, zdrop: int = 0,
                           split_len: int = 28, split_width: int = 10,
                           min_chain_weight: int = 0,
                           max_chain_extend: int = 1 << 30,
                           max_mem_intv: int = 20):
    """Wide twin of the fused stage 1 (``seed_chain_extend``)."""
    B, L = reads.shape
    s1 = seed_and_locate_wide(fm, reads, lens, max_seeds=max_seeds,
                              min_seed_len=min_seed_len, max_occ=max_occ,
                              k_occ=k_occ, split_len=split_len,
                              split_width=split_width,
                              max_mem_intv=max_mem_intv)
    ch = chain_device_wide(s1["qbeg"], s1["qend"], s1["pos_h"],
                           s1["pos_l"], l_pac,
                           band=band, max_chain_gap=max_chain_gap,
                           drop_ratio=drop_ratio, max_chains=max_chains,
                           min_chain_weight=min_chain_weight,
                           max_chain_extend=max_chain_extend)
    C = max_chains
    keep = ch["keep"]
    aq, alen = ch["anchor_q"], ch["anchor_len"]
    arh, arl = ch["anchor_rh"], ch["anchor_rl"]

    rlen2 = lens.astype(jnp.int32)[:, None]
    trivial = keep & (aq == 0) & (alen == rlen2)
    need = (keep & ~trivial).reshape(-1)
    dest = jnp.cumsum(need.astype(jnp.int32)) - 1
    n_dp = jnp.sum(need.astype(jnp.int32)).reshape(1)
    M2 = dp_rows(B)
    ok = need & (dest < M2)
    scat = jnp.where(ok, dest, M2)
    src_b = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, C)).reshape(-1)
    cb = jnp.full(M2, -1, jnp.int32).at[scat].set(src_b, mode="drop")
    caq = jnp.zeros(M2, jnp.int32).at[scat].set(
        aq.reshape(-1), mode="drop")
    calen = jnp.zeros(M2, jnp.int32).at[scat].set(
        alen.reshape(-1), mode="drop")
    carh = jnp.zeros(M2, jnp.int32).at[scat].set(
        arh.reshape(-1), mode="drop")
    carl = jnp.zeros(M2, jnp.int32).at[scat].set(
        arl.reshape(-1), mode="drop")
    dqb, dqe, drbh, drbl, dreh, drel, dscore = extend_chains_wide(
        text_w, reads, lens, cb, caq, calen, carh, carl, l_pac=l_pac,
        o_del=o_del, e_del=e_del, o_ins=o_ins, e_ins=e_ins,
        match=match, mismatch=mismatch,
        pen_clip5=pen_clip5, pen_clip3=pen_clip3, w=w, zdrop=zdrop)

    gidx = jnp.clip(dest, 0, M2 - 1).reshape(B, C)
    okg = ok.reshape(B, C)

    def pick(dp, triv_val):
        return jnp.where(trivial, triv_val,
                         jnp.where(okg,
                                   dp[gidx.reshape(-1)].reshape(B, C),
                                   0)).astype(jnp.int32)

    ae_h, ae_l = hl_add_small(arh, arl, alen)      # anchor end pair
    qb = pick(dqb, aq)
    qe = pick(dqe, aq + alen)
    rb_h = pick(drbh, arh)
    rb_l = pick(drbl, arl)
    re_h = pick(dreh, ae_h)
    re_l = pick(drel, ae_l)
    score = pick(dscore, alen * match)

    # ---- per-seed second extension (escape rescue; see the int32
    # twin's comment) with (hi, lo) position algebra ----------------
    lp_h = np.int32(l_pac >> LO_BITS)
    lp_l = np.int32(l_pac & ((1 << LO_BITS) - 1))
    bsel = jnp.argmax(jnp.where(keep, score, -1), axis=1)

    def colv(x):
        return jnp.take_along_axis(x, bsel[:, None], axis=1)[:, 0]

    qb1, qe1 = colv(qb), colv(qe)
    rb1h, rb1l = colv(rb_h), colv(rb_l)
    re1h, re1l = colv(re_h), colv(re_l)
    d1h, d1l = hl_sub(colv(arh), colv(arl),
                      jnp.zeros_like(qb1), colv(aq))
    has_best = jnp.any(keep & (score > 0), axis=1)
    qbs, qes = s1["qbeg"], s1["qend"]
    ph3, pl3 = s1["pos_h"], s1["pos_l"]
    S1k = ph3.shape[1] * ph3.shape[2]
    olen3 = (qes - qbs)[:, :, None]
    pe3h, pe3l = hl_add_small(ph3, pl3, olen3)
    on_rev3 = ~hl_lt(ph3, pl3, lp_h, lp_l)
    rev1 = (~hl_lt(rb1h, rb1l, lp_h, lp_l))[:, None, None]
    do_h, do_l = hl_sub(ph3, pl3, jnp.zeros_like(ph3),
                        jnp.broadcast_to(qbs[:, :, None], ph3.shape))
    dd_h, dd_l = hl_sub(do_h, do_l, d1h[:, None, None],
                        d1l[:, None, None])
    # |dd| <= w for a canonical (hi, lo in [0, 2^30)) pair
    near = ((dd_h == 0) & (dd_l <= w)) \
        | ((dd_h == -1) & (dd_l >= (1 << LO_BITS) - w))
    spans_mid3 = hl_lt(ph3, pl3, lp_h, lp_l) \
        & hl_lt(lp_h, lp_l, pe3h, pe3l)
    candv = (ph3 >= 0) & (olen3 > 0) & (on_rev3 == rev1) & near \
        & ~spans_mid3
    contained = (qbs[:, :, None] >= qb1[:, None, None]) \
        & (qes[:, :, None] <= qe1[:, None, None]) \
        & ~hl_lt(ph3, pl3, rb1h[:, None, None], rb1l[:, None, None]) \
        & ~hl_lt(re1h[:, None, None], re1l[:, None, None], pe3h, pe3l)
    esc = candv & ~contained & has_best[:, None, None]
    escf = esc.reshape(B, S1k)
    olenf = jnp.broadcast_to(olen3, ph3.shape).reshape(B, S1k)
    qbf = jnp.broadcast_to(qbs[:, :, None], ph3.shape).reshape(B, S1k)
    phf = ph3.reshape(B, S1k)
    plf = pl3.reshape(B, S1k)
    pkf = jnp.where(escf, (olenf << 10) | (1023 - qbf), 0)
    from .device_pipeline import ESC_SLOTS
    E = ESC_SLOTS
    cand_has, cand_aq, cand_alen, cand_arh, cand_arl = \
        [], [], [], [], []
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
        cand_arh.append(jnp.where(
            h_e, jnp.take_along_axis(phf, jx[:, None], 1)[:, 0], 0))
        cand_arl.append(jnp.where(
            h_e, jnp.take_along_axis(plf, jx[:, None], 1)[:, 0], 0))
        pk_cur = jnp.where(qbf == aq_e[:, None], 0, pk_cur)
    left_over = jnp.any(pk_cur > 0, axis=1)
    hasx = jnp.stack(cand_has, axis=1)            # [B, E]
    x_aq = jnp.stack(cand_aq, axis=1)
    x_alen = jnp.stack(cand_alen, axis=1)
    x_arh = jnp.stack(cand_arh, axis=1)
    x_arl = jnp.stack(cand_arl, axis=1)
    hf = hasx.reshape(-1)
    dstx = jnp.cumsum(hf.astype(jnp.int32)) - 1
    n_hf = jnp.sum(hf.astype(jnp.int32))
    src_be = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, E)).reshape(-1)
    # tiered passes (see the int32 twin's comment)
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
        arxh = jnp.zeros(M, jnp.int32).at[scm].set(
            x_arh.reshape(-1), mode="drop")
        arxl = jnp.zeros(M, jnp.int32).at[scm].set(
            x_arl.reshape(-1), mode="drop")

        def run(_):
            return extend_chains_wide(
                text_w, reads, lens, bx, aqx, alx, arxh, arxl,
                l_pac=l_pac, o_del=o_del, e_del=e_del, o_ins=o_ins,
                e_ins=e_ins, match=match, mismatch=mismatch,
                pen_clip5=pen_clip5, pen_clip3=pen_clip3, w=w,
                zdrop=zdrop)

        def skip(_):
            z = jnp.zeros(M, jnp.int32)
            return z, z, z, z, z, z, z

        return okm, jax.lax.cond(jnp.any(okm), run, skip, None)

    ok_s, res_s = x_pass(M3a, use_small)
    ok_b, res_b = x_pass(M3b, ~use_small)
    okx = ok_s | ok_b
    okg2 = okx.reshape(B, E)

    def back(i):
        v = jnp.where(ok_s, res_s[i][jnp.clip(dstx, 0, M3a - 1)],
                      res_b[i][jnp.clip(dstx, 0, M3b - 1)])
        return jnp.where(okg2, v.reshape(B, E), 0).astype(jnp.int32)

    qb = jnp.concatenate([qb, back(0)], axis=1)
    qe = jnp.concatenate([qe, back(1)], axis=1)
    rb_h = jnp.concatenate([rb_h, back(2)], axis=1)
    rb_l = jnp.concatenate([rb_l, back(3)], axis=1)
    re_h = jnp.concatenate([re_h, back(4)], axis=1)
    re_l = jnp.concatenate([re_l, back(5)], axis=1)
    score = jnp.concatenate([score, back(6)], axis=1)
    weight = jnp.concatenate(
        [ch["weight"], jnp.where(okg2, x_alen, 0)], axis=1)
    keep = jnp.concatenate([keep, okg2], axis=1)
    aq = jnp.concatenate([aq, jnp.where(okg2, x_aq, 0)], axis=1)
    alen = jnp.concatenate([alen, jnp.where(okg2, x_alen, 0)], axis=1)
    arh = jnp.concatenate([arh, jnp.where(okg2, x_arh, 0)], axis=1)
    arl = jnp.concatenate([arl, jnp.where(okg2, x_arl, 0)], axis=1)
    esc_over = (hf & ~okx).reshape(B, E).sum(axis=1).astype(jnp.int32) \
        + left_over.astype(jnp.int32)
    return dict(qb=qb, qe=qe, rb_h=rb_h, rb_l=rb_l, re_h=re_h,
                re_l=re_l, score=score,
                weight=weight, keep=keep, rep_cov=s1["rep_cov"],
                n_dp=n_dp, anchor_q=aq, anchor_len=alen,
                anchor_rh=arh, anchor_rl=arl,
                occ_clip=s1["occ_clip"], seeds_full=s1["seeds_full"],
                n_seg=ch["n_seg"], esc_over=esc_over)


@functools.partial(jax.jit, static_argnames=(
    "l_pac", "max_seeds", "min_seed_len", "max_occ", "k_occ",
    "band", "max_chain_gap", "drop_ratio", "max_chains",
    "o_del", "e_del", "o_ins", "e_ins", "match", "mismatch",
    "pen_clip5", "pen_clip3", "w", "zdrop",
    "split_len", "split_width", "min_chain_weight",
    "max_chain_extend", "max_mem_intv"))
def seed_chain_extend_packed_wide(fm: DeviceFMIndexHiLo, text_w, reads,
                                  lens, l_pac: int, **kw):
    """Wide twin of ``seed_chain_extend_packed``: ONE int32 tensor
    [B, 13*S + 6] (S = max_chains + 1 region slots).  Column layout:
    qb, qe, rb_h, rb_l, re_h, re_l, score, weight, keep, anchor_q,
    anchor_len, anchor_rh, anchor_rl (S columns each), then rep_cov,
    n_dp, occ_clip, seeds_full, n_seg, esc_over.
    """
    out = seed_chain_extend_wide(fm, text_w, reads, lens,
                                 l_pac=l_pac, **kw)
    B = reads.shape[0]
    cols = [out[k].astype(jnp.int32) for k in
            ("qb", "qe", "rb_h", "rb_l", "re_h", "re_l", "score",
             "weight")]
    cols.append(out["keep"].astype(jnp.int32))
    cols += [out[k].astype(jnp.int32) for k in
             ("anchor_q", "anchor_len", "anchor_rh", "anchor_rl")]
    extra = jnp.stack([
        out["rep_cov"].astype(jnp.int32),
        jnp.broadcast_to(out["n_dp"].astype(jnp.int32).reshape(-1)[:1],
                         (B,)),
        out["occ_clip"].astype(jnp.int32),
        out["seeds_full"].astype(jnp.int32),
        out["n_seg"].astype(jnp.int32),
        out["esc_over"].astype(jnp.int32)], axis=1)
    return jnp.concatenate(cols + [extra], axis=1)


def unpack_stage1_wide(arr, n_slots: int):
    """Host-side inverse of seed_chain_extend_packed_wide: joins the
    (hi, lo) planes into int64 rb/re/anchor_r — the SAME key set the
    int32 ``unpack_stage1`` returns, so the host aligner is
    representation-agnostic downstream.  ``n_slots`` = max_chains
    + 1 (the per-seed second-extension slot)."""
    C = n_slots
    names = ("qb", "qe", "rb_h", "rb_l", "re_h", "re_l", "score",
             "weight", "keep", "anchor_q", "anchor_len", "anchor_rh",
             "anchor_rl")
    raw = {}
    for i, k in enumerate(names):
        raw[k] = arr[:, i * C:(i + 1) * C]
    base = len(names) * C

    def join(h, l):
        return h.astype(np.int64) * (1 << LO_BITS) + l.astype(np.int64)

    out = {
        "qb": raw["qb"], "qe": raw["qe"],
        "rb": join(raw["rb_h"], raw["rb_l"]),
        "re": join(raw["re_h"], raw["re_l"]),
        "score": raw["score"], "weight": raw["weight"],
        "keep": raw["keep"].astype(bool),
        "anchor_q": raw["anchor_q"], "anchor_len": raw["anchor_len"],
        "anchor_r": join(raw["anchor_rh"], raw["anchor_rl"]),
        "rep_cov": arr[:, base],
        "n_dp": arr[:, base + 1],
        "occ_clip": arr[:, base + 2],
        "seeds_full": arr[:, base + 3],
        "n_seg": arr[:, base + 4],
        "esc_over": arr[:, base + 5],
    }
    return out
