"""Wide (hi/lo) twin of the fully fused single-dispatch alignment
program (``align.device_full.align_full``) — the production path for
single shards whose 2L text exceeds 2^31.

Identical structure and semantics (see device_full's docstring for
the dedup/mark derivation and the fusion rationale); text POSITIONS
ride as (hi, lo) int32 pairs and the global-DP window gathers read
the 2-bit packed text.  The packed region block therefore carries 12
fields per region (rb/re split into planes):

    qb, qe, rb_h, rb_l, re_h, re_l, score, sub, subn, sec, flags,
    dprow

followed by the same 7 extra columns as the int32 layout.  The host
adapter (aligner._regions_fields) joins the planes back to int64 so
one host unpacking path serves both layouts.

Pinned by tests/test_aligner_wide.py: identical records vs the int32
aligner on the reference corpora.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.fm_hilo import hl_add_small, hl_lt, hl_sub
from .device_full import FLAG_EMIT, FLAG_OVER, FLAG_PERFECT, FLAG_WIDE, \
    _mark_walk_order, _resort
from .device_pipeline import dp_rows, global_and_traceback
from .device_pipeline_wide import (_clamp32, _gather_codes, _hl_max,
                                   _hl_min, seed_chain_extend_wide)

NFIELD_W = 12


def _dedup_walk_order_wide(score, rb_h, rb_l, qb, re_h, re_l, valid):
    """(-score, rb, qb, re) walk order with pair keys: successive
    stable argsorts, least-significant first, each pair contributing
    its lo then hi plane."""
    BIG = jnp.int32(0x3FFFFFFF)
    order = jnp.argsort(jnp.where(valid, re_l, BIG), axis=1, stable=True)
    order = _resort(order, jnp.where(valid, re_h, BIG))
    order = _resort(order, jnp.where(valid, qb, BIG))
    order = _resort(order, jnp.where(valid, rb_l, BIG))
    order = _resort(order, jnp.where(valid, rb_h, BIG))
    order = _resort(order, jnp.where(valid, -score, BIG))
    return order


@functools.partial(jax.jit, static_argnames=(
    "l_pac", "max_seeds", "min_seed_len", "max_occ", "k_occ",
    "band", "max_chain_gap", "drop_ratio", "max_chains",
    "o_del", "e_del", "o_ins", "e_ins", "match", "mismatch",
    "pen_clip5", "pen_clip3", "w", "zdrop", "T",
    "mask_level", "mask_level_redun", "glob_band",
    "split_len", "split_width", "min_chain_weight",
    "max_chain_extend", "max_mem_intv"))
def align_full_wide(fm, text_w, enc_lens, l_pac: int,
                    max_seeds: int = 16, min_seed_len: int = 19,
                    max_occ: int = 500, k_occ: int = 16,
                    band: int = 100, max_chain_gap: int = 10000,
                    drop_ratio: float = 0.5, max_chains: int = 4,
                    o_del: int = 6, e_del: int = 1, o_ins: int = 6,
                    e_ins: int = 1, match: int = 1, mismatch: int = 4,
                    pen_clip5: int = 5, pen_clip3: int = 5, w: int = 100,
                    zdrop: int = 0, T: int = 30,
                    mask_level: float = 0.5,
                    mask_level_redun: float = 0.95,
                    glob_band: int = 208,
                    split_len: int = 28, split_width: int = 10,
                    min_chain_weight: int = 0,
                    max_chain_extend: int = 1 << 30,
                    max_mem_intv: int = 20):
    """Wide twin of ``align_full``; returns (regions int32
    [B, C*NFIELD_W + 7], snm int32 [M2, 2], ops uint8 [M2, Tp])."""
    B = enc_lens.shape[0]
    L = enc_lens.shape[1] - 4
    reads = enc_lens[:, :L]
    lb = enc_lens[:, L:].astype(jnp.int32)
    lens = lb[:, 0] | (lb[:, 1] << 8) | (lb[:, 2] << 16) | (lb[:, 3] << 24)

    out = seed_chain_extend_wide(
        fm, text_w, reads, lens, l_pac=l_pac, max_seeds=max_seeds,
        min_seed_len=min_seed_len, max_occ=max_occ, k_occ=k_occ,
        band=band, max_chain_gap=max_chain_gap, drop_ratio=drop_ratio,
        max_chains=max_chains, o_del=o_del, e_del=e_del, o_ins=o_ins,
        e_ins=e_ins, match=match, mismatch=mismatch,
        pen_clip5=pen_clip5, pen_clip3=pen_clip3, w=w, zdrop=zdrop,
        split_len=split_len, split_width=split_width,
        min_chain_weight=min_chain_weight,
        max_chain_extend=max_chain_extend,
        max_mem_intv=max_mem_intv)
    C = out["keep"].shape[1]       # max_chains + second-ext slot
    valid0 = out["keep"]
    qb0, qe0 = out["qb"], out["qe"]
    rbh0, rbl0 = out["rb_h"], out["rb_l"]
    reh0, rel0 = out["re_h"], out["re_l"]
    sc0 = out["score"]

    order1 = _dedup_walk_order_wide(sc0, rbh0, rbl0, qb0, reh0, rel0,
                                    valid0)

    def pick(x, order):
        return jnp.take_along_axis(x, order, axis=1)

    qb, qe = pick(qb0, order1), pick(qe0, order1)
    rbh, rbl = pick(rbh0, order1), pick(rbl0, order1)
    reh, rel = pick(reh0, order1), pick(rel0, order1)
    score = pick(sc0, order1)
    valid = pick(valid0, order1)

    # ---- mem_sort_dedup_patch ----------------------------------------
    # overlap arithmetic on pairs, clamped to int32 at the end: two
    # far-apart regions clamp to a large NEGATIVE inter, which fails
    # ``inter > 0`` exactly like the unclamped value would
    dup = jnp.zeros((B, C), bool)
    for j in range(1, C):
        dj = jnp.zeros((B,), bool)
        for i in range(j):
            mn_h, mn_l = _hl_min(reh[:, i], rel[:, i],
                                 reh[:, j], rel[:, j])
            mx_h, mx_l = _hl_max(rbh[:, i], rbl[:, i],
                                 rbh[:, j], rbl[:, j])
            inter = _clamp32(*hl_sub(mn_h, mn_l, mx_h, mx_l))
            sp_i = _clamp32(*hl_sub(reh[:, i], rel[:, i],
                                    rbh[:, i], rbl[:, i]))
            sp_j = _clamp32(*hl_sub(reh[:, j], rel[:, j],
                                    rbh[:, j], rbl[:, j]))
            minw = jnp.minimum(sp_i, sp_j)
            qover = jnp.minimum(qe[:, i], qe[:, j]) \
                - jnp.maximum(qb[:, i], qb[:, j])
            o = (inter > 0) \
                & (inter.astype(jnp.float32)
                   >= mask_level_redun * minw.astype(jnp.float32)) \
                & (qover > 0)
            dj = dj | (valid[:, i] & ~dup[:, i] & o)
        dup = dup.at[:, j].set(dup[:, j] | (valid[:, j] & dj))

    order2 = _mark_walk_order(score, valid & ~dup)
    qb, qe = pick(qb, order2), pick(qe, order2)
    rbh, rbl = pick(rbh, order2), pick(rbl, order2)
    reh, rel = pick(reh, order2), pick(rel, order2)
    score = pick(score, order2)
    live_m = pick(valid & ~dup, order2)

    # ---- mem_mark_primary_se (query-space only: unchanged) -----------
    NEG1 = jnp.full((B,), -1, jnp.int32)
    sec = [NEG1 for _ in range(C)]
    sub = [jnp.zeros((B,), jnp.int32) for _ in range(C)]
    subn = [jnp.zeros((B,), jnp.int32) for _ in range(C)]
    live = [live_m[:, j] for j in range(C)]
    for j in range(1, C):
        placed = jnp.zeros((B,), bool)
        for i in range(j):
            emin = jnp.minimum(qe[:, i], qe[:, j])
            bmax = jnp.maximum(qb[:, i], qb[:, j])
            minl = jnp.minimum(qe[:, i] - qb[:, i],
                               qe[:, j] - qb[:, j])
            ov = (emin > bmax) \
                & ((emin - bmax).astype(jnp.float32)
                   >= mask_level * minl.astype(jnp.float32))
            hit = live[j] & live[i] & (sec[i] == -1) & ov & ~placed
            sec[j] = jnp.where(hit, i, sec[j])
            sub[i] = jnp.where(hit & (sub[i] == 0), score[:, j], sub[i])
            sub_tmp = max(match + mismatch, o_del + e_del,
                          o_ins + e_ins)
            subn[i] = jnp.where(
                hit & (score[:, i] - score[:, j] <= sub_tmp),
                subn[i] + 1, subn[i])
            placed = placed | hit
    sec_a = jnp.stack(sec, axis=1)
    sub_a = jnp.stack(sub, axis=1)
    subn_a = jnp.stack(subn, axis=1)
    live_a = jnp.stack(live, axis=1)

    # ---- global-DP row compaction ------------------------------------
    Lt = L + min(2 * w, 128)
    span_t = _clamp32(*hl_sub(reh, rel, rbh, rbl))
    span_q = qe - qb
    wide = live_a & ((span_t > Lt) | (span_q > L))
    perfect = live_a & (score == span_q * match) & (span_t == span_q)
    need = (live_a & ~wide & ~perfect & (score >= T)).reshape(-1)
    dest = jnp.cumsum(need.astype(jnp.int32)) - 1
    M2 = dp_rows(B)
    over = need & (dest >= M2)
    scat = jnp.where(need & ~over, dest, M2)
    src_b = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, C)).reshape(-1)
    g_b = jnp.full(M2, 0, jnp.int32).at[scat].set(src_b, mode="drop")
    g_qb = jnp.zeros(M2, jnp.int32).at[scat].set(qb.reshape(-1),
                                                 mode="drop")
    g_qe = jnp.zeros(M2, jnp.int32).at[scat].set(qe.reshape(-1),
                                                 mode="drop")
    g_rbh = jnp.zeros(M2, jnp.int32).at[scat].set(rbh.reshape(-1),
                                                  mode="drop")
    g_rbl = jnp.zeros(M2, jnp.int32).at[scat].set(rbl.reshape(-1),
                                                  mode="drop")
    g_tl = jnp.zeros(M2, jnp.int32).at[scat].set(
        span_t.reshape(-1), mode="drop")
    g_n = jnp.sum((need & ~over).astype(jnp.int32))

    jq = jnp.arange(L, dtype=jnp.int32)[None, :]
    ql_g = g_qe - g_qb
    qwin = jnp.take_along_axis(
        reads[g_b], jnp.clip(g_qb[:, None] + jq, 0, L - 1), axis=1)
    qwin = jnp.where(jq < ql_g[:, None], qwin, 4).astype(jnp.uint8)
    jt = jnp.arange(Lt, dtype=jnp.int32)[None, :]
    tl_g = jnp.minimum(g_tl, Lt)
    tp_h, tp_l = hl_add_small(
        jnp.broadcast_to(g_rbh[:, None], (M2, Lt)),
        jnp.broadcast_to(g_rbl[:, None], (M2, Lt)),
        jnp.broadcast_to(jt, (M2, Lt)))
    twin = _gather_codes(text_w, tp_h, tp_l,
                         jt < tl_g[:, None]).astype(jnp.uint8)

    gscore, packed, nm = global_and_traceback(
        qwin, ql_g, twin, tl_g, o_del=o_del, e_del=e_del, o_ins=o_ins,
        e_ins=e_ins, match=match, mismatch=mismatch, band=glob_band)
    snm = jnp.stack([gscore.astype(jnp.int32), nm.astype(jnp.int32)],
                    axis=1)

    # ---- packed per-region output ------------------------------------
    flags = (live_a.astype(jnp.int32) * FLAG_EMIT
             | wide.astype(jnp.int32) * FLAG_WIDE
             | over.reshape(B, C).astype(jnp.int32) * FLAG_OVER
             | perfect.astype(jnp.int32) * FLAG_PERFECT)
    dprow = jnp.where(need.reshape(B, C) & ~over.reshape(B, C),
                      dest.reshape(B, C), -1)
    fields = jnp.stack([qb, qe, rbh, rbl, reh, rel, score, sub_a,
                        subn_a, sec_a, flags, dprow], axis=2)
    extra = jnp.stack([
        out["rep_cov"].astype(jnp.int32),
        jnp.sum(live_a, axis=1).astype(jnp.int32),
        out["occ_clip"].astype(jnp.int32),
        out["seeds_full"].astype(jnp.int32),
        out["n_seg"].astype(jnp.int32),
        jnp.broadcast_to(g_n, (B,)).astype(jnp.int32),
        jnp.broadcast_to(out["n_dp"].reshape(-1)[:1], (B,)
                         ).astype(jnp.int32),
        out["esc_over"].astype(jnp.int32),
    ], axis=1)
    regions = jnp.concatenate(
        [fields.reshape(B, C * NFIELD_W), extra], axis=1)
    return regions, snm, packed
