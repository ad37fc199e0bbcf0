"""Fully fused single-dispatch alignment program.

One jitted program runs the ENTIRE per-batch device pipeline — seed
scan, SA locate, chaining, extension (seed_chain_extend), then
mem_sort_dedup_patch + mem_mark_primary_se (ported bit-exactly from
aligner._dedup_and_mark's host logic), region window gathers, banded
global DP and on-device traceback — so a batch costs ONE host->device
upload and ONE fetch of packed results.  The host keeps only float64
MAPQ arithmetic, T filtering, contig-id resolution, and record
assembly (aligner semantics unchanged;
/root/reference/src/BWAAligner.cpp:104-241).

Motivation: through a remote device link every jit call and every
fetched buffer is a ~30 ms round trip; the previous pipeline spent 4+
round trips per batch on intermediate region lists.  On co-located
hardware the fusion removes host<->device synchronisation stalls the
same way.

Region slots per read stay C = max_chains; deduped regions are
compacted into M2 = dp_rows(B) global-DP rows (overflow and
>narrow-window spans are flagged for the host's fallback paths, never
dropped silently).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .device_pipeline import (dp_rows, global_and_traceback,
                              seed_chain_extend)

# field indices of the per-region output block
F_QB, F_QE, F_RB, F_RE, F_SCORE, F_SUB, F_SUBN, F_SEC, F_FLAGS, \
    F_DPROW = range(10)
NFIELD = 10
FLAG_EMIT = 1          # valid, non-dup region
FLAG_WIDE = 2          # span exceeds the narrow DP window (host path)
FLAG_OVER = 4          # no DP slot left (host path)
FLAG_PERFECT = 8       # exact match: CIGAR = one M run, NM 0


_M64 = (1 << 64) - 1


def _hash64(key: int) -> int:
    """Thomas Wang's 64-bit mix (bwa's hash_64): the equal-score
    tie-break used by mem_mark_primary_se."""
    key = (key + (~(key << 32) & _M64)) & _M64
    key ^= key >> 22
    key = (key + (~(key << 13) & _M64)) & _M64
    key ^= key >> 8
    key = (key + (key << 3)) & _M64
    key ^= key >> 15
    key = (key + (~(key << 27) & _M64)) & _M64
    key ^= key >> 31
    return key


def _resort(order, key):
    """One pass of a stable lexsort emulation: refine ``order`` by a
    new (less significant keys already applied) sort key."""
    k = jnp.take_along_axis(key, order, axis=1)
    o2 = jnp.argsort(k, axis=1, stable=True)
    return jnp.take_along_axis(order, o2, axis=1)


def _dedup_walk_order(score, rb, qb, re, valid):
    """Per-read dedup walk order: (-score, rb, qb, re), invalid slots
    last — bwa's mem_sort_dedup_patch array order (mem_ars sort), which
    is also the basis for the primary-marking hash rank (successive
    stable argsorts emulate a lexsort)."""
    BIG = jnp.int32(0x3FFFFFFF)
    order = jnp.argsort(jnp.where(valid, re, BIG), axis=1, stable=True)
    order = _resort(order, jnp.where(valid, qb, BIG))
    order = _resort(order, jnp.where(valid, rb, BIG))
    order = _resort(order, jnp.where(valid, -score, BIG))
    return order


def _mark_walk_order(score, live):
    """Post-dedup primary-marking order (bwa mem_mark_primary_se with
    id = 0): score desc, ties broken by hash_64(i) where i is the
    region's index in the post-dedup (-score, rb, qb) array — the
    caller's CURRENT slot order with dup slots masked out.  Mirrors
    aligner._dedup_and_mark exactly (the round-2 version ranked
    pre-dedup slots, which could disagree with the host path when
    duplicates were present — ADVICE r2)."""
    import numpy as _np
    BIG = jnp.int32(0x3FFFFFFF)
    C = score.shape[1]
    rank = jnp.cumsum(live.astype(jnp.int32), axis=1) - 1
    hashes = _np.array([_hash64(i) for i in range(C)])
    hrank = jnp.asarray(_np.argsort(_np.argsort(hashes)), jnp.int32)
    k_tie = jnp.where(live, hrank[jnp.clip(rank, 0, C - 1)], BIG)
    order = jnp.argsort(k_tie, axis=1, stable=True)
    order = _resort(order, jnp.where(live, -score, BIG))
    return order


@functools.partial(jax.jit, static_argnames=(
    "l_pac", "max_seeds", "min_seed_len", "max_occ", "k_occ",
    "band", "max_chain_gap", "drop_ratio", "max_chains",
    "o_del", "e_del", "o_ins", "e_ins", "match", "mismatch",
    "pen_clip5", "pen_clip3", "w", "zdrop", "T",
    "mask_level", "mask_level_redun", "glob_band",
    "split_len", "split_width", "min_chain_weight",
    "max_chain_extend", "max_mem_intv"))
def align_full(fm, text, enc_lens, l_pac: int,
               max_seeds: int = 16, min_seed_len: int = 19,
               max_occ: int = 500, k_occ: int = 16,
               band: int = 100, max_chain_gap: int = 10000,
               drop_ratio: float = 0.5, max_chains: int = 4,
               o_del: int = 6, e_del: int = 1, o_ins: int = 6,
               e_ins: int = 1, match: int = 1, mismatch: int = 4,
               pen_clip5: int = 5, pen_clip3: int = 5, w: int = 100,
               zdrop: int = 0, T: int = 30,
               mask_level: float = 0.5, mask_level_redun: float = 0.95,
               glob_band: int = 208,
               split_len: int = 28, split_width: int = 10,
               min_chain_weight: int = 0,
               max_chain_extend: int = 1 << 30,
               max_mem_intv: int = 20):
    """enc_lens: uint8 [B, L+4] — nt4 codes with the read length packed
    little-endian into the last 4 columns (single upload buffer).

    Returns (regions int32 [B, S*NFIELD + 8] with S = max_chains+1
    region slots, snm int32 [M2, 2], ops uint8 [M2, Tp]).
    """
    B = enc_lens.shape[0]
    L = enc_lens.shape[1] - 4
    reads = enc_lens[:, :L]
    lb = enc_lens[:, L:].astype(jnp.int32)
    lens = lb[:, 0] | (lb[:, 1] << 8) | (lb[:, 2] << 16) | (lb[:, 3] << 24)

    out = seed_chain_extend(
        fm, text, reads, lens, l_pac=l_pac, max_seeds=max_seeds,
        min_seed_len=min_seed_len, max_occ=max_occ, k_occ=k_occ,
        band=band, max_chain_gap=max_chain_gap, drop_ratio=drop_ratio,
        max_chains=max_chains, o_del=o_del, e_del=e_del, o_ins=o_ins,
        e_ins=e_ins, match=match, mismatch=mismatch,
        pen_clip5=pen_clip5, pen_clip3=pen_clip3, w=w, zdrop=zdrop,
        split_len=split_len, split_width=split_width,
        min_chain_weight=min_chain_weight,
        max_chain_extend=max_chain_extend,
        max_mem_intv=max_mem_intv)
    C = out["keep"].shape[1]       # max_chains + the per-seed
    valid0 = out["keep"]           # second-extension slot
    qb0, qe0 = out["qb"], out["qe"]
    rb0, re0 = out["rb"], out["re"]
    sc0 = out["score"]

    order1 = _dedup_walk_order(sc0, rb0, qb0, re0, valid0)

    def pick(x, order):
        return jnp.take_along_axis(x, order, axis=1)

    qb, qe = pick(qb0, order1), pick(qe0, order1)
    rb, re = pick(rb0, order1), pick(re0, order1)
    score = pick(sc0, order1)
    valid = pick(valid0, order1)

    # ---- mem_sort_dedup_patch (host _dedup_and_mark part 1) ----------
    dup = jnp.zeros((B, C), bool)
    for j in range(1, C):
        dj = jnp.zeros((B,), bool)
        for i in range(j):
            inter = jnp.minimum(re[:, i], re[:, j]) \
                - jnp.maximum(rb[:, i], rb[:, j])
            minw = jnp.minimum(re[:, i] - rb[:, i],
                               re[:, j] - rb[:, j])
            qover = jnp.minimum(qe[:, i], qe[:, j]) \
                - jnp.maximum(qb[:, i], qb[:, j])
            o = (inter > 0) \
                & (inter.astype(jnp.float32)
                   >= mask_level_redun * minw.astype(jnp.float32)) \
                & (qover > 0)
            dj = dj | (valid[:, i] & ~dup[:, i] & o)
        dup = dup.at[:, j].set(dup[:, j] | (valid[:, j] & dj))

    # re-sort for the marking walk: hash rank over POST-dedup survivors
    # only (same rank basis as the host path)
    order2 = _mark_walk_order(score, valid & ~dup)
    qb, qe = pick(qb, order2), pick(qe, order2)
    rb, re = pick(rb, order2), pick(re, order2)
    score = pick(score, order2)
    live_m = pick(valid & ~dup, order2)

    # ---- mem_mark_primary_se (part 2) --------------------------------
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
            # bwa's tmp = max(a+b, o_del+e_del, o_ins+e_ins)
            # (mem_mark_primary_se_core sub_n rule)
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
    span_t = re - rb
    span_q = qe - qb
    wide = live_a & ((span_t > Lt) | (span_q > L))
    # a region whose extension score equals span*match with equal
    # query/target spans is necessarily an exact match (any mismatch
    # or gap strictly lowers the DP optimum): its CIGAR is one M run
    # with NM 0 and it needs no DP row
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
    g_rb = jnp.zeros(M2, jnp.int32).at[scat].set(rb.reshape(-1),
                                                 mode="drop")
    g_re = jnp.zeros(M2, jnp.int32).at[scat].set(re.reshape(-1),
                                                 mode="drop")
    g_n = jnp.sum((need & ~over).astype(jnp.int32))

    jq = jnp.arange(L, dtype=jnp.int32)[None, :]
    ql_g = g_qe - g_qb
    qwin = jnp.take_along_axis(
        reads[g_b], jnp.clip(g_qb[:, None] + jq, 0, L - 1), axis=1)
    qwin = jnp.where(jq < ql_g[:, None], qwin, 4).astype(jnp.uint8)
    jt = jnp.arange(Lt, dtype=jnp.int32)[None, :]
    tl_g = g_re - g_rb
    twin = text[jnp.clip(g_rb[:, None] + jt, 0, text.shape[0] - 1)]
    twin = jnp.where(jt < tl_g[:, None], twin, 4).astype(jnp.uint8)

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
    fields = jnp.stack([qb, qe, rb, re, score, sub_a, subn_a, sec_a,
                        flags, dprow], axis=2)          # [B, C, NFIELD]
    extra = jnp.stack([
        out["rep_cov"].astype(jnp.int32),
        jnp.sum(live_a, axis=1).astype(jnp.int32),      # n_regs (NA)
        out["occ_clip"].astype(jnp.int32),
        out["seeds_full"].astype(jnp.int32),
        out["n_seg"].astype(jnp.int32),
        jnp.broadcast_to(g_n, (B,)).astype(jnp.int32),
        jnp.broadcast_to(out["n_dp"].reshape(-1)[:1], (B,)
                         ).astype(jnp.int32),           # ext DP slots used
        out["esc_over"].astype(jnp.int32),
    ], axis=1)
    regions = jnp.concatenate(
        [fields.reshape(B, C * NFIELD), extra], axis=1)
    return regions, snm, packed
