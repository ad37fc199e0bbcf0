"""Batched affine-gap DP (Smith-Waterman extension + global alignment).

TPU-native replacement for libbwa's ksw_extend / ksw_global (consumed
via ``mem_align1`` / ``mem_reg2aln`` at
/root/reference/src/BWAAligner.cpp:104-129).  Design:

* batch dimension is vectorized across VPU lanes; the target axis is
  vectorized within a row; query rows run in a ``lax.fori_loop``.
* the same-row E (deletion) dependency is resolved with the running-max
  trick:  E(j) = max_{j'<j}(Hnd(j') + e*j') - o - e*j  computed by an
  associative cummax scan — no sequential inner loop.
* extension returns (max score, qle, tle, gscore, gtle) like
  ksw_extend; global returns a packed direction matrix for host
  traceback into CIGARs.

Pure JAX (jit/shard_map/vmap-friendly); used on CPU in tests and on
TPU in production.  A hand-tuned Pallas variant can be swapped in via
the same signatures (ops/sw_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG = -0x40000000  # -inf surrogate that survives additions


def _row_scan_E(hnd: jax.Array, o_del: int, e_del: int) -> jax.Array:
    """E(j) for one DP row given Hnd = H-without-E of the SAME row.

    E(i,j) = max_{j'<j}( Hnd(i,j') - o_del - e_del*(j-j') ).
    hnd: [..., T+1] over target boundary+positions.
    """
    T1 = hnd.shape[-1]
    j = jnp.arange(T1, dtype=jnp.int32)
    g = hnd + e_del * j
    cm = jax.lax.associative_scan(jnp.maximum, g, axis=-1)
    # shift right: max over j' <= j-1
    cm = jnp.concatenate([jnp.full(cm.shape[:-1] + (1,), NEG, cm.dtype),
                          cm[..., :-1]], axis=-1)
    return cm - o_del - e_del * j


_PACK_BIAS = 1 << 16
_PACK_SHIFT = 12  # low bits carry (4095 - row index) for tie-breaks


def _pack(h: jax.Array, i) -> jax.Array:
    """Pack (score, row) so elementwise max prefers higher score, then
    the EARLIEST row (bwa keeps the first strict max)."""
    return (h + _PACK_BIAS) * (1 << _PACK_SHIFT) + (4095 - i)


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins",
                                             "e_ins", "match", "mismatch",
                                             "zdrop", "band"))
def extend_batch(query: jax.Array, qlen: jax.Array,
                 target: jax.Array, tlen: jax.Array,
                 h0: jax.Array,
                 o_del: int = 6, e_del: int = 1,
                 o_ins: int = 6, e_ins: int = 1,
                 match: int = 1, mismatch: int = 4,
                 zdrop: int = 0, band: int = 0):
    """Batched seed extension (ksw_extend semantics incl. zdrop).

    query/target: int8/int32 nt4 codes [B, Lq] / [B, Lt] (4 = N,
    scores as mismatch).  h0: initial score at origin [B].

    The row loop is purely elementwise — running maxima are packed
    (score, row) int32s per target column; the cross-lane reductions
    (max/argmax) happen ONCE after the loop, which keeps the VPU on
    lane-local work.  With zdrop > 0, lanes whose row maximum falls
    more than ``zdrop + e*|diag divergence|`` below their running best
    stop early (bwa's Z-dropoff, the break in ksw_extend's row loop;
    consumed by the reference via mem_opt_t.zdrop,
    /root/reference/src/BWAAligner.cpp:36-41) — this costs one row
    max+argmax reduction per row, skipped entirely when zdrop == 0.

    With ``band > 0``, DP cells outside the diagonal band
    ``|j - (i+1)| <= band`` are -inf — ksw_extend's static band
    (``beg1 = max(beg, i-w); end1 = min(end, i+w+1)``; the reference
    passes mem_opt_t.w = 100).  band == 0 computes the full rectangle
    (a superset: its optimum >= the banded optimum).  Same convention
    as ``global_batch``'s band.

    Returns dict: score, qle, tle (position of the max, lengths
    consumed), gscore, gtle (best score consuming the whole query).
    """
    B, Lq = query.shape
    _, Lt = target.shape
    jt = jnp.arange(Lt + 1, dtype=jnp.int32)
    trow = target.astype(jnp.int32)

    # row 0: H(0,j) = h0 - (o_del + e_del*j), floor NEG outside
    h_row0 = h0[:, None] - jnp.where(jt > 0, o_del + e_del * jt, 0)
    h_row0 = jnp.where(h_row0 < 0, NEG, h_row0)  # prune dead-origin cells
    h_row0 = h_row0.at[:, 0].set(h0)
    tmask = jt[None, :] <= tlen[:, None]          # valid target boundary
    h_row0 = jnp.where(tmask, h_row0, NEG)
    if band > 0:
        # strict band: row 0 included (cells outside |j - R| <= band
        # are dead in EVERY plane, F included — see body)
        h_row0 = jnp.where(jt[None, :] <= band, h_row0, NEG)

    neg_row = jnp.full((B, Lt + 1), NEG, jnp.int32)
    init = (h_row0.astype(jnp.int32), neg_row,
            neg_row,  # best_pack per column
            neg_row,  # g_row: final-query-row scores
            (h0.astype(jnp.int32),                # zbest (row-max running)
             jnp.zeros(B, jnp.int32),             # zbest_i
             jnp.zeros(B, jnp.int32),             # zbest_j
             jnp.zeros(B, dtype=bool)))           # stopped

    def body(i, st):
        h_prev, f_prev, best_pack, g_row, zst = st
        zbest, zbi, zbj, stopped = zst
        qi = query[:, i].astype(jnp.int32)                    # [B]
        is_match = (trow == qi[:, None]) & (trow < 4) & (qi[:, None] < 4)
        sub = jnp.where(is_match, match, -mismatch)           # [B, Lt]
        M = h_prev[:, :-1] + sub                              # ends at j>=1
        F = jnp.maximum(h_prev - (o_ins + e_ins),
                        f_prev - e_ins)                       # [B, Lt+1]
        hnd = jnp.concatenate(
            [jnp.maximum(F[:, :1], NEG), jnp.maximum(M, F[:, 1:])], axis=1)
        if band > 0:
            in_band = jnp.abs(jt[None, :] - (i + 1)) <= band
            hnd = jnp.where(in_band, hnd, NEG)
            F = jnp.where(in_band, F, NEG)   # strict band: F dead too
        E = _row_scan_E(hnd, o_del, e_del)
        h = jnp.maximum(hnd, E)
        h = jnp.where(tmask, h, NEG)
        if band > 0:
            h = jnp.where(in_band, h, NEG)
        active = ((i < qlen) & ~stopped)[:, None]             # [B, 1]
        h = jnp.where(active, h, h_prev)
        f = jnp.where(active, F, f_prev)
        # running packed max (elementwise only; j=0 column excluded);
        # clamp to -1 so packing never overflows on NEG sentinels
        hp = jnp.where(active & (jt[None, :] > 0),
                       jnp.maximum(h, -1), -1)
        best_pack = jnp.maximum(best_pack, _pack(hp, i))
        g_row = jnp.where(active & (i == qlen - 1)[:, None], h, g_row)
        if zdrop > 0:
            # bwa break condition, per lane: row max m at column mj;
            # if m <= best and best - m - e*|Δi - Δj| > zdrop, stop.
            rp = jnp.max((jnp.maximum(hp, -1) + 2) * 2048
                         + (2047 - jt[None, :]), axis=-1)
            m = rp // 2048 - 2
            mj = 2047 - rp % 2048
            act1 = active[:, 0]
            better = m > zbest
            di = i - zbi
            dj = mj - zbj
            gap = jnp.abs(di - dj)
            pen = jnp.where(di > dj, e_del, e_ins) * gap
            zstop = act1 & ~better & (zbest - m - pen > zdrop)
            stopped = stopped | zstop | (act1 & (m <= 0))
            zbest = jnp.where(act1 & better, m, zbest)
            zbi = jnp.where(act1 & better, i, zbi)
            zbj = jnp.where(act1 & better, mj, zbj)
        return (h, f, best_pack, g_row, (zbest, zbi, zbj, stopped))

    _, _, best_pack, g_row, _ = jax.lax.fori_loop(0, Lq, body, init)
    # single post-loop reductions
    col_best = jnp.max(best_pack, axis=-1)
    btle = jnp.argmax(best_pack, axis=-1).astype(jnp.int32)
    score = col_best // (1 << _PACK_SHIFT) - _PACK_BIAS
    bqle = 4095 - (col_best % (1 << _PACK_SHIFT)) + 1
    found = score > 0
    score = jnp.where(found, score, 0)
    bqle = jnp.where(found, bqle, 0)
    btle = jnp.where(found, btle, 0)
    gscore = jnp.max(g_row, axis=-1)
    gtle = jnp.argmax(g_row, axis=-1).astype(jnp.int32)
    return dict(score=score, qle=bqle, tle=btle,
                gscore=gscore, gtle=gtle)


def _local_pass(query, qlen, target, tlen, o_del, e_del, o_ins, e_ins,
                match, mismatch):
    """One local-SW forward pass: best (score, end_i, end_j) per lane.

    H(i,j) = max(0, H(i-1,j-1)+sub, E(i,j), F(i,j)) — the textbook
    Smith-Waterman recurrence (ksw_align's core, used by the reference
    through mem_matesw's mate rescue).  Ties keep the smallest end_i,
    then the smallest end_j."""
    B, Lq = query.shape
    _, Lt = target.shape
    jt = jnp.arange(Lt + 1, dtype=jnp.int32)
    trow = target.astype(jnp.int32)
    tmask = (jt[None, :] <= tlen[:, None]) & (jt[None, :] > 0)

    zero_row = jnp.zeros((B, Lt + 1), jnp.int32)
    neg_row = jnp.full((B, Lt + 1), NEG, jnp.int32)

    def body(i, st):
        h_prev, f_prev, best = st
        qi = query[:, i].astype(jnp.int32)
        is_match = (trow == qi[:, None]) & (trow < 4) & (qi[:, None] < 4)
        sub = jnp.where(is_match, match, -mismatch)
        M = h_prev[:, :-1] + sub
        F = jnp.maximum(h_prev - (o_ins + e_ins), f_prev - e_ins)
        hnd = jnp.concatenate(
            [neg_row[:, :1], jnp.maximum(M, F[:, 1:])], axis=1)
        E = _row_scan_E(hnd, o_del, e_del)
        h = jnp.maximum(jnp.maximum(hnd, E), 0)
        h = jnp.where(tmask, h, 0)
        active = (i < qlen)[:, None]
        h = jnp.where(active, h, h_prev)
        f = jnp.where(active, F, f_prev)
        # pack (score, -i, -j): max keeps the highest score, then the
        # SMALLEST i, then the smallest j.  9+11+11 = 31 bits: needs
        # score < 512 and Lq, Lt < 2048 (asserted by the caller).
        hp = jnp.minimum(jnp.where(active & tmask, h, 0), 511)
        pack = (hp << 22) | ((2047 - i) << 11) | (2047 - jt[None, :])
        best = jnp.maximum(best, jnp.max(pack, axis=1))
        return h, f, best

    _, _, best = jax.lax.fori_loop(
        0, Lq, body, (zero_row, neg_row, jnp.zeros(B, jnp.int32)))
    score = best >> 22
    ei = 2047 - ((best >> 11) & 0x7FF)
    ej = 2047 - (best & 0x7FF)
    found = score > 0
    return (jnp.where(found, score, 0),
            jnp.where(found, ei + 1, 0),      # query end (exclusive)
            jnp.where(found, ej, 0))          # target end (exclusive)


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins",
                                             "e_ins", "match", "mismatch"))
def local_batch(query: jax.Array, qlen: jax.Array,
                target: jax.Array, tlen: jax.Array,
                o_del: int = 6, e_del: int = 1,
                o_ins: int = 6, e_ins: int = 1,
                match: int = 1, mismatch: int = 4):
    """Batched local Smith-Waterman: score + [qb, qe) x [tb, te).

    Two passes: the forward pass finds the best end cell; the same DP
    over the reversed prefixes finds the start (the standard two-pass
    local-alignment trick).  Scores must fit 6 bits of headroom
    (score < 2^5 * 2^... — packed as score << 26, so score < 32
    * 1024; reads up to ~2 kb at match=1 are fine).

    Role: ksw_align for mem_matesw-style mate rescue
    (/root/reference's vendored bwa, submodule absent — semantics
    reconstructed; see align/pairing.py).

    Packing caps (asserted): Lq, Lt < 2048 and scores clamp at 511 —
    ample for read-vs-isize-window rescue."""
    B, Lq = query.shape
    _, Lt = target.shape
    assert Lq < 2048 and Lt < 2048, "local_batch: pack caps"
    score, qe, te = _local_pass(query, qlen, target, tlen,
                                o_del, e_del, o_ins, e_ins,
                                match, mismatch)
    # reversed prefixes: q_rev[k] = q[qe-1-k] (k < qe), t_rev likewise
    kq = jnp.arange(Lq, dtype=jnp.int32)[None, :]
    qr = jnp.take_along_axis(
        query.astype(jnp.int32), jnp.clip(qe[:, None] - 1 - kq, 0, Lq - 1),
        axis=1)
    qr = jnp.where(kq < qe[:, None], qr, 4).astype(query.dtype)
    kt = jnp.arange(Lt, dtype=jnp.int32)[None, :]
    tr = jnp.take_along_axis(
        target.astype(jnp.int32),
        jnp.clip(te[:, None] - 1 - kt, 0, Lt - 1), axis=1)
    tr = jnp.where(kt < te[:, None], tr, 4).astype(target.dtype)
    score2, qspan, tspan = _local_pass(qr, qe, tr, te,
                                       o_del, e_del, o_ins, e_ins,
                                       match, mismatch)
    qb = qe - qspan
    tb = te - tspan
    return dict(score=score, qb=qb, qe=qe, tb=tb, te=te)


# direction bits for global traceback
DIR_M, DIR_E, DIR_F = 0, 1, 2       # H source: diag / left(D) / up(I)
BIT_EEXT, BIT_FEXT = 4, 8
BIT_MIS = 16                        # q[i-1] != t[j-1] (for NM counting)


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins",
                                             "e_ins", "match", "mismatch",
                                             "band"))
def global_batch(query: jax.Array, qlen: jax.Array,
                 target: jax.Array, tlen: jax.Array,
                 o_del: int = 6, e_del: int = 1,
                 o_ins: int = 6, e_ins: int = 1,
                 match: int = 1, mismatch: int = 4,
                 band: int = 100):
    """Batched banded global alignment with direction matrix.

    Returns (score [B], dirs uint8 [B, Lq, Lt+1]) — row i of dirs holds
    the packed H-source + gap-extend bits for DP row i+1.  Traceback is
    done on host (seqlib_tpu.align.cigar_from_dirs).
    """
    B, Lq = query.shape
    _, Lt = target.shape
    jt = jnp.arange(Lt + 1, dtype=jnp.int32)
    tmask = jt[None, :] <= tlen[:, None]

    h0 = jnp.where(jt > 0, -(o_del + e_del * jt), 0)
    h0 = jnp.where(tmask, h0, NEG).astype(jnp.int32)
    h0 = jnp.broadcast_to(h0, (B, Lt + 1)).astype(jnp.int32)

    dirs0 = jnp.zeros((B, Lq, Lt + 1), jnp.uint8)

    def body(i, st):
        h_prev, f_prev, dirs = st
        qi = query[:, i].astype(jnp.int32)
        trow = target.astype(jnp.int32)
        is_match = (trow == qi[:, None]) & (trow < 4) & (qi[:, None] < 4)
        sub = jnp.where(is_match, match, -mismatch)
        M = h_prev[:, :-1] + sub
        f_open = h_prev - (o_ins + e_ins)
        f_ext = f_prev - e_ins
        F = jnp.maximum(f_open, f_ext)
        fext_bit = (f_ext >= f_open).astype(jnp.uint8) * BIT_FEXT
        hnd = jnp.full((B, Lt + 1), NEG, jnp.int32)
        hnd = hnd.at[:, 1:].set(jnp.maximum(M, F[:, 1:]))
        hnd = hnd.at[:, 0].set(-(o_ins + e_ins * (i + 1)))
        # banding: mask cells with |j - i*Lt/Lq... simple diagonal band
        E = _row_scan_E(hnd, o_del, e_del)
        # E-extend bit: E(j) = E(j-1) - e_del  (continuation)
        e_prev_ext = jnp.concatenate(
            [jnp.full((B, 1), NEG, jnp.int32), E[:, :-1] - e_del], axis=-1)
        eext_bit = (e_prev_ext >= E).astype(jnp.uint8) * BIT_EEXT
        h = jnp.maximum(hnd, E)
        # H source
        src = jnp.full((B, Lt + 1), DIR_F, jnp.uint8)
        src = jnp.where(h == E, jnp.uint8(DIR_E), src)
        m_full = jnp.concatenate(
            [jnp.full((B, 1), NEG, jnp.int32), M], axis=-1)
        src = jnp.where(h == m_full, jnp.uint8(DIR_M), src)
        src = src.at[:, 0].set(DIR_F)
        # mismatch bit: lets the traceback count NM without re-gathering
        # query/target characters (the walk is gather-cost-bound on TPU)
        mis_bit = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.uint8),
             (~is_match).astype(jnp.uint8) * BIT_MIS], axis=1)
        dircode = src | eext_bit | fext_bit | mis_bit
        band_ok = jnp.abs(jt[None, :] - (i + 1)) <= band
        h = jnp.where(tmask & band_ok, h, NEG)
        active = (i < qlen)[:, None]
        h = jnp.where(active, h, h_prev)
        f = jnp.where(active, F, f_prev)
        dirs = dirs.at[:, i, :].set(jnp.where(
            active, dircode, jnp.uint8(0)))
        return (h, f, dirs)

    h, f, dirs = jax.lax.fori_loop(
        0, Lq, body, (h0, jnp.full((B, Lt + 1), NEG, jnp.int32), dirs0))
    score = h[jnp.arange(B), jnp.clip(tlen, 0, Lt)]
    return score, dirs


def cigar_from_dirs(dirs: np.ndarray, qlen: int, tlen: int
                    ) -> list[tuple[str, int]]:
    """Host traceback of one pair's direction matrix -> [(op, len)].

    dirs: uint8 [Lq, Lt+1] from global_batch (row i = DP row i+1).
    """
    i, j = qlen, tlen
    out: list[tuple[str, int]] = []

    def push(op):
        if out and out[-1][0] == op:
            out[-1] = (op, out[-1][1] + 1)
        else:
            out.append((op, 1))

    state = 0  # 0 = H, 1 = E(D), 2 = F(I)
    while i > 0 or j > 0:
        if i == 0:
            push("D"); j -= 1
            continue
        if j == 0:
            push("I"); i -= 1
            continue
        code = int(dirs[i - 1, j])
        if state == 0:
            s = code & 3
            if s == DIR_M:
                push("M"); i -= 1; j -= 1
            elif s == DIR_E:
                state = 1
            else:
                state = 2
        elif state == 1:
            push("D")
            if not (code & BIT_EEXT):
                state = 0
            j -= 1
        else:
            push("I")
            if not (code & BIT_FEXT):
                state = 0
            i -= 1
    out.reverse()
    return [(op, ln) for op, ln in out]
