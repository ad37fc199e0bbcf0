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


@functools.partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins",
                                             "e_ins", "match", "mismatch"))
def extend_batch(query: jax.Array, qlen: jax.Array,
                 target: jax.Array, tlen: jax.Array,
                 h0: jax.Array,
                 o_del: int = 6, e_del: int = 1,
                 o_ins: int = 6, e_ins: int = 1,
                 match: int = 1, mismatch: int = 4):
    """Batched seed extension (ksw_extend semantics, no zdrop).

    query/target: int8/int32 nt4 codes [B, Lq] / [B, Lt] (4 = N,
    scores as mismatch).  h0: initial score at origin [B].

    Returns dict: score, qle, tle (position of the max, lengths
    consumed), gscore, gtle (best score consuming the whole query).
    """
    B, Lq = query.shape
    _, Lt = target.shape
    jt = jnp.arange(Lt + 1, dtype=jnp.int32)

    # row 0: H(0,j) = h0 - (o_del + e_del*j), floor NEG outside
    h_row0 = h0[:, None] - jnp.where(jt > 0, o_del + e_del * jt, 0)
    h_row0 = jnp.where(h_row0 < 0, NEG, h_row0)  # prune dead-origin cells
    h_row0 = h_row0.at[:, 0].set(h0)
    tmask = jt[None, :] <= tlen[:, None]          # valid target boundary
    h_row0 = jnp.where(tmask, h_row0, NEG)

    init = dict(
        h_prev=h_row0.astype(jnp.int32),
        f_prev=jnp.full((B, Lt + 1), NEG, jnp.int32),
        best=jnp.zeros(B, jnp.int32), bqle=jnp.zeros(B, jnp.int32),
        btle=jnp.zeros(B, jnp.int32),
        gscore=jnp.full(B, NEG, jnp.int32), gtle=jnp.zeros(B, jnp.int32),
    )

    def body(i, st):
        qi = query[:, i].astype(jnp.int32)                    # [B]
        trow = target.astype(jnp.int32)                       # [B, Lt]
        is_match = (trow == qi[:, None]) & (trow < 4) & (qi[:, None] < 4)
        sub = jnp.where(is_match, match, -mismatch)           # [B, Lt]
        M = st["h_prev"][:, :-1] + sub                        # ends at j>=1
        F = jnp.maximum(st["h_prev"] - (o_ins + e_ins),
                        st["f_prev"] - e_ins)                 # [B, Lt+1]
        # H without E
        hnd = jnp.full((B, Lt + 1), NEG, jnp.int32)
        hnd = hnd.at[:, 1:].set(jnp.maximum(M, F[:, 1:]))
        # column 0 boundary: H(i,0) = h0 - (o_ins + e_ins*i), or F
        col0 = jnp.maximum(F[:, 0], NEG)
        hnd = hnd.at[:, 0].set(col0)
        E = _row_scan_E(hnd, o_del, e_del)
        h = jnp.maximum(hnd, E)
        h = jnp.where(tmask, h, NEG)
        active = (i < qlen).astype(jnp.int32)                 # [B]
        h = jnp.where(active[:, None] > 0, h, st["h_prev"])
        f = jnp.where(active[:, None] > 0, F, st["f_prev"])
        # track best (strictly greater keeps the earliest)
        row_best = jnp.max(h[:, 1:], axis=-1)
        row_arg = jnp.argmax(h[:, 1:], axis=-1).astype(jnp.int32) + 1
        better = (row_best > st["best"]) & (active > 0)
        best = jnp.where(better, row_best, st["best"])
        bqle = jnp.where(better, i + 1, st["bqle"])
        btle = jnp.where(better, row_arg, st["btle"])
        # gscore: best score with the query fully consumed (final row),
        # over any target prefix length
        at_end = (i == qlen - 1)
        gsc = jnp.max(h, axis=-1)
        garg = jnp.argmax(h, axis=-1).astype(jnp.int32)
        gscore = jnp.where(at_end, gsc, st["gscore"])
        gtle = jnp.where(at_end, garg, st["gtle"])
        return dict(h_prev=h, f_prev=f, best=best, bqle=bqle, btle=btle,
                    gscore=gscore, gtle=gtle)

    st = jax.lax.fori_loop(0, Lq, body, init)
    return dict(score=st["best"], qle=st["bqle"], tle=st["btle"],
                gscore=st["gscore"], gtle=st["gtle"])


# direction bits for global traceback
DIR_M, DIR_E, DIR_F = 0, 1, 2       # H source: diag / left(D) / up(I)
BIT_EEXT, BIT_FEXT = 4, 8


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
        dircode = src | eext_bit | fext_bit
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
