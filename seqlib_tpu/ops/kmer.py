"""Device k-mer pipeline: packing, canonicalization, sort-based
counting, and table lookup — all jit/shard_map-friendly.

This is the TPU-native form of fermi-lite's BFC counting stage
(``fml_count`` -> prefix-sharded hash tables, consumed by the
reference at /root/reference/src/BFC.cpp:208-280): instead of a hash
table, k-mers are packed into integers, sorted on device, and counted
by segment reduction; lookups are vectorized binary searches.  The
host BFC (assembly/bfc.py) uses the same layout, so tables are
interchangeable.

For k <= 15 a single int32 lane holds the 2k bits (native TPU int);
larger k uses an (hi, lo) int32 pair ordered lexicographically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def pack_kmers(reads: jax.Array, lens: jax.Array, k: int):
    """All k-mers of a read batch as (hi, lo) int32 pairs + validity.

    reads [B, L] nt4 codes (4 = N/pad).  Returns hi, lo, valid of
    shape [B, L-k+1]."""
    B, L = reads.shape
    n = L - k + 1
    hi = jnp.zeros((B, n), jnp.uint32)
    lo = jnp.zeros((B, n), jnp.uint32)
    bad = jnp.zeros((B, n), bool)
    for j in range(k):
        c = reads[:, j:j + n].astype(jnp.uint32)
        bad = bad | (c > 3)
        hi = (hi << 2) | (lo >> 30)
        lo = (lo << 2) | (c & 3)
    jpos = jnp.arange(n)[None, :]
    valid = ~bad & (jpos + k <= lens[:, None])
    return hi.astype(jnp.int32), lo.astype(jnp.int32), valid


@functools.partial(jax.jit, static_argnames=("k",))
def revcomp_kmers(hi: jax.Array, lo: jax.Array, k: int):
    """Reverse-complement packed k-mers (2k bits across the pair)."""
    x_hi = hi.astype(jnp.uint32)
    x_lo = lo.astype(jnp.uint32)
    out_hi = jnp.zeros_like(x_hi)
    out_lo = jnp.zeros_like(x_lo)
    # k steps of: take the lowest base, complement, append — after k
    # steps the result holds exactly the reversed-complemented 2k bits
    for _ in range(k):
        c = (~x_lo) & 3
        out_hi = (out_hi << 2) | (out_lo >> 30)
        out_lo = (out_lo << 2) | c
        x_lo = (x_lo >> 2) | ((x_hi & 3) << 30)
        x_hi = x_hi >> 2
    return out_hi.astype(jnp.int32), out_lo.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def canonical_kmers_device(reads: jax.Array, lens: jax.Array, k: int):
    """min(kmer, revcomp(kmer)) as (hi, lo) + validity."""
    hi, lo, valid = pack_kmers(reads, lens, k)
    rhi, rlo = revcomp_kmers(hi, lo, k)
    fu = hi.astype(jnp.uint32)
    ru = rhi.astype(jnp.uint32)
    take_r = (ru < fu) | ((ru == fu)
                          & (rlo.astype(jnp.uint32) < lo.astype(jnp.uint32)))
    chi = jnp.where(take_r, rhi, hi)
    clo = jnp.where(take_r, rlo, lo)
    return chi, clo, valid


@jax.jit
def count_kmers_device(hi: jax.Array, lo: jax.Array, valid: jax.Array):
    """Sort + segment-reduce count of packed k-mers.

    Inputs flattened; invalid entries sort to the end (sentinel).
    Returns (keys_hi, keys_lo, counts, n_unique) with fixed shape
    (padded by sentinels)."""
    h = hi.reshape(-1).astype(jnp.uint32)
    l = lo.reshape(-1).astype(jnp.uint32)
    v = valid.reshape(-1)
    SENT = jnp.uint32(0xFFFFFFFF)
    h = jnp.where(v, h, SENT)
    l = jnp.where(v, l, SENT)
    # single sort key: hi in the upper bits, lo lower (lexicographic);
    # int64 emulation via two-stage stable sort
    order = jnp.argsort(l, stable=True)
    h2, l2 = h[order], l[order]
    order2 = jnp.argsort(h2, stable=True)
    hs, ls = h2[order2], l2[order2]
    new = jnp.ones(hs.shape, bool).at[1:].set(
        (hs[1:] != hs[:-1]) | (ls[1:] != ls[:-1]))
    seg = jnp.cumsum(new) - 1
    n = hs.size
    counts = jnp.zeros(n, jnp.int32).at[seg].add(1)
    keys_hi = jnp.full(n, SENT, jnp.uint32).at[seg].set(hs)
    keys_lo = jnp.full(n, SENT, jnp.uint32).at[seg].set(ls)
    sent_mask = (keys_hi == SENT) & (keys_lo == SENT)
    counts = jnp.where(sent_mask, 0, counts)
    n_unique = jnp.sum(~sent_mask)
    return (keys_hi.astype(jnp.int32), keys_lo.astype(jnp.int32),
            counts, n_unique)


@jax.jit
def lookup_kmers_device(keys_hi, keys_lo, counts, qhi, qlo):
    """Vectorized lexicographic binary search of (hi, lo) query k-mers
    in the sorted table; returns counts (0 when absent).  Stays in
    int32 lanes (TPU-native) — no 64-bit keys."""
    kh = keys_hi.astype(jnp.uint32)
    kl = keys_lo.astype(jnp.uint32)
    qh = qhi.reshape(-1).astype(jnp.uint32)
    ql = qlo.reshape(-1).astype(jnp.uint32)
    n = kh.size
    steps = max(int(np.ceil(np.log2(max(n, 2)))) + 1, 1)

    def body(_, st):
        lo_i, hi_i = st
        mid = (lo_i + hi_i) // 2
        mh = kh[mid]
        ml = kl[mid]
        less = (mh < qh) | ((mh == qh) & (ml < ql))
        return (jnp.where(less, mid + 1, lo_i),
                jnp.where(less, hi_i, mid))

    lo_i, _ = jax.lax.fori_loop(
        0, steps, body,
        (jnp.zeros(qh.shape, jnp.int32),
         jnp.full(qh.shape, n, jnp.int32)))
    idx = jnp.minimum(lo_i, n - 1)
    hit = (kh[idx] == qh) & (kl[idx] == ql)
    return jnp.where(hit, counts[idx], 0).reshape(qhi.shape)
