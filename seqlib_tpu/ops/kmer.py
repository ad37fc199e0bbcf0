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


def _roll_fwd(hi, lo, b, k: int):
    """Append base b to a (hi, lo) k-mer (drop the oldest base)."""
    mask_hi = jnp.uint32((1 << (2 * k - 32)) - 1) if k > 16 \
        else jnp.uint32(0)
    h = hi.astype(jnp.uint32)
    l = lo.astype(jnp.uint32)
    nh = ((h << 2) | (l >> 30)) & mask_hi
    nl = (l << 2) | b.astype(jnp.uint32)
    if k <= 16:
        nh = jnp.zeros_like(nh)
        nl = nl & jnp.uint32((1 << (2 * k)) - 1) if k < 16 else nl
    return nh.astype(jnp.int32), nl.astype(jnp.int32)


def _roll_bwd(hi, lo, b, k: int):
    """Prepend base b to a (hi, lo) k-mer (drop the newest base)."""
    h = hi.astype(jnp.uint32)
    l = lo.astype(jnp.uint32)
    nl = (l >> 2) | ((h & 3) << 30)
    nh = h >> 2
    bshift = 2 * (k - 1)
    bu = b.astype(jnp.uint32)
    if bshift >= 32:
        nh = nh | (bu << (bshift - 32))
    else:
        nl = nl | (bu << bshift)
        nh = jnp.zeros_like(nh)
    return nh.astype(jnp.int32), nl.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "min_cov"))
def correct_reads_device(reads: jax.Array, lens: jax.Array,
                         keys_hi: jax.Array, keys_lo: jax.Array,
                         counts: jax.Array, k: int, min_cov: int):
    """Lockstep spectrum-walk error correction (BFC ``kmer_correct``
    behavior class, /root/reference/src/BFC.cpp:282-362): from each
    read's first solid k-mer window, walk right then left; at every
    step where the extended k-mer is weak (< min_cov), substitute the
    base whose extension is strongest, provided it is solid.

    reads [B, L] nt4 codes (4 = N/pad); table from
    ``count_kmers_device``.  Returns (corrected [B, L], n_changed [B]).
    Reads with no solid window are returned unchanged.
    """
    B, L = reads.shape
    n = L - k + 1
    chi, clo, valid = canonical_kmers_device(reads, lens, k)
    cnt0 = lookup_kmers_device(keys_hi, keys_lo, counts, chi, clo)
    solid0 = (cnt0 >= min_cov) & valid
    has_anchor = jnp.any(solid0, axis=1)
    a = jnp.argmax(solid0, axis=1).astype(jnp.int32)     # first solid
    codes = jnp.where(reads < 4, reads, 4).astype(jnp.int32)
    lens_i = lens.astype(jnp.int32)

    def lookup4(c_hi, c_lo):
        return lookup_kmers_device(keys_hi, keys_lo, counts, c_hi, c_lo)

    # ---- forward walk --------------------------------------------------
    # state: (codes, fwd_hi, fwd_lo, rc_hi, rc_lo, nchg); the fwd k-mer
    # covers [p-k+1, p+1) after step p, rc is its reverse complement.
    def fwd_body(p, st):
        codes, fh, fl, rh, rl, nchg = st
        in_read = p < lens_i
        correcting = has_anchor & (p >= a + k) & in_read
        orig = codes[:, p]
        origc = jnp.minimum(orig, 3)
        # candidate k-mers for all 4 bases: roll fwd, roll rc bwd
        ch_, cl_ = jax.vmap(
            lambda b: _roll_fwd(fh, fl, jnp.full((B,), b, jnp.uint32), k),
            out_axes=1)(jnp.arange(4, dtype=jnp.uint32))
        rbh, rbl = jax.vmap(
            lambda b: _roll_bwd(rh, rl, jnp.full((B,), 3 - b, jnp.uint32),
                                k),
            out_axes=1)(jnp.arange(4, dtype=jnp.uint32))
        # canonical = lexicographic min of (fwd, rc)
        fu_h, fu_l = ch_.astype(jnp.uint32), cl_.astype(jnp.uint32)
        ru_h, ru_l = rbh.astype(jnp.uint32), rbl.astype(jnp.uint32)
        take_r = (ru_h < fu_h) | ((ru_h == fu_h) & (ru_l < fu_l))
        can_h = jnp.where(take_r, rbh, ch_)
        can_l = jnp.where(take_r, rbl, cl_)
        cnt = lookup4(can_h, can_l)                       # [B, 4]
        cnt_orig = jnp.take_along_axis(
            cnt, origc[:, None], axis=1)[:, 0]
        orig_solid = (cnt_orig >= min_cov) & (orig < 4)
        best_b = jnp.argmax(cnt, axis=1).astype(jnp.int32)
        best_cnt = jnp.max(cnt, axis=1)
        sub = correcting & ~orig_solid & (best_cnt >= min_cov) \
            & ((best_b != origc) | (orig == 4))
        chosen = jnp.where(sub, best_b, orig)
        new_col = jnp.where(correcting, chosen, orig)
        codes = codes.at[:, p].set(jnp.where(in_read, new_col,
                                             codes[:, p]))
        nchg = nchg + sub.astype(jnp.int32)
        # roll state with the walked base (clamped for Ns)
        walk = jnp.minimum(new_col, 3).astype(jnp.uint32)
        nfh, nfl = _roll_fwd(fh, fl, walk, k)
        nrh, nrl = _roll_bwd(rh, rl, (3 - walk), k)
        upd = in_read
        fh = jnp.where(upd, nfh, fh); fl = jnp.where(upd, nfl, fl)
        rh = jnp.where(upd, nrh, rh); rl = jnp.where(upd, nrl, rl)
        return (codes, fh, fl, rh, rl, nchg)

    z = jnp.zeros(B, jnp.int32)
    codes, _, _, _, _, nchg = jax.lax.fori_loop(
        0, L, fwd_body, (codes, z, z, z, z, z))

    # ---- backward walk -------------------------------------------------
    # state k-mer covers [p+1, p+k+1) before step p; candidates prepend.
    def bwd_body(s, st):
        codes, fh, fl, rh, rl, nchg = st
        p = L - 1 - s
        in_read = p < lens_i
        state_ok = (p + k) < lens_i       # state window fully in read
        correcting = has_anchor & (p < a) & in_read & state_ok
        orig = codes[:, p]
        origc = jnp.minimum(orig, 3)
        ch_, cl_ = jax.vmap(
            lambda b: _roll_bwd(fh, fl, jnp.full((B,), b, jnp.uint32), k),
            out_axes=1)(jnp.arange(4, dtype=jnp.uint32))
        rbh, rbl = jax.vmap(
            lambda b: _roll_fwd(rh, rl, jnp.full((B,), 3 - b, jnp.uint32),
                                k),
            out_axes=1)(jnp.arange(4, dtype=jnp.uint32))
        fu_h, fu_l = ch_.astype(jnp.uint32), cl_.astype(jnp.uint32)
        ru_h, ru_l = rbh.astype(jnp.uint32), rbl.astype(jnp.uint32)
        take_r = (ru_h < fu_h) | ((ru_h == fu_h) & (ru_l < fu_l))
        can_h = jnp.where(take_r, rbh, ch_)
        can_l = jnp.where(take_r, rbl, cl_)
        cnt = lookup4(can_h, can_l)
        cnt_orig = jnp.take_along_axis(
            cnt, origc[:, None], axis=1)[:, 0]
        orig_solid = (cnt_orig >= min_cov) & (orig < 4)
        best_b = jnp.argmax(cnt, axis=1).astype(jnp.int32)
        best_cnt = jnp.max(cnt, axis=1)
        sub = correcting & ~orig_solid & (best_cnt >= min_cov) \
            & ((best_b != origc) | (orig == 4))
        chosen = jnp.where(sub, best_b, orig)
        new_col = jnp.where(correcting, chosen, orig)
        codes = codes.at[:, p].set(jnp.where(in_read, new_col,
                                             codes[:, p]))
        nchg = nchg + sub.astype(jnp.int32)
        walk = jnp.minimum(new_col, 3).astype(jnp.uint32)
        nfh, nfl = _roll_bwd(fh, fl, walk, k)
        nrh, nrl = _roll_fwd(rh, rl, (3 - walk), k)
        fh = jnp.where(in_read, nfh, fh); fl = jnp.where(in_read, nfl, fl)
        rh = jnp.where(in_read, nrh, rh); rl = jnp.where(in_read, nrl, rl)
        return (codes, fh, fl, rh, rl, nchg)

    codes, _, _, _, _, nchg = jax.lax.fori_loop(
        0, L, bwd_body, (codes, z, z, z, z, nchg))
    return codes.astype(jnp.uint8), nchg


@functools.partial(jax.jit, static_argnames=("k", "min_cov"))
def weak_reads_device(reads: jax.Array, lens: jax.Array,
                      keys_hi: jax.Array, keys_lo: jax.Array,
                      counts: jax.Array, k: int, min_cov: int):
    """[B] bool: read has at least one weak (count < min_cov) valid
    k-mer window — the cheap pre-scan that gates the walk."""
    chi, clo, valid = canonical_kmers_device(reads, lens, k)
    cnt = lookup_kmers_device(keys_hi, keys_lo, counts, chi, clo)
    return jnp.any(valid & (cnt < min_cov), axis=1)
