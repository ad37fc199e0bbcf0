"""Device-side FM-index ops (JAX): batched rank, backward extension,
lockstep seed scanning, and sampled-SA lookup.

These are the TPU-native replacement for libbwa's seeding core
(``mem_align1``'s SMEM collection, consumed by the reference at
/root/reference/src/BWAAligner.cpp:104-109).  The FM-index layout is
shared bit-for-bit with the host :class:`seqlib_tpu.index.FMIndex`
(and hence with the on-disk bwa .bwt format):

* ``blocks`` uint32 [n_blocks+1, 12] — per 128-base block: 4 occ
  checkpoints followed by 8 packed BWT words (16 bases/word, first
  base in the top 2 bits).  Counts and words share one row so a rank
  query is a SINGLE row gather (the seed scan is gather-bound).

Rank is one gather + XLA ``population_count`` on masked words; the
whole seeding pass is a fixed-trip ``lax.fori_loop`` so one compiled
program serves every batch.  Everything here is pure JAX (jit/shard_map
friendly).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceFMIndex:
    """FM-index arrays resident on device."""

    blocks: jax.Array      # uint32 [n_blocks+1, 12] (4 counts + 8 words)
    sa_samples: jax.Array  # int32 [n_sa]
    L2: jax.Array          # int32 [5]
    primary: jax.Array     # int32 scalar
    seq_len: int           # static python int
    sa_intv: int           # static python int
    l_pac: int             # static python int

    def tree_flatten(self):
        return ((self.blocks, self.sa_samples,
                 self.L2, self.primary),
                (self.seq_len, self.sa_intv, self.l_pac))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_host(cls, idx) -> "DeviceFMIndex":
        """Upload a host FMIndex (seqlib_tpu.index.FMIndex) to device.

        When the host index still holds the full SA (in-memory
        construction), it is uploaded with sa_intv=1 so sa_lookup
        degenerates to a single gather; disk-loaded indexes fall back
        to the sampled-SA LF walk.
        """
        if idx.seq_len >= 2**31:
            raise NotImplementedError(
                "device FM-index currently requires seq_len < 2^31 "
                "(genomes < ~1 Gbp); shard the index for larger refs")
        if getattr(idx, "sa_full", None) is not None:
            sa = idx.sa_full.astype(np.int64).copy()
            sa[0] = 0
            sa_intv = 1
        else:
            sa = idx.sa_samples.astype(np.int64).copy()
            sa[0] = 0
            sa_intv = int(idx.sa_intv)
        nb = idx.bwt_words.shape[0]
        blocks = np.zeros((nb + 1, 12), np.uint32)
        blocks[:, :4] = idx.cp_counts.astype(np.uint32)[:nb + 1]
        blocks[:nb, 4:] = idx.bwt_words
        return cls(
            blocks=jnp.asarray(blocks),
            sa_samples=jnp.asarray(sa.astype(np.int32)),
            L2=jnp.asarray(idx.L2.astype(np.int32)),
            primary=jnp.asarray(np.int32(idx.primary)),
            seq_len=int(idx.seq_len),
            sa_intv=sa_intv,
            l_pac=int(idx.l_pac),
        )


# ---------------------------------------------------------------------------
# rank
# ---------------------------------------------------------------------------

def _inblock_count(words: jax.Array, c: jax.Array, within: jax.Array
                   ) -> jax.Array:
    """Count occurrences of 2-bit code c among the first `within` bases
    of a 128-base block given its 8 packed words.

    words: uint32 [..., 8]; c: int32 [...]; within: int32 [...] in [0,128].
    """
    pat = (c.astype(jnp.uint32) * jnp.uint32(0x55555555))[..., None]
    x = words ^ pat
    # base matches iff both of its 2 bits are 0 after xor
    m = (~x) & ((~x) >> jnp.uint32(1)) & jnp.uint32(0x55555555)
    # prefix mask per word: word j covers bases [16j, 16j+16), first base
    # in bits 30..31 -> mask of first t bases = ~0 << (32 - 2t)
    j16 = jnp.arange(8, dtype=jnp.int32) * 16
    t = jnp.clip(within[..., None] - j16, 0, 16)
    mask = jnp.where(
        t > 0,
        (jnp.uint32(0xFFFFFFFF) << ((32 - 2 * t).astype(jnp.uint32))),
        jnp.uint32(0))
    return jax.lax.population_count(m & mask).sum(axis=-1).astype(jnp.int32)


def rank(fm: DeviceFMIndex, c: jax.Array, k: jax.Array) -> jax.Array:
    """# of c in bwt[0..k-1]; c,k broadcastable int32 arrays,
    k in [0, seq_len]."""
    c, k = jnp.broadcast_arrays(c, k)
    blk = k >> 7
    within = (k & 127).astype(jnp.int32)
    row = fm.blocks[blk]                                  # [..., 12]
    # 4-way arithmetic select of the count column (a take_along_axis
    # here lowers to a second gather)
    base = jnp.where(
        c < 2,
        jnp.where(c == 0, row[..., 0], row[..., 1]),
        jnp.where(c == 2, row[..., 2], row[..., 3])).astype(jnp.int32)
    return base + _inblock_count(row[..., 4:], c, within)


def rank_full(fm: DeviceFMIndex, c: jax.Array, k: jax.Array) -> jax.Array:
    """Rank over BWT_full (sentinel at row `primary`), k in [0, seq_len+1]."""
    return rank(fm, c, k - (k > fm.primary).astype(k.dtype))


def backward_ext(fm: DeviceFMIndex, l: jax.Array, u: jax.Array,
                 c: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[l,u) -> interval of c+pattern.  Batched over leading dims.

    Both boundary ranks are computed in ONE stacked gather so each
    seed-scan step costs a single rank dispatch.
    """
    C = fm.L2[c] + 1
    lu = jnp.stack([l, u], axis=0)
    r = rank_full(fm, jnp.broadcast_to(c, lu.shape), lu)
    return C + r[0], C + r[1]


# ---------------------------------------------------------------------------
# seed scanning: maximal exact matches ending at e, greedy restart
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_seeds", "min_seed_len"))
def collect_seeds(fm: DeviceFMIndex, reads: jax.Array, lens: jax.Array,
                  max_seeds: int = 16, min_seed_len: int = 19):
    """Lockstep greedy seed scan over a read batch.

    For each read (nt4 codes, padded with 4), scan end position e from
    len-1 downward; backward-extend to the maximal start s; emit seed
    [s, e] with its SA interval; restart at e' = s - 2 (skipping the
    mismatching base).  Fixed trip count L + max_seeds + 2.

    Returns dict of [B, max_seeds] arrays: qbeg, qend (exclusive),
    intv_l, intv_sz, and [B] n_seeds.
    """
    B, L = reads.shape
    n1 = jnp.int32(fm.seq_len + 1)

    init = dict(
        e=lens.astype(jnp.int32) - 1,       # current end position
        p=lens.astype(jnp.int32) - 1,       # next char to consume
        l=jnp.zeros(B, jnp.int32), u=jnp.full(B, n1, jnp.int32),
        n=jnp.zeros(B, jnp.int32),          # seeds emitted
        qbeg=jnp.zeros((B, max_seeds), jnp.int32),
        qend=jnp.zeros((B, max_seeds), jnp.int32),
        intv_l=jnp.zeros((B, max_seeds), jnp.int32),
        intv_sz=jnp.zeros((B, max_seeds), jnp.int32),
    )

    s_iota = jnp.arange(max_seeds, dtype=jnp.int32)[None, :]

    def emit(st, active, force):
        """Emit [p+1, e] as a seed where interval nonempty & long enough.

        The slot write is a one-hot select over the [B, max_seeds]
        seed arrays — batched scatters serialized badly on TPU."""
        slen = st["e"] - st["p"]
        ok = active & force & (slen >= min_seed_len) & \
            (st["u"] > st["l"]) & (st["n"] < max_seeds)
        hot = ok[:, None] & (s_iota == st["n"][:, None])   # [B, S]
        st = dict(st)
        st["qbeg"] = jnp.where(hot, (st["p"] + 1)[:, None], st["qbeg"])
        st["qend"] = jnp.where(hot, (st["e"] + 1)[:, None], st["qend"])
        st["intv_l"] = jnp.where(hot, st["l"][:, None], st["intv_l"])
        st["intv_sz"] = jnp.where(hot, (st["u"] - st["l"])[:, None],
                                  st["intv_sz"])
        st["n"] = st["n"] + ok.astype(jnp.int32)
        return st

    init = dict(init)
    init["it"] = jnp.int32(0)

    def cond(st):
        return jnp.any(st["e"] >= 0) & (st["it"] < L + max_seeds + 2)

    def body(st):
        active = st["e"] >= 0
        c = jnp.where(active & (st["p"] >= 0),
                      reads[jnp.arange(B), jnp.maximum(st["p"], 0)],
                      4).astype(jnp.int32)
        valid_c = c < 4
        nl, nu = backward_ext(fm, st["l"], st["u"],
                              jnp.minimum(c, 3))
        nl = jnp.where(valid_c, nl, jnp.int32(0))
        nu = jnp.where(valid_c, nu, jnp.int32(0))
        dead = nu <= nl
        hit_start = st["p"] < 0
        # emit when the extension dies or we ran off the read start
        st2 = emit(st, active, dead | hit_start)
        adv = active & ~dead & ~hit_start
        restart = active & (dead | hit_start)
        new_e = jnp.where(restart, st["p"] - 1, st2["e"])
        # after restart: fresh interval, p = new_e
        out = dict(st2)
        out["l"] = jnp.where(adv, nl, 0)
        out["u"] = jnp.where(adv, nu, n1)
        out["p"] = jnp.where(adv, st["p"] - 1, new_e)
        out["e"] = jnp.where(restart, new_e, st2["e"])
        out["it"] = st["it"] + 1
        return out

    def body2(st):
        # two scan steps per while iteration: halves loop overhead; the
        # body is a no-op for finished reads so overshoot is safe
        return body(body(st))

    st = jax.lax.while_loop(cond, body2, init)
    return dict(qbeg=st["qbeg"], qend=st["qend"], intv_l=st["intv_l"],
                intv_sz=st["intv_sz"], n_seeds=st["n"])


@functools.partial(jax.jit, static_argnames=("min_seed_len",))
def reseed_scan(fm: DeviceFMIndex, reads: jax.Array, qb: jax.Array,
                qe: jax.Array, occ: jax.Array, active: jax.Array,
                min_seed_len: int = 19):
    """bwa-style re-seeding of one long seed per read.

    For a long near-unique seed [qb, qe) with occ occurrences, bwa
    re-seeds from the middle requiring > occ occurrences
    (split_factor/split_width, mem_collect_intv): the shorter, more
    repetitive core reveals secondary loci.  Here: backward-extend
    from the seed midpoint, keeping the deepest interval whose size
    stays > occ.

    Returns (qbeg2, qend2, intv_l2, intv_sz2) [B]; intv_sz2 == 0 where
    inactive or nothing qualifying was found.
    """
    B, L = reads.shape
    n1 = jnp.int32(fm.seq_len + 1)
    mid = (qb + qe) // 2                       # exclusive end of re-seed
    e = jnp.where(active, mid - 1, -1)

    def cond(st):
        l, u, p, done, bl, bu, bp, it = st
        return (~jnp.all(done)) & (it < L)

    def body(st):
        l, u, p, done, bl, bu, bp, it = st
        c = jnp.where((p >= 0) & ~done,
                      reads[jnp.arange(B), jnp.maximum(p, 0)],
                      4).astype(jnp.int32)
        valid_c = c < 4
        nl, nu = backward_ext(fm, l, u, jnp.minimum(c, 3))
        nl = jnp.where(valid_c, nl, 0)
        nu = jnp.where(valid_c, nu, 0)
        sz = nu - nl
        # stop when size would drop to <= occ (keep previous state)
        stop = done | (sz <= occ) | (p < 0)
        keep = ~stop
        best_now = keep & (sz > occ)
        return (jnp.where(keep, nl, l), jnp.where(keep, nu, u),
                jnp.where(keep, p - 1, p), stop,
                jnp.where(best_now, nl, bl), jnp.where(best_now, nu, bu),
                jnp.where(best_now, p, bp), it + 1)

    init = (jnp.zeros(B, jnp.int32), jnp.full(B, n1, jnp.int32),
            e, ~active,
            jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
            jnp.full(B, -1, jnp.int32), jnp.int32(0))
    l, u, p, done, bl, bu, bp, _ = jax.lax.while_loop(cond, body, init)
    qbeg2 = bp
    qend2 = mid
    sz2 = bu - bl
    ok = active & (bp >= 0) & (qend2 - qbeg2 >= min_seed_len) & (sz2 > 0)
    return (jnp.where(ok, qbeg2, 0), jnp.where(ok, qend2, 0),
            jnp.where(ok, bl, 0), jnp.where(ok, sz2, 0))


# ---------------------------------------------------------------------------
# SA lookup (sampled SA + LF walk)
# ---------------------------------------------------------------------------

def bwt_char(fm: DeviceFMIndex, r: jax.Array) -> jax.Array:
    """Stored-bwt code at bwt position r (already sentinel-adjusted)."""
    word = fm.blocks[r >> 7, 4 + ((r >> 4) & 7)]
    shift = (2 * (15 - (r & 15))).astype(jnp.uint32)
    return ((word >> shift) & jnp.uint32(3)).astype(jnp.int32)


@jax.jit
def sa_lookup(fm: DeviceFMIndex, ranks: jax.Array) -> jax.Array:
    """Text positions for an array of ranks via LF-walk to sampled SA.

    Sampling is by *rank* (isa % sa_intv == 0), so the walk length is
    geometric (mean sa_intv) and unbounded in the worst case — iterate
    a while_loop until every lane lands on a sample or on the primary
    row, with a generous safety cap.
    """
    r0 = jnp.maximum(ranks, 0).astype(jnp.int32)
    done0 = (r0 % fm.sa_intv == 0) | (r0 == fm.primary)

    def cond(carry):
        _, _, done, it = carry
        return (~jnp.all(done)) & (it < 64 * fm.sa_intv)

    def body(carry):
        r, steps, done, it = carry
        pos_in_bwt = r - (r > fm.primary).astype(jnp.int32)
        c = bwt_char(fm, jnp.maximum(pos_in_bwt, 0))
        lf = fm.L2[c] + 1 + rank_full(fm, c, r)
        r_next = jnp.where(done, r, lf)
        steps_next = jnp.where(done, steps, steps + 1)
        done_next = done | (r_next % fm.sa_intv == 0) \
            | (r_next == fm.primary)
        return r_next, steps_next, done_next, it + 1

    r, steps, _, _ = jax.lax.while_loop(
        cond, body,
        (r0, jnp.zeros_like(r0), done0, jnp.int32(0)))
    base = jnp.where(r == fm.primary, 0, fm.sa_samples[r // fm.sa_intv])
    pos = base + steps
    return jnp.where(ranks < 0, -1, pos)

# ---------------------------------------------------------------------------
# FMD bi-intervals + bidirectional SMEMs (bwa bwt_smem1 parity)
# ---------------------------------------------------------------------------

def rank4(fm: DeviceFMIndex, k: jax.Array) -> jax.Array:
    """Counts of ALL four codes in bwt[0..k-1] -> [..., 4].

    One block-row gather serves all four characters (the row holds the
    4 occ checkpoints + 8 packed words), so a bi-interval extension
    costs the same gather volume as a single-character rank."""
    blk = k >> 7
    within = (k & 127).astype(jnp.int32)
    row = fm.blocks[blk]                                  # [..., 12]
    base = row[..., :4].astype(jnp.int32)
    words = row[..., 4:]
    cnts = [_inblock_count(words, jnp.full(k.shape, c, jnp.int32), within)
            for c in range(4)]
    return base + jnp.stack(cnts, axis=-1)


def rank4_full(fm: DeviceFMIndex, k: jax.Array) -> jax.Array:
    """rank4 over BWT_full (sentinel row removed), k in [0, seq_len+1]."""
    return rank4(fm, k - (k > fm.primary).astype(k.dtype))


def bi_extend_back(fm: DeviceFMIndex, k: jax.Array, l: jax.Array,
                   s: jax.Array):
    """FMD backward extension of bi-interval (k, l, s) by ALL 4 chars.

    (k, l, s): k = start of the pattern P's interval (rank space
    [0, n], same convention as backward_ext), l = start of revcomp(P)'s
    interval, s = shared size.  Returns (k4, l4, s4), each [..., 4],
    where index a is the bi-interval of a+P.  Matches libbwa's
    ``bwt_extend(..., is_back=1)`` (consumed via ``bwt_smem1`` inside
    ``mem_collect_intv``, /root/reference/src/BWAAligner.cpp:104-109;
    submodule absent from the snapshot — reconstructed from the
    documented FMD-index algebra, Li 2012).

    Forward extension of P by base b is the mirrored call
    ``bi_extend_back(fm, l, k, s)`` selecting char 3-b and swapping the
    returned (k4, l4).
    """
    tk = rank4_full(fm, k)
    tl = rank4_full(fm, k + s)
    s4 = tl - tk
    k4 = fm.L2[jnp.arange(4)] + 1 + tk
    has_sent = ((k <= fm.primary) & (fm.primary < k + s)).astype(jnp.int32)
    l3 = l + has_sent
    l2 = l3 + s4[..., 3]
    l1 = l2 + s4[..., 2]
    l0 = l1 + s4[..., 1]
    l4 = jnp.stack([l0, l1, l2, l3], axis=-1)
    return k4, l4, s4


def _take4(a4: jax.Array, c: jax.Array) -> jax.Array:
    """a4[..., c] without a second gather (arithmetic 4-way select)."""
    return jnp.where(
        c < 2,
        jnp.where(c == 0, a4[..., 0], a4[..., 1]),
        jnp.where(c == 2, a4[..., 2], a4[..., 3]))


def _smem_push(cur: dict, mask: jax.Array, k, l, s, e, C: int) -> dict:
    """Push (k,l,s,end) onto each lane's forward-phase stack where
    mask; a full stack drops its OLDEST entry (largest interval,
    shortest end — its backward-extended SMEMs are the ones min_seed_len
    filters anyway)."""
    full = mask & (cur["cn"] >= C)
    cur = dict(cur)
    for nm in ("ck", "cl", "cs", "ce"):
        cur[nm] = jnp.where(full[:, None],
                            jnp.roll(cur[nm], -1, axis=1), cur[nm])
    pos = jnp.minimum(cur["cn"], C - 1)
    hot = mask[:, None] & (jnp.arange(C)[None, :] == pos[:, None])
    for nm, v in (("ck", k), ("cl", l), ("cs", s), ("ce", e)):
        cur[nm] = jnp.where(hot, v[:, None], cur[nm])
    cur["cn"] = jnp.minimum(cur["cn"] + mask.astype(jnp.int32), C)
    return cur


def _smem_round(fm: DeviceFMIndex, reads, lens, x, min_intv, active,
                acc: dict, min_seed_len: int, max_seeds: int, C: int):
    """One bwt_smem1 call, lockstep over the batch: collect every SMEM
    passing through pivot x (where active), append those of length >=
    min_seed_len and interval size >= min_intv into acc, and return
    (acc, ret_x) with ret_x = end of the longest forward extension
    (bwa's return value, the next pivot)."""
    B, L = reads.shape
    bidx = jnp.arange(B)
    n1 = jnp.int32(fm.seq_len + 1)

    c0 = jnp.where(active, reads[bidx, jnp.clip(x, 0, L - 1)],
                   4).astype(jnp.int32)
    ok0 = active & (c0 < 4) & (x < lens)
    c0c = jnp.minimum(c0, 3)
    s0 = (fm.L2[c0c + 1] - fm.L2[c0c]).astype(jnp.int32)
    ok0 = ok0 & (s0 >= min_intv) & (s0 > 0)

    fwd = dict(
        i=x + 1,
        k=(fm.L2[c0c] + 1).astype(jnp.int32),
        l=(fm.L2[3 - c0c] + 1).astype(jnp.int32),
        s=jnp.where(ok0, s0, 0),
        end=x + 1,
        alive=ok0,
        ck=jnp.zeros((B, C), jnp.int32), cl=jnp.zeros((B, C), jnp.int32),
        cs=jnp.zeros((B, C), jnp.int32), ce=jnp.zeros((B, C), jnp.int32),
        cn=jnp.zeros(B, jnp.int32), it=jnp.int32(0))

    def fcond(st):
        return jnp.any(st["alive"]) & (st["it"] < L + 1)

    def fbody(st):
        st = dict(st)
        i = st["i"]
        ch = jnp.where(st["alive"] & (i < lens),
                       reads[bidx, jnp.clip(i, 0, L - 1)],
                       4).astype(jnp.int32)
        ch_ok = st["alive"] & (ch < 4)
        K4, L4, S4 = bi_extend_back(fm, st["l"], st["k"], st["s"])
        cc = 3 - jnp.minimum(ch, 3)
        nk = _take4(L4, cc)
        nl = _take4(K4, cc)
        ns = _take4(S4, cc)
        hit_end = st["alive"] & ~ch_ok
        changed = ch_ok & (ns != st["s"])
        die = ch_ok & (ns < min_intv)
        st.update(_smem_push(
            {k: st[k] for k in ("ck", "cl", "cs", "ce", "cn")},
            changed | hit_end, st["k"], st["l"], st["s"], st["end"], C))
        adv = ch_ok & ~die
        st["k"] = jnp.where(adv, nk, st["k"])
        st["l"] = jnp.where(adv, nl, st["l"])
        st["s"] = jnp.where(adv, ns, st["s"])
        st["end"] = jnp.where(adv, i + 1, st["end"])
        st["alive"] = adv
        st["i"] = i + 1
        st["it"] = st["it"] + 1
        return st

    st = jax.lax.while_loop(fcond, fbody, fwd)
    ret_x = jnp.where(ok0, st["end"], x + 1)

    # reverse curr -> prev so prev[0] is the longest-end entry
    cn = st["cn"]
    jrev = jnp.clip(cn[:, None] - 1 - jnp.arange(C)[None, :], 0, C - 1)
    pk = jnp.take_along_axis(st["ck"], jrev, axis=1)
    pl = jnp.take_along_axis(st["cl"], jrev, axis=1)
    ps = jnp.take_along_axis(st["cs"], jrev, axis=1)
    pe = jnp.take_along_axis(st["ce"], jrev, axis=1)

    bwd = dict(i=x - 1, pk=pk, pl=pl, ps=ps, pe=pe, pn=cn,
               it=jnp.int32(0), **acc)

    def bcond(st):
        return jnp.any(st["pn"] > 0) & (st["it"] < L + 1)

    def bbody(st):
        st = dict(st)
        i = st["i"]
        has = st["pn"] > 0
        ch = jnp.where(has & (i >= 0),
                       reads[bidx, jnp.clip(i, 0, L - 1)],
                       4).astype(jnp.int32)
        c_ok = ch < 4
        K4, L4, S4 = bi_extend_back(fm, st["pk"], st["pl"], st["ps"])
        cc = jnp.minimum(ch, 3)[:, None]
        nk = _take4(K4, cc)
        nl = _take4(L4, cc)
        ns = _take4(S4, cc)
        jidx = jnp.arange(C)[None, :]
        entry = jidx < st["pn"][:, None]
        ext_ok = entry & c_ok[:, None] & (ns >= min_intv[:, None])
        dying = entry & ~ext_ok
        any_die = jnp.any(dying, axis=1)
        fd = jnp.argmax(dying, axis=1)             # longest-end casualty
        e_start = i + 1
        e_end = st["pe"][bidx, fd]
        e_k = st["pk"][bidx, fd]
        e_s = st["ps"][bidx, fd]
        emit = has & any_die & (e_end - e_start >= min_seed_len) \
            & (st["n"] < max_seeds)
        hot = emit[:, None] & (jnp.arange(max_seeds)[None, :]
                               == st["n"][:, None])
        st["qbeg"] = jnp.where(hot, e_start[:, None], st["qbeg"])
        st["qend"] = jnp.where(hot, e_end[:, None], st["qend"])
        st["intv_l"] = jnp.where(hot, e_k[:, None], st["intv_l"])
        st["intv_sz"] = jnp.where(hot, e_s[:, None], st["intv_sz"])
        st["n"] = st["n"] + emit.astype(jnp.int32)
        st["nfull"] = st["nfull"] + (has & any_die
                                     & (e_end - e_start >= min_seed_len)
                                     & (st["n"] >= max_seeds)
                                     ).astype(jnp.int32)
        # survivors: intervals are nested along j (sizes non-decreasing)
        # so the dying set is a prefix; drop kept entries duplicating the
        # previous kept entry's size (bwa's curr.back() size dedup)
        prev_sz = jnp.concatenate(
            [jnp.full((B, 1), -1, jnp.int32), ns[:, :-1]], axis=1)
        prev_ok = jnp.concatenate(
            [jnp.zeros((B, 1), bool), ext_ok[:, :-1]], axis=1)
        dup = ext_ok & prev_ok & (ns == prev_sz)
        keep = ext_ok & ~dup
        order = jnp.argsort(~keep, axis=1, stable=True)
        st["pk"] = jnp.take_along_axis(nk, order, axis=1)
        st["pl"] = jnp.take_along_axis(nl, order, axis=1)
        st["ps"] = jnp.take_along_axis(ns, order, axis=1)
        st["pe"] = jnp.take_along_axis(st["pe"], order, axis=1)
        st["pn"] = jnp.sum(keep, axis=1).astype(jnp.int32)
        st["i"] = i - 1
        st["it"] = st["it"] + 1
        return st

    st = jax.lax.while_loop(bcond, bbody, bwd)
    acc = {k: st[k] for k in ("qbeg", "qend", "intv_l", "intv_sz",
                              "n", "nfull")}
    return acc, ret_x


@functools.partial(jax.jit, static_argnames=("max_seeds", "min_seed_len",
                                              "max_prev"))
def smem_collect(fm: DeviceFMIndex, reads: jax.Array, lens: jax.Array,
                 max_seeds: int = 16, min_seed_len: int = 19,
                 max_prev: int = 8):
    """All bidirectional SMEMs of a read batch (bwa ``mem_collect_intv``
    first pass): pivot x starts at 0; each round runs ``bwt_smem1`` at
    x (forward bi-extension recording every interval-size drop, then a
    backward sweep emitting maximal matches), and x jumps to the end of
    the round's longest forward extension.

    Unlike the greedy backward-only scan (collect_seeds), this emits
    SMEMs on BOTH sides of repeat cores — the re-seeding parity gap
    called out in round 1.

    Returns the collect_seeds dict (qbeg, qend exclusive, intv_l,
    intv_sz, n_seeds) so it is a drop-in seeder."""
    B, L = reads.shape
    acc = dict(qbeg=jnp.zeros((B, max_seeds), jnp.int32),
               qend=jnp.zeros((B, max_seeds), jnp.int32),
               intv_l=jnp.zeros((B, max_seeds), jnp.int32),
               intv_sz=jnp.zeros((B, max_seeds), jnp.int32),
               n=jnp.zeros(B, jnp.int32),
               nfull=jnp.zeros(B, jnp.int32))
    one = jnp.ones(B, jnp.int32)

    def cond(st):
        x, acc, it = st
        return jnp.any(x < lens) & (it < L)

    def body(st):
        x, acc, it = st
        active = x < lens
        acc, ret = _smem_round(fm, reads, lens, x, one, active, acc,
                               min_seed_len, max_seeds, max_prev)
        return (jnp.where(active, ret, x), acc, it + 1)

    x0 = jnp.zeros(B, jnp.int32)
    _, acc, _ = jax.lax.while_loop(cond, body, (x0, acc, jnp.int32(0)))
    return dict(qbeg=acc["qbeg"], qend=acc["qend"],
                intv_l=acc["intv_l"], intv_sz=acc["intv_sz"],
                n_seeds=acc["n"], n_dropped=acc["nfull"])


@functools.partial(jax.jit, static_argnames=("min_seed_len", "max_prev"))
def smem_reseed(fm: DeviceFMIndex, reads: jax.Array, lens: jax.Array,
                qb: jax.Array, qe: jax.Array, occ: jax.Array,
                active: jax.Array, min_seed_len: int = 19,
                max_prev: int = 8):
    """Bidirectional re-seeding of one long seed per read (bwa's 2nd
    ``mem_collect_intv`` pass): ``bwt_smem1`` from the seed midpoint
    with min_intv = occ + 1, keeping the LONGEST qualifying SMEM.
    Replaces the round-1 backward-only ``reseed_scan`` (which captured
    about half the repeat core).

    Returns (qbeg2, qend2, intv_l2, intv_sz2), zeros where nothing
    qualified."""
    B, L = reads.shape
    R = 4
    acc = dict(qbeg=jnp.zeros((B, R), jnp.int32),
               qend=jnp.zeros((B, R), jnp.int32),
               intv_l=jnp.zeros((B, R), jnp.int32),
               intv_sz=jnp.zeros((B, R), jnp.int32),
               n=jnp.zeros(B, jnp.int32),
               nfull=jnp.zeros(B, jnp.int32))
    mid = (qb + qe) // 2
    acc, _ = _smem_round(fm, reads, lens, mid, occ + 1, active, acc,
                         min_seed_len, R, max_prev)
    slen = acc["qend"] - acc["qbeg"]
    valid = jnp.arange(R)[None, :] < acc["n"][:, None]
    pick = jnp.argmax(jnp.where(valid, slen, -1), axis=1)
    bidx = jnp.arange(B)
    got = valid[bidx, pick] & active
    z = jnp.zeros(B, jnp.int32)
    return (jnp.where(got, acc["qbeg"][bidx, pick], z),
            jnp.where(got, acc["qend"][bidx, pick], z),
            jnp.where(got, acc["intv_l"][bidx, pick], z),
            jnp.where(got, acc["intv_sz"][bidx, pick], z))
