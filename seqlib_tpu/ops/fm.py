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




def _unroll() -> int:
    """Machine steps fused per while iteration.

    U=16 measured best end-to-end on the axon runtime (12.9k -> 14.2k
    reads/s vs U=8; U=32 regresses to 13.7k) — the per-iteration fixed
    cost amortizes across more fused steps until the <=U-1 no-op
    overshoot after the last lane finishes starts to dominate.

    SEQLIB_SMEM_UNROLL overrides, but is read at TRACE time only: the
    jit cache keys on shapes, not env vars, so changing it after the
    first compile has no effect (sweep it with one subprocess per
    value — scripts/ sweeps do).  Non-numeric values fall back to the
    default instead of raising mid-trace (ADVICE r4)."""
    import os
    try:
        u = int(os.environ.get("SEQLIB_SMEM_UNROLL", "0"))
    except ValueError:
        u = 0
    return u or (16 if jax.default_backend() != "cpu" else 2)


def packed_while_loop(cond, body, init):
    """``lax.while_loop`` over a dict state, with the carry packed into
    ONE tensor per distinct array shape (scalars pass through).

    Motivation (measured on the axon runtime, docs/SEED_MACHINE.md):
    every loop iteration pays a fixed cost PER CARRIED BUFFER — 24
    separate [B] carries ran 2.7 ms/iter where one [24, B] carry ran
    0.19 ms.  The stack/unstack happens inside the fused body, where
    the data movement is ~free.  Arrays must be int32 or bool (bools
    ride as int32 rows and are converted back on unpack).
    """
    keys = sorted(init)
    groups: dict = {}
    scalars = []
    for k in keys:
        v = init[k]
        if getattr(v, "ndim", 0) == 0:
            scalars.append(k)
        else:
            assert v.dtype in (jnp.int32, jnp.bool_), (k, v.dtype)
            groups.setdefault(v.shape, []).append(k)
    bools = {k for k in keys if getattr(init[k], "ndim", 0)
             and init[k].dtype == jnp.bool_}
    shs = sorted(groups, key=str)

    def pack(d):
        t = tuple(jnp.stack([d[k].astype(jnp.int32) for k in groups[sh]])
                  for sh in shs)
        return t + tuple(d[k] for k in scalars)

    def unpack(c):
        d = {}
        for t, sh in zip(c, shs):
            for j, k in enumerate(groups[sh]):
                d[k] = t[j].astype(jnp.bool_) if k in bools else t[j]
        for k, v in zip(scalars, c[len(shs):]):
            d[k] = v
        return d

    out = jax.lax.while_loop(lambda c: cond(unpack(c)),
                             lambda c: pack(body(unpack(c))), pack(init))
    return unpack(out)


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

    st = packed_while_loop(cond, body2, init)
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

    def cond(d):
        return (~jnp.all(d["done"])) & (d["it"] < L)

    def body(d):
        l, u, p, done = d["l"], d["u"], d["p"], d["done"]
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
        return dict(l=jnp.where(keep, nl, l), u=jnp.where(keep, nu, u),
                    p=jnp.where(keep, p - 1, p), done=stop,
                    bl=jnp.where(best_now, nl, d["bl"]),
                    bu=jnp.where(best_now, nu, d["bu"]),
                    bp=jnp.where(best_now, p, d["bp"]),
                    it=d["it"] + 1)

    init = dict(l=jnp.zeros(B, jnp.int32), u=jnp.full(B, n1, jnp.int32),
                p=e, done=~active,
                bl=jnp.zeros(B, jnp.int32), bu=jnp.zeros(B, jnp.int32),
                bp=jnp.full(B, -1, jnp.int32), it=jnp.int32(0))
    st = packed_while_loop(cond, body, init)
    bl, bu, bp = st["bl"], st["bu"], st["bp"]
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
    if fm.sa_intv == 1:        # full SA resident: a single gather
        pos = jnp.where(r0 == fm.primary, 0, fm.sa_samples[r0])
        return jnp.where(ranks < 0, -1, pos)
    done0 = (r0 % fm.sa_intv == 0) | (r0 == fm.primary)

    def cond(d):
        return (~jnp.all(d["done"])) & (d["it"] < 64 * fm.sa_intv)

    def body(d):
        r, steps, done = d["r"], d["steps"], d["done"]
        pos_in_bwt = r - (r > fm.primary).astype(jnp.int32)
        c = bwt_char(fm, jnp.maximum(pos_in_bwt, 0))
        lf = fm.L2[c] + 1 + rank_full(fm, c, r)
        r_next = jnp.where(done, r, lf)
        steps_next = jnp.where(done, steps, steps + 1)
        done_next = done | (r_next % fm.sa_intv == 0) \
            | (r_next == fm.primary)
        return dict(r=r_next, steps=steps_next, done=done_next,
                    it=d["it"] + 1)

    st = packed_while_loop(
        cond, body,
        dict(r=r0, steps=jnp.zeros_like(r0), done=done0,
             it=jnp.int32(0)))
    r, steps = st["r"], st["steps"]
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


_M_INIT, _M_FWD, _M_BWD, _M_DONE = 0, 1, 2, 3


def _machine_impl():
    """Production SMEM machine implementation.

    Default: the unrolled pure-XLA machine.  The alternative
    single-kernel-per-step Pallas implementation (ops/fm_pallas.py,
    bit-identical — cross-checked by tests/test_fm_pallas.py) is
    opt-in via SEQLIB_SMEM_PALLAS=1: on the current axon-tunneled
    runtime each pallas_call pays ~270 us launch + ~600 us/MB buffer
    staging (measured, docs/SEED_MACHINE.md), which at one call per
    machine step loses to the XLA loop; on directly-attached TPUs
    (us-scale kernel launch) the Pallas step is the faster design."""
    import os
    if (jax.default_backend() != "cpu"
            and os.environ.get("SEQLIB_SMEM_PALLAS") == "1"):
        from .fm_pallas import smem_machine_pallas
        return smem_machine_pallas
    return _smem_machine


def _smem_machine(fm: DeviceFMIndex, reads, lens, x0, min_intv, active,
                  max_seeds: int, min_seed_len: int, C: int,
                  max_rounds: int, step_cap: int,
                  p3_seeds: int = 0, p3_max_intv: int = 20):
    """Lockstep per-lane SMEM state machine — ONE flat while_loop, ONE
    scalar-per-lane FMD extension per step.

    Each lane independently walks bwa's ``mem_collect_intv`` round
    structure (``bwt_smem1`` per pivot: forward bi-extension pushing an
    interval on every size drop, then a backward sweep emitting maximal
    matches; next pivot = end of the longest forward extension).

    Two structural deviations from the C loop nest, chosen from
    measured TPU cost (docs/SEED_MACHINE.md):

    * The 3-deep while nest (rounds > fwd/bwd phases) is flattened to a
      per-lane (INIT|FWD|BWD|DONE) machine, so the trip count is the
      max of per-lane TOTALS (~256 for a 2048x150bp wgsim batch), not
      the sum of per-phase batch maxima.
    * The backward sweep processes its stack entries SEQUENTIALLY
      (entry j+1 restarts at the pivot after entry j dies) instead of
      extending all C entries in lockstep: per-step rank volume drops
      from [B, C] to [B], which is ~4x cheaper on this hardware while
      typical sweeps are 1-3 steps.  bwa's emission rule — a dying
      entry emits only when no longer-end entry survived the same step
      and the start is not contained in the previous emission — is
      equivalent, for nested entries with non-decreasing sizes, to
      "emit iff this entry died strictly deeper than the previous
      emission", a scalar ``last_i`` check (proof in
      docs/SEED_MACHINE.md).

    Semantics are pinned by tests/test_smem.py's brute-force oracle.

    x0 [B]: initial pivot per lane.  min_intv [B]: minimum interval
    size (1 for plain collection; occ+1 for re-seeding).  max_rounds
    bounds rounds per lane (L = unbounded; 1 = re-seed).  step_cap
    bounds total machine steps; lanes still unfinished are counted in
    n_dropped (telemetry, never silent).

    Returns dict(qbeg, qend, intv_l, intv_sz [B, max_seeds], n_seeds,
    n_dropped [B]).

    ``p3_seeds > 0`` additionally runs bwa's third seeding pass
    (``bwt_seed_strategy1``, see seed_strategy_collect) CONCURRENTLY in
    the same while loop: the two scans are independent, so fusing them
    makes total iterations max(steps_smem, steps_p3) instead of their
    sum, and their per-step rank queries share one stacked [2, B]
    gather.  Adds p3_qbeg/p3_qend/p3_intv_l/p3_intv_sz [B, p3_seeds]
    and p3_n to the result.
    """
    B, L = reads.shape
    bidx = jnp.arange(B)
    cidx = jnp.arange(C, dtype=jnp.int32)[None, :]
    sidx = jnp.arange(max_seeds, dtype=jnp.int32)[None, :]
    L2 = fm.L2
    z_b = jnp.zeros(B, jnp.int32)
    z_bc = jnp.zeros((B, C), jnp.int32)

    # The stack is a CIRCULAR buffer: ``sn`` counts pushes this round
    # (unbounded), entry j lives at physical slot j % C, and only the
    # newest C entries are addressable (older ones were overwritten —
    # the same drop-OLDEST policy the previous roll-on-full
    # implementation had, without paying a [B, C] roll+select of all
    # four stack arrays on every push step).  qbeg/qend emissions are
    # packed into one int32 (qb << 16 | qe) to shave a fourth [B, S]
    # array off the per-step state traffic.
    st = dict(
        mode=jnp.where(active & (x0 < lens), _M_INIT,
                       _M_DONE).astype(jnp.int32),
        x=x0.astype(jnp.int32), nx=z_b, i=z_b,
        k=z_b, l=z_b, s=z_b, end=z_b,        # fwd interval / cursor
        sk=z_bc, sl=z_bc, ss=z_bc, se=z_bc,  # per-round circular stack
        sn=z_b,                              # total pushes this round
        bj=z_b,                              # bwd: entry index (abs)
        bk=z_b, bl=z_b, bs=z_b, be=z_b,      # bwd: entry interval/end
        last_i=z_b,                          # bwd: prev emission depth
        rounds=z_b,
        qspan=jnp.zeros((B, max_seeds), jnp.int32),   # qb << 16 | qe
        intv_l=jnp.zeros((B, max_seeds), jnp.int32),
        intv_sz=jnp.zeros((B, max_seeds), jnp.int32),
        n=z_b, nfull=z_b, it=jnp.int32(0),
    )
    if p3_seeds:
        st.update(
            px=z_b, pi=z_b, pk=z_b, pl=z_b, ps=z_b,
            pneed=jnp.ones(B, jnp.bool_),
            pdone=lens.astype(jnp.int32) <= 0,
            p_qspan=jnp.zeros((B, p3_seeds), jnp.int32),
            p_il=jnp.zeros((B, p3_seeds), jnp.int32),
            p_isz=jnp.zeros((B, p3_seeds), jnp.int32),
            pn=z_b, pnfull=z_b)
        pidx = jnp.arange(p3_seeds, dtype=jnp.int32)[None, :]

    def body(st):
        mode = st["mode"]
        is_fwd = mode == _M_FWD
        is_bwd = mode == _M_BWD
        ip = st["i"]

        # ---- strategy-pass (p3) INIT fold-in: start a fresh seed ---
        if p3_seeds:
            p_init = st["pneed"] & ~st["pdone"]
            px = st["px"]
            pc0 = jnp.where(p_init, reads[bidx, jnp.clip(px, 0, L - 1)],
                            4).astype(jnp.int32)
            pc0c = jnp.minimum(pc0, 3)
            p_ok0 = p_init & (pc0 < 4)
            p_skip0 = p_init & ~p_ok0
            pk = jnp.where(p_ok0, (L2[pc0c] + 1).astype(jnp.int32),
                           st["pk"])
            pl = jnp.where(p_ok0, (L2[3 - pc0c] + 1).astype(jnp.int32),
                           st["pl"])
            ps = jnp.where(p_ok0,
                           (L2[pc0c + 1] - L2[pc0c]).astype(jnp.int32),
                           st["ps"])
            pi = jnp.where(p_ok0, px + 1, st["pi"])
            px = jnp.where(p_skip0, px + 1, px)
            pneed = st["pneed"] & ~p_ok0
            p_ext = ~pneed & ~st["pdone"]
        if p3_seeds:
            # ONE stacked reads gather serves both scans
            idx2 = jnp.stack([jnp.clip(ip, 0, L - 1),
                              jnp.clip(pi, 0, L - 1)], axis=0)
            ch2 = reads[jnp.broadcast_to(bidx, (2, B)),
                        idx2].astype(jnp.int32)
            ch_raw = ch2[0]
        else:
            ch_raw = reads[bidx, jnp.clip(ip, 0, L - 1)].astype(jnp.int32)
        ch = jnp.where((is_fwd & (ip < lens)) | (is_bwd & (ip >= 0)),
                       ch_raw, 4)
        ch_ok = ch < 4

        # ONE [B] FMD extension for both phases: fwd passes mirrored
        # operands (l, k) and selects complement(ch); bwd passes (bk,
        # bl) directly and selects ch.  With p3, the strategy scan's
        # forward extension rides the same call as a second row.
        Ain = jnp.where(is_fwd, st["l"], st["bk"])
        Bin = jnp.where(is_fwd, st["k"], st["bl"])
        Sin = jnp.where(is_fwd, st["s"], st["bs"])
        if p3_seeds:
            A2 = jnp.stack([Ain, pl], axis=0)
            B2 = jnp.stack([Bin, pk], axis=0)
            S2 = jnp.stack([Sin, ps], axis=0)
            K4s, L4s, S4s = bi_extend_back(fm, A2, B2, S2)  # [2, B, 4]
            K4, L4, S4 = K4s[0], L4s[0], S4s[0]
        else:
            K4, L4, S4 = bi_extend_back(fm, Ain, Bin, Sin)   # [B, 4]

        # ---- strategy-pass step (bwt_seed_strategy1 semantics,
        # mirrors seed_strategy_collect exactly) ---------------------
        if p3_seeds:
            pch = jnp.where(p_ext & (pi < lens), ch2[1], 4)
            pch_ok = pch < 4
            pcc = jnp.clip(3 - pch, 0, 3)
            pnk = _take4(L4s[1], pcc)
            pnl = _take4(K4s[1], pcc)
            pns = _take4(S4s[1], pcc)
            p_hit = p_ext & pch_ok & (pns < p3_max_intv) \
                & (pi - px >= min_seed_len)
            p_bad = p_ext & ~pch_ok
            p_emit = p_hit & (pns > 0)
            p_can = p_emit & (st["pn"] < p3_seeds)
            p_hot = p_can[:, None] & (pidx == st["pn"][:, None])
            p_qspan = jnp.where(
                p_hot, ((px << 16) | (pi + 1))[:, None], st["p_qspan"])
            p_il = jnp.where(p_hot, pnk[:, None], st["p_il"])
            p_isz = jnp.where(p_hot, pns[:, None], st["p_isz"])
            pn = st["pn"] + p_can.astype(jnp.int32)
            pnfull = st["pnfull"] + (p_emit & ~p_can).astype(jnp.int32)
            p_restart = p_hit | p_bad
            p_adv = p_ext & ~p_restart
            pk = jnp.where(p_adv, pnk, pk)
            pl = jnp.where(p_adv, pnl, pl)
            ps = jnp.where(p_adv, pns, ps)
            p_newx = jnp.where(p_restart, pi + 1, px)
            p_newneed = pneed | p_restart
            pi = jnp.where(p_adv, pi + 1, pi)
            pdone = st["pdone"] | (p_newneed & (p_newx >= lens))
        cc = jnp.where(is_fwd, jnp.clip(3 - ch, 0, 3),
                       jnp.minimum(ch, 3))
        nk = jnp.where(is_fwd, _take4(L4, cc), _take4(K4, cc))
        nl = jnp.where(is_fwd, _take4(K4, cc), _take4(L4, cc))
        ns = _take4(S4, cc)

        # ---- FWD lanes (bwa bwt_smem1 forward loop) ----------------
        f_ok = is_fwd & ch_ok
        changed = f_ok & (ns != st["s"])
        die = changed & (ns < min_intv)
        hit_end = is_fwd & ~ch_ok
        push = changed | hit_end          # push the OLD (k,l,s,end)
        hot_p = push[:, None] & (cidx == (st["sn"] % C)[:, None])
        sk = jnp.where(hot_p, st["k"][:, None], st["sk"])
        sl = jnp.where(hot_p, st["l"][:, None], st["sl"])
        ss = jnp.where(hot_p, st["s"][:, None], st["ss"])
        se = jnp.where(hot_p, st["end"][:, None], st["se"])
        sn = st["sn"] + push.astype(jnp.int32)
        adv = f_ok & ~die
        k = jnp.where(adv, nk, st["k"])
        l = jnp.where(adv, nl, st["l"])
        s = jnp.where(adv, ns, st["s"])
        end = jnp.where(adv, ip + 1, st["end"])
        fwd_dead = die | hit_end
        nx = jnp.where(fwd_dead, end, st["nx"])

        # ---- BWD lanes: extend ONE stack entry; on death, emit and
        # move to the next (shorter-end) entry --------------------------
        b_die = is_bwd & (~ch_ok | (ns < min_intv))
        b_adv = is_bwd & ~b_die
        e_start = ip + 1
        want = b_die & (st["be"] - e_start >= min_seed_len) \
            & (e_start < st["last_i"] + 1)
        emit = want & (st["n"] < max_seeds)
        hot_e = emit[:, None] & (sidx == st["n"][:, None])
        qspan = jnp.where(
            hot_e, ((e_start << 16) | st["be"])[:, None], st["qspan"])
        intv_l = jnp.where(hot_e, st["bk"][:, None], st["intv_l"])
        intv_sz = jnp.where(hot_e, st["bs"][:, None], st["intv_sz"])
        n = st["n"] + emit.astype(jnp.int32)
        nfull = st["nfull"] + (want & ~emit).astype(jnp.int32)
        last_i = jnp.where(emit, ip, st["last_i"])

        # next entry (walk bj downward; only the newest C survive) or
        # round end
        bj1 = st["bj"] - 1
        bwd_done = b_die & ((bj1 < 0) | (bj1 < sn - C))
        to_entry = b_die & ~bwd_done      # load stack[bj1], restart
        rounds = st["rounds"] + bwd_done.astype(jnp.int32)

        x = jnp.where(bwd_done, nx, st["x"])
        i = jnp.where(is_fwd | to_entry,
                      jnp.where(f_ok & ~fwd_dead, ip + 1, st["x"] - 1),
                      jnp.where(b_adv, ip - 1, ip))
        # ONE stack load serves both entries: fwd death enters BWD at
        # the top (sn - 1), a bwd death restarts at bj1
        bj = jnp.where(fwd_dead, sn - 1, jnp.where(b_die, bj1, st["bj"]))
        need_load = fwd_dead | to_entry
        hot_l = need_load[:, None] \
            & (cidx == (jnp.maximum(bj, 0) % C)[:, None])

        def sel(arr, hot):
            return jnp.sum(jnp.where(hot, arr, 0), axis=1)

        bk = jnp.where(need_load, sel(sk, hot_l),
                       jnp.where(b_adv, nk, st["bk"]))
        bl = jnp.where(need_load, sel(sl, hot_l),
                       jnp.where(b_adv, nl, st["bl"]))
        bs = jnp.where(need_load, sel(ss, hot_l),
                       jnp.where(b_adv, ns, st["bs"]))
        be = jnp.where(need_load, sel(se, hot_l), st["be"])
        last_i = jnp.where(fwd_dead, jnp.int32(2**30), last_i)
        mode = jnp.where(fwd_dead, _M_BWD,
                         jnp.where(bwd_done,
                                   jnp.where(rounds >= max_rounds,
                                             _M_DONE, _M_INIT), mode))

        # ---- INIT fold-in (start the next round this same step) ----
        is_init = mode == _M_INIT
        past = x >= lens
        c0 = jnp.where(is_init & ~past,
                       reads[bidx, jnp.clip(x, 0, L - 1)],
                       4).astype(jnp.int32)
        c0c = jnp.minimum(c0, 3)
        s0 = (L2[c0c + 1] - L2[c0c]).astype(jnp.int32)
        ok0 = is_init & ~past & (c0 < 4) & (s0 >= min_intv) & (s0 > 0)
        skip = is_init & ~past & ~ok0     # invalid base: pivot += 1
        x = jnp.where(skip, x + 1, x)
        # a failed init consumes a round too (a bounded-rounds caller —
        # re-seeding — must not retry at the next pivot)
        rounds = rounds + skip.astype(jnp.int32)
        mode = jnp.where(is_init & past, _M_DONE,
                         jnp.where(ok0, _M_FWD,
                                   jnp.where(skip & (rounds >= max_rounds),
                                             _M_DONE, mode)))
        k = jnp.where(ok0, (L2[c0c] + 1).astype(jnp.int32), k)
        l = jnp.where(ok0, (L2[3 - c0c] + 1).astype(jnp.int32), l)
        s = jnp.where(ok0, s0, s)
        end = jnp.where(ok0, x + 1, end)
        i = jnp.where(ok0, x + 1, i)
        sn = jnp.where(ok0, 0, sn)

        out = dict(mode=mode, x=x, nx=nx, i=i, k=k, l=l, s=s, end=end,
                   sk=sk, sl=sl, ss=ss, se=se, sn=sn,
                   bj=bj, bk=bk, bl=bl, bs=bs, be=be, last_i=last_i,
                   rounds=rounds, qspan=qspan, intv_l=intv_l,
                   intv_sz=intv_sz, n=n, nfull=nfull,
                   it=st["it"] + 1)
        if p3_seeds:
            out.update(px=p_newx, pi=pi, pk=pk, pl=pl, ps=ps,
                       pneed=p_newneed, pdone=pdone, p_qspan=p_qspan,
                       p_il=p_il, p_isz=p_isz, pn=pn, pnfull=pnfull)
        return out

    def cond(st):
        busy = jnp.any(st["mode"] != _M_DONE)
        if p3_seeds:
            busy = busy | jnp.any(~st["pdone"])
        return busy & (st["it"] < step_cap)

    # Unrolled machine steps per while iteration: every iteration of a
    # device loop pays a fixed cost PLUS a carry-staging cost
    # (~250 us/MB measured through the axon runtime — the loop carry
    # here is ~0.45 KB/lane), so running U steps per iteration cuts
    # that overhead by U.  DONE lanes are no-ops, so the <=U-1 step
    # overshoot after the last lane finishes is free of semantics.
    U = _unroll()

    def bodyU(st):
        for _ in range(U):
            st = body(st)
        return st

    # The while carry is packed into THREE tensors + a scalar: the
    # runtime charges a fixed per-BUFFER cost every loop iteration
    # (measured 14x: 24 separate [B] carries ran 2.7 ms/iter vs
    # 0.19 ms for one [24, B] carry), so ~30 loose state arrays are
    # stacked/unstacked inside the fused body where the movement is
    # free.  Bool fields ride as int32 rows.
    scalar_keys = ["mode", "x", "nx", "i", "k", "l", "s", "end", "sn",
                   "bj", "bk", "bl", "bs", "be", "last_i", "rounds",
                   "n", "nfull"]
    bool_keys = set()
    if p3_seeds:
        scalar_keys += ["px", "pi", "pk", "pl", "ps", "pneed", "pdone",
                        "pn", "pnfull"]
        bool_keys = {"pneed", "pdone"}
    mat_keys = ("sk", "sl", "ss", "se")
    em_keys = ("qspan", "intv_l", "intv_sz")
    p3_em = ("p_qspan", "p_il", "p_isz")

    def pack(d):
        sv = jnp.stack([d[k].astype(jnp.int32) for k in scalar_keys])
        mt = jnp.stack([d[k] for k in mat_keys])
        if p3_seeds:
            em = jnp.stack([jnp.concatenate([d[a], d[b]], axis=1)
                            for a, b in zip(em_keys, p3_em)])
        else:
            em = jnp.stack([d[k] for k in em_keys])
        return sv, mt, em, d["it"]

    def unpack(c):
        sv, mt, em, it = c
        d = {k: (sv[j] != 0 if k in bool_keys else sv[j])
             for j, k in enumerate(scalar_keys)}
        for j, k in enumerate(mat_keys):
            d[k] = mt[j]
        if p3_seeds:
            for j, (a, b) in enumerate(zip(em_keys, p3_em)):
                d[a] = em[j, :, :max_seeds]
                d[b] = em[j, :, max_seeds:]
        else:
            for j, k in enumerate(em_keys):
                d[k] = em[j]
        d["it"] = it
        return d

    st = unpack(jax.lax.while_loop(
        lambda c: cond(unpack(c)),
        lambda c: pack(bodyU(unpack(c))), pack(st)))
    truncated = (st["mode"] != _M_DONE).astype(jnp.int32)
    out = dict(qbeg=st["qspan"] >> 16, qend=st["qspan"] & 0xFFFF,
               intv_l=st["intv_l"],
               intv_sz=st["intv_sz"], n_seeds=st["n"],
               n_dropped=st["nfull"] + truncated)
    if p3_seeds:
        out.update(p3_qbeg=st["p_qspan"] >> 16,
                   p3_qend=st["p_qspan"] & 0xFFFF,
                   p3_intv_l=st["p_il"], p3_intv_sz=st["p_isz"],
                   p3_n=st["pn"])
    return out


@functools.partial(jax.jit, static_argnames=("max_seeds", "min_seed_len",
                                              "max_prev", "p3_seeds",
                                              "p3_max_intv"))
def smem_collect(fm: DeviceFMIndex, reads: jax.Array, lens: jax.Array,
                 max_seeds: int = 16, min_seed_len: int = 19,
                 max_prev: int = 8, p3_seeds: int = 0,
                 p3_max_intv: int = 20):
    """All bidirectional SMEMs of a read batch (bwa ``mem_collect_intv``
    first pass): pivot x starts at 0; each round runs ``bwt_smem1`` at
    x (forward bi-extension recording every interval-size drop, then a
    backward sweep emitting maximal matches), and x jumps to the end of
    the round's longest forward extension.

    Unlike the greedy backward-only scan (collect_seeds), this emits
    SMEMs on BOTH sides of repeat cores — the re-seeding parity gap
    called out in round 1.  Implemented as a flat per-lane state
    machine (_smem_machine) — see its docstring for why.

    Returns the collect_seeds dict (qbeg, qend exclusive, intv_l,
    intv_sz, n_seeds) so it is a drop-in seeder."""
    B, L = reads.shape
    # the fused p3 scan exists only in the XLA machine; the Pallas
    # machine (opt-in) covers the plain-SMEM contract
    impl = _smem_machine if p3_seeds else _machine_impl()
    kw = dict(p3_seeds=p3_seeds, p3_max_intv=p3_max_intv) \
        if p3_seeds else {}
    return impl(
        fm, reads, lens,
        x0=jnp.zeros(B, jnp.int32),
        min_intv=jnp.ones(B, jnp.int32),
        active=lens > 0,
        max_seeds=max_seeds, min_seed_len=min_seed_len, C=max_prev,
        max_rounds=L, step_cap=4 * L + 16, **kw)


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
    mid = (qb + qe) // 2
    acc = _machine_impl()(
        fm, reads, lens, x0=mid, min_intv=occ + 1, active=active,
        max_seeds=R, min_seed_len=min_seed_len, C=max_prev,
        max_rounds=1, step_cap=2 * L + 8)
    slen = acc["qend"] - acc["qbeg"]
    valid = jnp.arange(R)[None, :] < acc["n_seeds"][:, None]
    pick = jnp.argmax(jnp.where(valid, slen, -1), axis=1)
    bidx = jnp.arange(B)
    got = valid[bidx, pick] & active
    z = jnp.zeros(B, jnp.int32)
    return (jnp.where(got, acc["qbeg"][bidx, pick], z),
            jnp.where(got, acc["qend"][bidx, pick], z),
            jnp.where(got, acc["intv_l"][bidx, pick], z),
            jnp.where(got, acc["intv_sz"][bidx, pick], z))


@functools.partial(jax.jit, static_argnames=("max_seeds", "min_seed_len",
                                             "max_intv"))
def seed_strategy_collect(fm: DeviceFMIndex, reads: jax.Array,
                          lens: jax.Array, max_seeds: int = 8,
                          min_seed_len: int = 19, max_intv: int = 20):
    """bwa's THIRD seeding pass (``bwt_seed_strategy1`` driven by
    ``opt->max_mem_intv``, default 20): from each start x, forward-
    extend until the interval size first drops below ``max_intv`` with
    length >= min_seed_len, emit that seed (if its interval is
    non-empty), and restart at the next position.

    This pass exists because SMEMs are SUPERmaximal: a read whose full
    length matches one locus exactly yields a single occ-1 SMEM, so a
    second locus sharing only an interior substring produces NO seed
    from passes 1-2 and is silently unreachable (caught by
    tests/test_record_oracle.py — a 3-mismatch planted copy vanished).
    bwa's pass 3 tiles the read with short low-occurrence seeds that
    recover such loci.

    Lockstep flat machine, one [B] forward FMD extension per step;
    ~L steps per lane total (each position is consumed once).

    Returns dict(qbeg, qend, intv_l, intv_sz [B, max_seeds], n_seeds,
    n_dropped [B])."""
    B, L = reads.shape
    bidx = jnp.arange(B)
    sidx = jnp.arange(max_seeds, dtype=jnp.int32)[None, :]
    L2 = fm.L2
    z_b = jnp.zeros(B, jnp.int32)
    lens = lens.astype(jnp.int32)

    st = dict(
        x=z_b, i=z_b, k=z_b, l=z_b, s=z_b,
        need_init=jnp.ones(B, jnp.bool_),
        done=lens <= 0,
        qbeg=jnp.zeros((B, max_seeds), jnp.int32),
        qend=jnp.zeros((B, max_seeds), jnp.int32),
        intv_l=jnp.zeros((B, max_seeds), jnp.int32),
        intv_sz=jnp.zeros((B, max_seeds), jnp.int32),
        n=z_b, nfull=z_b, it=jnp.int32(0))

    def body(st):
        st = dict(st)
        # ---- INIT: start a fresh seed at x -------------------------
        init = st["need_init"] & ~st["done"]
        x = st["x"]
        c0 = jnp.where(init, reads[bidx, jnp.clip(x, 0, L - 1)],
                       4).astype(jnp.int32)
        c0c = jnp.minimum(c0, 3)
        ok0 = init & (c0 < 4)
        skip0 = init & ~ok0                 # N at x: restart at x+1
        k = jnp.where(ok0, (L2[c0c] + 1).astype(jnp.int32), st["k"])
        l = jnp.where(ok0, (L2[3 - c0c] + 1).astype(jnp.int32), st["l"])
        s = jnp.where(ok0, (L2[c0c + 1] - L2[c0c]).astype(jnp.int32),
                      st["s"])
        i = jnp.where(ok0, x + 1, st["i"])
        x = jnp.where(skip0, x + 1, x)
        need_init = st["need_init"] & ~ok0
        ext = ~need_init & ~st["done"]

        # ---- one forward FMD extension by reads[i] -----------------
        ip = jnp.where(ext, i, 0)
        ch = jnp.where(ext & (ip < lens),
                       reads[bidx, jnp.clip(ip, 0, L - 1)],
                       4).astype(jnp.int32)
        ch_ok = ch < 4
        K4, L4, S4 = bi_extend_back(fm, l, k, s)
        cc = jnp.clip(3 - ch, 0, 3)
        nk = _take4(L4, cc)
        nl = _take4(K4, cc)
        ns = _take4(S4, cc)
        # bwt_seed_strategy1: emit when size < max_intv AND
        # ``i - x >= min_seed_len`` — i.e. seed LENGTH >= min_seed_len
        # + 1, bwa's exact (off-by-one) condition.  Empty intervals
        # are dropped by the caller; restart at i+1 on emit-condition
        # OR on an invalid base.
        hit = ext & ch_ok & (ns < max_intv) & (i - x >= min_seed_len)
        bad = ext & ~ch_ok                  # N at i, or i >= len
        emit = hit & (ns > 0)
        can = emit & (st["n"] < max_seeds)
        hot = can[:, None] & (sidx == st["n"][:, None])
        st["qbeg"] = jnp.where(hot, x[:, None], st["qbeg"])
        st["qend"] = jnp.where(hot, (i + 1)[:, None], st["qend"])
        st["intv_l"] = jnp.where(hot, nk[:, None], st["intv_l"])
        st["intv_sz"] = jnp.where(hot, ns[:, None], st["intv_sz"])
        st["n"] = st["n"] + can.astype(jnp.int32)
        st["nfull"] = st["nfull"] + (emit & ~can).astype(jnp.int32)

        restart = hit | bad
        adv = ext & ~restart
        st["k"] = jnp.where(adv, nk, k)
        st["l"] = jnp.where(adv, nl, l)
        st["s"] = jnp.where(adv, ns, s)
        new_x = jnp.where(restart, i + 1, x)
        new_need = need_init | restart
        st["x"] = new_x
        st["i"] = jnp.where(adv, i + 1, i)
        st["need_init"] = new_need
        # a lane finishes when its next start position is past the read
        st["done"] = st["done"] | (new_need & (new_x >= lens))
        st["it"] = st["it"] + 1
        return st

    def cond(st):
        return jnp.any(~st["done"]) & (st["it"] < 2 * L + 8)

    U = _unroll()

    def bodyU(st):
        for _ in range(U):
            st = body(st)
        return st

    st = packed_while_loop(cond, bodyU, st)
    return dict(qbeg=st["qbeg"], qend=st["qend"], intv_l=st["intv_l"],
                intv_sz=st["intv_sz"], n_seeds=st["n"],
                n_dropped=st["nfull"])
