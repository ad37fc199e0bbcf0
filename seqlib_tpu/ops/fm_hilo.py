"""Device FM-index rank arithmetic beyond int32: (hi, lo) pairs.

The int32 device index (ops.fm.DeviceFMIndex) caps a shard's 2L text
at 2^31 (`ops/fm.py` from_host guard), which forces whole genomes into
many sub-Gbp shards (docs/SHARDED_INDEX.md).  This module implements
the planned "int34" representation: every rank/position is a pair
(hi, lo) of int32 with lo in [0, 2^30), value = hi * 2^30 + lo —
all updates are add/compare, so the emulation costs a handful of VPU
ops per rank instead of unsupported int64 arithmetic.

Layout: ``blocks_hl`` int32 [n_blocks+1, 16] — 4 hi checkpoints,
4 lo checkpoints, then the 8 packed BWT words (bit-identical to the
int32 layout's words).  A rank query is still ONE row gather; the
in-block popcount (<= 128) lands on lo with a single carry normalize.

Reference capability being replaced: libbwa's bwt_t holds 64-bit
ranks natively on host (`bwaidx_t`, /root/reference/src/BWAIndex.cpp:
28-33 loads any-size genomes); this is the TPU-side equivalent for
>1 Gbp shards.  Covered by tests/test_fm_hilo.py: arithmetic vs
numpy int64, rank parity vs both the int32 device path and the host
int64 index, and biased-checkpoint queries that genuinely exceed
2^31.  Integration into the full SMEM seed machine is staged work:
the packed while-loop carries are already int32-row compatible
(hi/lo pairs ride as two rows), see docs/SHARDED_INDEX.md.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .fm import _inblock_count

LO_BITS = 30
LO_MASK = (1 << LO_BITS) - 1


# ---------------------------------------------------------------------------
# (hi, lo) arithmetic — value = hi * 2^30 + lo, lo in [0, 2^30)
# ---------------------------------------------------------------------------

def hl_split(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side int64 -> (hi, lo) int32 planes."""
    v = np.asarray(v, np.int64)
    return (v >> LO_BITS).astype(np.int32), \
        (v & LO_MASK).astype(np.int32)


def hl_join(hi, lo) -> np.ndarray:
    """Host-side (hi, lo) -> int64 (for assertions)."""
    return np.asarray(hi, np.int64) * (1 << LO_BITS) \
        + np.asarray(lo, np.int64)


def hl_norm(hi, lo):
    """Renormalize after adds: push lo carries into hi (single carry
    suffices for any add of < 2^30)."""
    carry = lo >> LO_BITS
    return hi + carry, lo - (carry << LO_BITS)


def hl_add_small(hi, lo, s):
    """(hi, lo) + s for 0 <= s < 2^30 (e.g. an in-block popcount)."""
    return hl_norm(hi, lo + s)


def hl_add(ahi, alo, bhi, blo):
    return hl_norm(ahi + bhi, alo + blo)


def hl_sub(ahi, alo, bhi, blo):
    """(a - b); result may be negative — hi carries the sign, lo stays
    in [0, 2^30)."""
    hi = ahi - bhi
    lo = alo - blo
    borrow = lo < 0
    return hi - borrow.astype(hi.dtype), \
        lo + (borrow.astype(lo.dtype) << LO_BITS)


def hl_lt(ahi, alo, bhi, blo):
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


def hl_le(ahi, alo, bhi, blo):
    return (ahi < bhi) | ((ahi == bhi) & (alo <= blo))


def hl_shift_right(hi, lo, n: int):
    """(hi, lo) >> n for 0 < n <= LO_BITS; value must be >= 0 and the
    result must fit int32 (true for block ids: value < 2^34, n=7)."""
    return (hi << (LO_BITS - n)) | (lo >> n)


# ---------------------------------------------------------------------------
# device index
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceFMIndexHiLo:
    """FM-index with (hi, lo) int32 checkpoint planes (int34 ranks)."""

    blocks_hl: jax.Array    # int32 [n_blocks+1, 16]: 4 hi, 4 lo, 8 words
    sa_hi: jax.Array        # int32 [n_sa]
    sa_lo: jax.Array        # int32 [n_sa]
    L2_hi: jax.Array        # int32 [5]
    L2_lo: jax.Array        # int32 [5]
    primary_hi: jax.Array   # int32 scalar
    primary_lo: jax.Array   # int32 scalar
    seq_len: int            # static python int (true int64 length)
    sa_intv: int
    l_pac: int

    def tree_flatten(self):
        return ((self.blocks_hl, self.sa_hi, self.sa_lo, self.L2_hi,
                 self.L2_lo, self.primary_hi, self.primary_lo),
                (self.seq_len, self.sa_intv, self.l_pac))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_host(cls, idx, count_bias: np.ndarray | None = None
                  ) -> "DeviceFMIndexHiLo":
        """Upload a host FMIndex with hi/lo checkpoints.

        ``count_bias`` (int64 [4]) adds a per-base offset to every occ
        checkpoint — a TEST hook that produces genuinely >2^31 rank
        values from a small index (rank'(c,k) = rank(c,k) + bias[c],
        verifiable against the host int64 rank)."""
        nb = idx.bwt_words.shape[0]
        cp = idx.cp_counts.astype(np.int64)[:nb + 1]
        if count_bias is not None:
            cp = cp + np.asarray(count_bias, np.int64)[None, :]
        hi, lo = hl_split(cp)
        blocks = np.zeros((nb + 1, 16), np.int32)
        blocks[:, :4] = hi
        blocks[:, 4:8] = lo
        blocks[:nb, 8:] = idx.bwt_words.view(np.int32)
        if getattr(idx, "sa_full", None) is not None:
            sa = idx.sa_full.astype(np.int64).copy()
            sa[0] = 0
            sa_intv = 1
        else:
            sa = idx.sa_samples.astype(np.int64).copy()
            sa[0] = 0
            sa_intv = int(idx.sa_intv)
        sa_hi, sa_lo = hl_split(sa)
        l2_hi, l2_lo = hl_split(idx.L2.astype(np.int64))
        p_hi, p_lo = hl_split(np.int64(idx.primary))
        return cls(
            blocks_hl=jnp.asarray(blocks),
            sa_hi=jnp.asarray(sa_hi), sa_lo=jnp.asarray(sa_lo),
            L2_hi=jnp.asarray(l2_hi), L2_lo=jnp.asarray(l2_lo),
            primary_hi=jnp.asarray(p_hi), primary_lo=jnp.asarray(p_lo),
            seq_len=int(idx.seq_len), sa_intv=sa_intv,
            l_pac=int(idx.l_pac))


def rank_hilo(fm: DeviceFMIndexHiLo, c: jax.Array, k_hi: jax.Array,
              k_lo: jax.Array) -> tuple[jax.Array, jax.Array]:
    """# of c in bwt[0..k-1]; k = (k_hi, k_lo), k in [0, seq_len].

    Same single-row-gather structure as ops.fm.rank; the checkpoint
    select reads the hi and lo planes and the popcount lands on lo."""
    c, k_hi, k_lo = jnp.broadcast_arrays(c, k_hi, k_lo)
    blk = hl_shift_right(k_hi, k_lo, 7)
    within = (k_lo & 127).astype(jnp.int32)
    row = fm.blocks_hl[blk]                               # [..., 16]

    def sel(base_off):
        return jnp.where(
            c < 2,
            jnp.where(c == 0, row[..., base_off], row[..., base_off + 1]),
            jnp.where(c == 2, row[..., base_off + 2],
                      row[..., base_off + 3])).astype(jnp.int32)

    hi = sel(0)
    lo = sel(4)
    words = row[..., 8:].astype(jnp.uint32)
    return hl_add_small(hi, lo, _inblock_count(words, c, within))


def rank4_hilo(fm: DeviceFMIndexHiLo, k_hi: jax.Array, k_lo: jax.Array
               ) -> tuple[jax.Array, jax.Array]:
    """All-4-codes rank -> ([..., 4] hi, [..., 4] lo); one row gather."""
    blk = hl_shift_right(k_hi, k_lo, 7)
    within = (k_lo & 127).astype(jnp.int32)
    row = fm.blocks_hl[blk]
    hi = row[..., :4].astype(jnp.int32)
    lo = row[..., 4:8].astype(jnp.int32)
    words = row[..., 8:].astype(jnp.uint32)
    cnts = jnp.stack(
        [_inblock_count(words, jnp.full(k_hi.shape, c, jnp.int32),
                        within) for c in range(4)], axis=-1)
    return hl_add_small(hi, lo, cnts)


def _full_adjust(fm, k_hi, k_lo):
    """k - (k > primary): the sentinel-row removal of rank_full."""
    gt = hl_lt(fm.primary_hi, fm.primary_lo, k_hi, k_lo)
    return hl_sub(k_hi, k_lo, jnp.zeros_like(k_hi),
                  gt.astype(jnp.int32))


def rank_full_hilo(fm, c, k_hi, k_lo):
    return rank_hilo(fm, c, *_full_adjust(fm, k_hi, k_lo))


def backward_ext_hilo(fm: DeviceFMIndexHiLo, l_hi, l_lo, u_hi, u_lo,
                      c) -> tuple:
    """[l,u) -> interval of c+pattern (hi/lo twin of
    ops.fm.backward_ext); both boundary ranks in one stacked gather."""
    lu_hi = jnp.stack([l_hi, u_hi], axis=0)
    lu_lo = jnp.stack([l_lo, u_lo], axis=0)
    r_hi, r_lo = rank_full_hilo(
        fm, jnp.broadcast_to(c, lu_hi.shape), lu_hi, lu_lo)
    c_hi = fm.L2_hi[c]
    c_lo = fm.L2_lo[c]
    nl_hi, nl_lo = hl_add(c_hi, c_lo + 1, r_hi[0], r_lo[0])
    nu_hi, nu_lo = hl_add(c_hi, c_lo + 1, r_hi[1], r_lo[1])
    return nl_hi, nl_lo, nu_hi, nu_lo


def bi_extend_back_hilo(fm: DeviceFMIndexHiLo, k_hi, k_lo, l_hi, l_lo,
                        s_hi, s_lo):
    """FMD backward extension of bi-interval (k, l, s) by all 4 chars
    (hi/lo twin of ops.fm.bi_extend_back; same algebra, Li 2012).

    Returns ((k4_hi, k4_lo), (l4_hi, l4_lo), (s4_hi, s4_lo)), each
    [..., 4]."""
    tk_hi, tk_lo = rank4_hilo(fm, *_full_adjust(fm, k_hi, k_lo))
    ks_hi, ks_lo = hl_add(k_hi, k_lo, s_hi, s_lo)
    tl_hi, tl_lo = rank4_hilo(fm, *_full_adjust(fm, ks_hi, ks_lo))
    # k4[c] = L2[c] + 1 + rank(c, k); s4[c] = rank(c, k+s) - rank(c, k)
    c4 = jnp.arange(4, dtype=jnp.int32)
    k4_hi, k4_lo = hl_add(fm.L2_hi[c4], fm.L2_lo[c4] + 1, tk_hi, tk_lo)
    s4_hi, s4_lo = hl_sub(tl_hi, tl_lo, tk_hi, tk_lo)
    # l-side recurrence incl. sentinel occupancy — mirrors
    # ops.fm.bi_extend_back exactly: l3 = l + has_sent,
    # l_{c} = l_{c+1} + s4[c+1]
    has_sent = (hl_le(k_hi, k_lo, fm.primary_hi, fm.primary_lo)
                & hl_lt(fm.primary_hi, fm.primary_lo, ks_hi, ks_lo)
                ).astype(jnp.int32)
    l3_hi, l3_lo = hl_add_small(l_hi, l_lo, has_sent)
    l2_hi, l2_lo = hl_add(l3_hi, l3_lo, s4_hi[..., 3], s4_lo[..., 3])
    l1_hi, l1_lo = hl_add(l2_hi, l2_lo, s4_hi[..., 2], s4_lo[..., 2])
    l0_hi, l0_lo = hl_add(l1_hi, l1_lo, s4_hi[..., 1], s4_lo[..., 1])
    l4_hi = jnp.stack([l0_hi, l1_hi, l2_hi, l3_hi], axis=-1)
    l4_lo = jnp.stack([l0_lo, l1_lo, l2_lo, l3_lo], axis=-1)
    return (k4_hi, k4_lo), (l4_hi, l4_lo), (s4_hi, s4_lo)


def device_index_for(idx):
    """Transparent device-index factory: int32 blocks for shards under
    2^31, hi/lo blocks beyond (the int32 path is ~3 fewer VPU ops per
    rank, so small shards keep it)."""
    from .fm import DeviceFMIndex
    if idx.seq_len < 2**31:
        return DeviceFMIndex.from_host(idx)
    return DeviceFMIndexHiLo.from_host(idx)
