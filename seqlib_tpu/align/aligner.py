"""BWA-MEM-style aligner: device-batched seeding + extension + CIGAR.

TPU-native rebuild of the pipeline the reference drives through
``mem_align1`` + ``mem_reg2aln`` + hand-assembled bam1_t
(/root/reference/src/BWAAligner.cpp:89-265).  Stages:

1. seed collection on device (ops.fm.collect_seeds — lockstep scan),
2. SA lookup of seed occurrences on device,
3. chaining on host (tiny per-read work — align.chain),
4. left/right affine extension on device (ops.sw.extend_batch) with
   bwa's soft-clip decision (gscore vs pen_clip),
5. primary/secondary marking + MAPQ (bwa's mem_approx_mapq_se formula),
6. banded global alignment on device for CIGARs (ops.sw.global_batch)
   + host traceback and NM,
7. record assembly with the reference's exact semantics: clip-op
   rewrite, revcomp packing for reverse hits, null quals, NA/NM/AS
   tags, MAPQ-desc sort and keepSecFrac/maxSecondary filtering
   (BWAAligner.cpp:133-241).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

import jax

from ..core.cigar import Cigar, CigarField
from ..core.record import BamRecord, FREVERSE, FSECONDARY
from ..core.seq import NT4_TABLE, encode_nt4, revcomp
from .. import native as _native
from ..core.unaligned import UnalignedSequence
from ..index.fmindex import FMIndex
from ..index.pack import both_strands
from ..ops.fm import DeviceFMIndex
from ..ops.fm_hilo import LO_BITS, DeviceFMIndexHiLo
from .device_full import (FLAG_EMIT, FLAG_OVER, FLAG_PERFECT,
                          FLAG_WIDE, NFIELD, align_full)
from .device_full_wide import NFIELD_W, align_full_wide
from .device_pipeline import (global_and_traceback,
                              global_and_traceback_packed,
                              seed_chain_extend,
                              seed_chain_extend_packed, unpack_stage1)
from .device_pipeline_wide import (pack_text_2bit,
                                   seed_chain_extend_packed_wide,
                                   unpack_stage1_wide)
from .options import AlignerOptions

MAX_SEEDS = 16          # per read from the seed scan
MAX_OCC_LOCATE = 16     # occurrences located per seed
MAX_CHAINS = 4          # chains extended per read
from .device_pipeline import ESC_SLOTS
REGION_SLOTS = MAX_CHAINS + ESC_SLOTS   # + per-seed second-ext slots
MAX_REGS = 8            # alignment regions kept per read


from .device_full import _hash64  # bwa hash_64 tie-break (shared)


@dataclass
class AlnReg:
    """mem_alnreg_t equivalent (coordinates in 2L text space).

    ``shard``/``gb``/``ge`` are used only by the sharded-index path
    (align.sharded): rb/re stay shard-local (they index that shard's
    text) while gb/ge are global pseudo-2L keys used for cross-shard
    dedup/overlap tests."""
    rb: int
    re: int
    qb: int
    qe: int
    score: int
    seedcov: int
    frac_rep: float
    sub: int = 0
    csub: int = 0
    sub_n: int = 0
    secondary: int = -1
    shard: int = 0
    gb: int = 0
    ge: int = 0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _unpack_ops(packed: np.ndarray) -> np.ndarray:
    """Inverse of the device 2-bit packing -> [M, 4*Tp] step codes."""
    p = packed.astype(np.uint8)
    M, Tp = p.shape
    out = np.empty((M, Tp * 4), np.uint8)
    out[:, 0::4] = p & 3
    out[:, 1::4] = (p >> 2) & 3
    out[:, 2::4] = (p >> 4) & 3
    out[:, 3::4] = (p >> 6) & 3
    return out


def _ops_to_cigars_batch(ops: np.ndarray, n_rows: int
                         ) -> list[list[tuple[str, int]]]:
    """Batched run-length decode of the device traceback output.

    ops [M, T] int8 step codes in reverse walk order (OP_NONE=3
    padding).  One numpy pass over the whole matrix instead of a
    Python loop per region."""
    sub = ops[:n_rows, ::-1]
    mask = sub < 3
    rows, cols = np.nonzero(mask)
    vals = sub[rows, cols]
    if vals.size == 0:
        return [[] for _ in range(n_rows)]
    # run boundaries: row change or op change
    brk = np.ones(vals.size, dtype=bool)
    brk[1:] = (rows[1:] != rows[:-1]) | (vals[1:] != vals[:-1])
    starts = np.flatnonzero(brk)
    lens = np.diff(np.append(starts, vals.size))
    run_rows = rows[starts]
    run_ops = vals[starts]
    out: list[list[tuple[str, int]]] = [[] for _ in range(n_rows)]
    ops_str = "MDI"
    for r, o, ln in zip(run_rows.tolist(), run_ops.tolist(),
                        lens.tolist()):
        out[r].append((ops_str[o], ln))
    return out


def _ops_to_runs(ops: np.ndarray, n_rows: int
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run-length decode device traceback codes into flat run arrays.

    Returns (run_rows, run_ops, run_lens) with run_rows sorted
    ascending; runs are in forward 2L order (reverse of the walk).
    run_ops use device codes 0=M 1=D 2=I."""
    sub = ops[:n_rows, ::-1]
    mask = sub < 3
    rows, cols = np.nonzero(mask)
    vals = sub[rows, cols]
    if vals.size == 0:
        return (np.empty(0, np.int32), np.empty(0, np.uint8),
                np.empty(0, np.int32))
    brk = np.ones(vals.size, dtype=bool)
    brk[1:] = (rows[1:] != rows[:-1]) | (vals[1:] != vals[:-1])
    starts = np.flatnonzero(brk)
    lens = np.diff(np.append(starts, vals.size))
    return (rows[starts].astype(np.int32),
            vals[starts].astype(np.uint8), lens.astype(np.int32))


def _filter_cols(cols: dict, mask: np.ndarray) -> dict:
    """Keep only hits selected by ``mask`` (run arrays stay shared)."""
    out = dict(cols)
    for k, v in cols.items():
        if k not in ("run_ops", "run_lens"):
            out[k] = v[mask]
    return out


def _bucket(n: int, mn: int = 64) -> int:
    """Round a batch dimension up to a bucket (powers of two up to 512,
    then multiples of 512) so jitted kernels compile once per bucket
    instead of once per batch, without 2x padding waste at scale."""
    b = mn
    while b < n and b < 512:
        b *= 2
    if n <= b:
        return b
    return (n + 511) // 512 * 512


class BWAAligner:
    """Single-end BWA-MEM-style aligner over an FMIndex.

    Reference API parity: construct from an index, tweak scoring via
    the setters on ``self.options``, call ``align_sequence`` (one read,
    reference-compatible) or ``align_batch`` (the TPU-native path).
    """

    def __init__(self, index: FMIndex, options: AlignerOptions | None = None,
                 mesh=None, wide: bool | None = None):
        """mesh: optional jax.sharding.Mesh with a 'dp' axis — device
        stages then run data-parallel across it (read batches sharded,
        FM-index replicated; SURVEY.md §2.2 TPU-native scale-out).

        wide: force the hi/lo (int34) device path.  Auto-selected for
        indexes whose 2L text exceeds 2^31 (the int32 path's bound) —
        one bwaidx_t holds any-size genomes in the reference
        (/root/reference/src/BWAIndex.cpp:28-33); the wide kernels are
        this framework's equivalent (docs/SHARDED_INDEX.md)."""
        self.index = index
        self.options = options or AlignerOptions()
        self.mesh = mesh
        self.wide = (index.seq_len >= 2**31) if wide is None else wide
        self.text = both_strands(index.ref.codes)      # host 2L codes
        if self.wide:
            self.fm = DeviceFMIndexHiLo.from_host(index)
            # device text is 2-bit packed: gather indices stay int32
            # (word index = pos >> 4) and HBM cost drops 4x
            self.text_j = jnp.asarray(pack_text_2bit(self.text))
        else:
            self.fm = DeviceFMIndex.from_host(index)
            self.text_j = jnp.asarray(self.text)
        self._copy_comment = False
        # truncation telemetry: fixed-shape device caps are counted
        # and surfaced instead of silently losing alignments
        # (VERDICT r1 "silent truncation"); see docs/COMPONENTS.md
        self.stats = dict(seeds_at_cap=0, occ_clipped=0,
                          chains_at_cap=0, regs_truncated=0,
                          regions_widened=0, regions_dropped_wide=0,
                          fused_overflow_fallback=0,
                          escapees_deferred=0)
        self._names_cache: list[str] | None = None
        self._ann_offs = np.array([a.offset for a in index.ref.anns],
                                  dtype=np.int64)
        self._ann_lens = np.array([a.length for a in index.ref.anns],
                                  dtype=np.int64)
        if mesh is not None:
            self._build_sharded_stages()

    def reset_stats(self):
        for k in self.stats:
            self.stats[k] = 0

    def _build_sharded_stages(self):
        """Wrap the three device stages in shard_map over the dp axis.

        Read batches and per-entry arrays shard on dim 0; the FM-index,
        2L text, and (for the extension stage) the read matrix are
        replicated — entries may reference any read in the batch.
        """
        import functools
        from jax.sharding import PartitionSpec as P
        opt = self.options
        mesh = self.mesh
        fm, text = self.fm, self.text_j
        dp1 = P("dp")
        dp2 = P("dp", None)

        fused_impl = seed_chain_extend_packed_wide if self.wide \
            else seed_chain_extend_packed

        def fused_fn(reads, lens):
            return fused_impl(
                fm, text, reads, lens, l_pac=self.index.l_pac,
                max_seeds=MAX_SEEDS, min_seed_len=opt.min_seed_len,
                max_occ=opt.max_occ, k_occ=MAX_OCC_LOCATE,
                band=opt.w, max_chain_gap=opt.max_chain_gap,
                drop_ratio=opt.drop_ratio, max_chains=MAX_CHAINS,
                o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                e_ins=opt.e_ins, match=opt.a, mismatch=opt.b,
                pen_clip5=opt.pen_clip5, pen_clip3=opt.pen_clip3,
                w=opt.w, zdrop=opt.zdrop,
                split_len=opt.split_len, split_width=opt.split_width,
                min_chain_weight=opt.min_chain_weight,
                max_chain_extend=opt.max_chain_extend,
                max_mem_intv=opt.max_mem_intv)
        self._sh_fused = jax.jit(jax.shard_map(
            fused_fn, mesh=mesh, in_specs=(dp2, dp1),
            out_specs=dp2, check_vma=False))

        def glob_fn(q, ql, t, tl):
            return global_and_traceback_packed(
                q, ql, t, tl, o_del=opt.o_del, e_del=opt.e_del,
                o_ins=opt.o_ins, e_ins=opt.e_ins, match=opt.a,
                mismatch=opt.b, band=2 * opt.w + 8)
        self._sh_global = jax.jit(jax.shard_map(
            glob_fn, mesh=mesh,
            in_specs=(dp2, dp1, dp2, dp1),
            out_specs=(dp2, dp2), check_vma=False))

    @property
    def n_shards(self) -> int:
        return self.mesh.shape["dp"] if self.mesh is not None else 1

    # -- option setters forwarded (reference-style names) -------------------

    def set_gap_open(self, v): self.options.set_gap_open(v)
    def set_gap_extension(self, v): self.options.set_gap_extension(v)
    def set_mismatch_penalty(self, v): self.options.set_mismatch_penalty(v)
    def set_zdropoff(self, v): self.options.set_zdropoff(v)
    def set_a_score(self, v): self.options.set_a_score(v)
    def set_3prime_clipping_penalty(self, v):
        self.options.set_3prime_clipping_penalty(v)
    def set_5prime_clipping_penalty(self, v):
        self.options.set_5prime_clipping_penalty(v)
    def set_bandwidth(self, v): self.options.set_bandwidth(v)
    def set_reseed_trigger(self, v): self.options.set_reseed_trigger(v)
    def set_copy_comment(self, v: bool): self._copy_comment = v

    # ------------------------------------------------------------------
    # region generation
    # ------------------------------------------------------------------

    def _dispatch_stage1(self, enc_j, lens_j):
        """Asynchronously dispatch the fused seed+chain+extend stage
        (returns un-fetched device arrays — JAX dispatch is async).
        One dispatch replaces the reference's whole mem_align1 region
        generation (BWAAligner.cpp:104-109)."""
        opt = self.options
        if self.mesh is not None:
            return self._sh_fused(enc_j, lens_j)
        fn = seed_chain_extend_packed_wide if self.wide \
            else seed_chain_extend_packed
        return fn(
            self.fm, self.text_j, enc_j, lens_j,
            l_pac=self.index.l_pac,
            max_seeds=MAX_SEEDS, min_seed_len=opt.min_seed_len,
            max_occ=opt.max_occ, k_occ=MAX_OCC_LOCATE,
            band=opt.w, max_chain_gap=opt.max_chain_gap,
            drop_ratio=opt.drop_ratio, max_chains=MAX_CHAINS,
            o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
            e_ins=opt.e_ins, match=opt.a, mismatch=opt.b,
            pen_clip5=opt.pen_clip5, pen_clip3=opt.pen_clip3,
            w=opt.w, zdrop=opt.zdrop,
            split_len=opt.split_len, split_width=opt.split_width,
            min_chain_weight=opt.min_chain_weight,
            max_chain_extend=opt.max_chain_extend,
                max_mem_intv=opt.max_mem_intv)

    def _collect_regions(self, enc: np.ndarray, lens: np.ndarray,
                         stage1=None, dedup: bool = True
                         ) -> list[list[AlnReg]]:
        """enc [B, L] nt4 codes (4-padded); returns per-read region
        lists (deduped, primary/secondary marked).  ONE fused device
        dispatch (seed scan + SA locate + chaining + extension);
        ``stage1`` may be a pre-dispatched fused result (pipelined
        streaming)."""
        B, L = enc.shape
        if stage1 is None:
            stage1 = self._dispatch_stage1(
                jnp.asarray(enc), jnp.asarray(lens.astype(np.int32)))
        unpack = unpack_stage1_wide if self.wide else unpack_stage1
        out = unpack(np.asarray(stage1), REGION_SLOTS)
        frac_reps = out["rep_cov"] / np.maximum(lens, 1)
        keep = out["keep"]
        qb, qe = out["qb"], out["qe"]
        rb, re = out["rb"], out["re"]
        score, weight = out["score"], out["weight"]
        # rare: more non-trivial chains than device DP slots — the
        # compacted extension dropped some; redo extension uncompacted
        from .device_pipeline import dp_rows
        limit = dp_rows(B // max(self.n_shards, 1))
        if (np.atleast_1d(out["n_dp"]) > limit).any():
            qb, qe, rb, re, score = self._extend_uncompacted(
                enc, lens, out)

        self.stats["seeds_at_cap"] += int(
            np.sum(out["seeds_full"][:B]))
        self.stats["occ_clipped"] += int(np.sum(out["occ_clip"][:B]))
        self.stats["chains_at_cap"] += int(
            np.sum(out["n_seg"][:B] > MAX_CHAINS))
        self.stats["escapees_deferred"] += int(
            np.sum(out["esc_over"][:B]))
        regions: list[list[AlnReg]] = [[] for _ in range(B)]
        for b, c in zip(*np.nonzero(keep)):
            regions[b].append(AlnReg(
                int(rb[b, c]), int(re[b, c]), int(qb[b, c]),
                int(qe[b, c]), int(score[b, c]), int(weight[b, c]),
                float(frac_reps[b])))
        if dedup:
            for b in range(B):
                regions[b] = self._dedup_and_mark(regions[b])
        return regions

    # ------------------------------------------------------------------
    # long-read path (> LONG_READ_BP): device seeding + host chaining
    # ------------------------------------------------------------------

    LONG_READ_BP = 1024   # fused-path packed chain keys cap reads here

    def _collect_regions_long(self, enc: np.ndarray, lens: np.ndarray
                              ) -> list[list[AlnReg]]:
        """Region generation for reads beyond the fused path's packed
        chain-sort caps (1024 bp query keys): device seed scan + SA
        locate, HOST chaining (int64 numpy, no length caps,
        align/chain.chain_batch), then the banded device extension.
        The reference aligns arbitrary-length queries through this
        same structure (assembled contigs are realigned via
        alignSequence — /root/reference/src/seqtools/seqtools.cpp:
        161-189); records downstream share _regions_to_hits /
        _assemble_records with the short path."""
        from .chain import chain_batch
        from .device_pipeline import extend_chains, seed_and_locate
        from .device_pipeline_wide import (extend_chains_wide,
                                           seed_and_locate_wide)
        opt = self.options
        B, L = enc.shape
        lens32 = lens.astype(np.int32)
        # more seed slots: a mutated multi-kb query emits ~one SMEM
        # per error
        max_seeds = max(64, min(256, L // 32))
        kw = dict(max_seeds=max_seeds, min_seed_len=opt.min_seed_len,
                  max_occ=opt.max_occ, k_occ=MAX_OCC_LOCATE,
                  split_len=opt.split_len, split_width=opt.split_width,
                  max_mem_intv=opt.max_mem_intv)
        if self.wide:
            s1 = seed_and_locate_wide(self.fm, jnp.asarray(enc),
                                      jnp.asarray(lens32), **kw)
            pos = np.asarray(s1["pos_h"]).astype(np.int64) \
                * (1 << LO_BITS) + np.asarray(s1["pos_l"])
            pos[np.asarray(s1["pos_h"]) < 0] = -1
        else:
            s1 = seed_and_locate(self.fm, jnp.asarray(enc),
                                 jnp.asarray(lens32), **kw)
            pos = np.asarray(s1["pos"]).astype(np.int64)
        qb_all = np.asarray(s1["qbeg"])
        qe_all = np.asarray(s1["qend"])
        Bv, S1, K = pos.shape
        l_pac = self.index.l_pac
        rid = np.repeat(np.arange(Bv, dtype=np.int32)[:, None],
                        S1 * K, axis=1).reshape(-1)
        oqb = np.repeat(qb_all[:, :, None], K, axis=2).reshape(-1)
        oqe = np.repeat(qe_all[:, :, None], K, axis=2).reshape(-1)
        op = pos.reshape(-1)
        olen = (oqe - oqb).astype(np.int64)
        val = (op >= 0) & ~((op < l_pac) & (op + olen > l_pac))
        ch = chain_batch(rid[val], oqb[val].astype(np.int64),
                         oqe[val].astype(np.int64), op[val],
                         l_pac=l_pac, band=opt.w,
                         max_chain_gap=opt.max_chain_gap,
                         drop_ratio=opt.drop_ratio,
                         max_chains=MAX_CHAINS)
        n = ch["read"].size
        regions: list[list[AlnReg]] = [[] for _ in range(B)]
        if not n:
            return regions
        M = _bucket(n)
        b_idx = np.full(M, -1, np.int32)
        aq = np.zeros(M, np.int32)
        alen = np.zeros(M, np.int32)
        b_idx[:n] = ch["read"]
        aq[:n] = ch["anchor_q"]
        alen[:n] = ch["anchor_len"]
        common = dict(
            l_pac=l_pac, o_del=opt.o_del, e_del=opt.e_del,
            o_ins=opt.o_ins, e_ins=opt.e_ins, match=opt.a,
            mismatch=opt.b, pen_clip5=opt.pen_clip5,
            pen_clip3=opt.pen_clip3, w=opt.w, zdrop=opt.zdrop)
        if self.wide:
            ar64 = np.zeros(M, np.int64)
            ar64[:n] = ch["anchor_r"]
            res = extend_chains_wide(
                self.text_j, jnp.asarray(enc), jnp.asarray(lens32),
                jnp.asarray(b_idx), jnp.asarray(aq), jnp.asarray(alen),
                jnp.asarray((ar64 >> LO_BITS).astype(np.int32)),
                jnp.asarray((ar64 & ((1 << LO_BITS) - 1))
                            .astype(np.int32)), **common)
            eqb, eqe, rbh, rbl, reh, rel, esc = jax.device_get(res)
            erb = rbh.astype(np.int64) * (1 << LO_BITS) + rbl
            ere = reh.astype(np.int64) * (1 << LO_BITS) + rel
        else:
            ar = np.zeros(M, np.int32)
            ar[:n] = ch["anchor_r"]
            res = extend_chains(
                self.text_j, jnp.asarray(enc), jnp.asarray(lens32),
                jnp.asarray(b_idx), jnp.asarray(aq), jnp.asarray(alen),
                jnp.asarray(ar), **common)
            eqb, eqe, erb, ere, esc = jax.device_get(res)
        frac_reps = np.asarray(s1["rep_cov"]) / np.maximum(lens, 1)
        for k in range(n):
            b = int(ch["read"][k])
            regions[b].append(AlnReg(
                int(erb[k]), int(ere[k]), int(eqb[k]), int(eqe[k]),
                int(esc[k]), int(ch["weight"][k]),
                float(frac_reps[b])))
        for b in range(B):
            regions[b] = self._dedup_and_mark(regions[b])
        return regions

    def _align_batch_long(self, seqs, names, hardclip, keep_sec_frac,
                          max_secondary):
        enc, lens = self._encode_batch(seqs)
        B = len(seqs)
        regions = self._collect_regions_long(enc, lens)[:B]
        if keep_sec_frac < 0.0 or keep_sec_frac > 1.0:
            regions = [[r for r in rs if r.secondary < 0]
                       for rs in regions]
        hits = self._regions_to_hits(enc, lens, names, seqs, regions)
        return [self._assemble_records(seqs[b], names[b], hits[b],
                                       hardclip, keep_sec_frac,
                                       max_secondary)
                for b in range(B)]

    def _extend_uncompacted(self, enc, lens, out):
        """Overflow fallback: extend every kept chain in a standalone
        dispatch (no DP-slot cap).  Exact same arithmetic as the fused
        path; only reached when > B non-trivial chains exist in one
        shard's batch."""
        from .device_pipeline import extend_chains
        opt = self.options
        keep = out["keep"]
        bs, cs = np.nonzero(keep)
        n = bs.size
        qb = out["qb"].copy(); qe = out["qe"].copy()
        rb = out["rb"].copy(); re = out["re"].copy()
        score = out["score"].copy()
        if not n:
            return qb, qe, rb, re, score
        M = _bucket(n)
        b_idx = np.full(M, -1, np.int32)
        aq = np.zeros(M, np.int32)
        alen = np.zeros(M, np.int32)
        b_idx[:n] = bs
        aq[:n] = out["anchor_q"][bs, cs]
        alen[:n] = out["anchor_len"][bs, cs]
        common = dict(
            l_pac=self.index.l_pac,
            o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
            e_ins=opt.e_ins, match=opt.a, mismatch=opt.b,
            pen_clip5=opt.pen_clip5, pen_clip3=opt.pen_clip3, w=opt.w,
            zdrop=opt.zdrop)
        if self.wide:
            from .device_pipeline_wide import extend_chains_wide
            ar64 = np.zeros(M, np.int64)
            ar64[:n] = out["anchor_r"][bs, cs]
            res = extend_chains_wide(
                self.text_j, jnp.asarray(enc),
                jnp.asarray(lens.astype(np.int32)),
                jnp.asarray(b_idx), jnp.asarray(aq), jnp.asarray(alen),
                jnp.asarray((ar64 >> LO_BITS).astype(np.int32)),
                jnp.asarray((ar64 & ((1 << LO_BITS) - 1))
                            .astype(np.int32)),
                **common)
            eqb, eqe, erbh, erbl, ereh, erel, esc = jax.device_get(res)
            erb = erbh.astype(np.int64) * (1 << LO_BITS) \
                + erbl.astype(np.int64)
            ere = ereh.astype(np.int64) * (1 << LO_BITS) \
                + erel.astype(np.int64)
        else:
            ar = np.zeros(M, np.int32)
            ar[:n] = out["anchor_r"][bs, cs]
            res = extend_chains(
                self.text_j, jnp.asarray(enc),
                jnp.asarray(lens.astype(np.int32)),
                jnp.asarray(b_idx), jnp.asarray(aq), jnp.asarray(alen),
                jnp.asarray(ar), **common)
            eqb, eqe, erb, ere, esc = jax.device_get(res)
        qb[bs, cs] = eqb[:n]; qe[bs, cs] = eqe[:n]
        rb[bs, cs] = erb[:n]; re[bs, cs] = ere[:n]
        score[bs, cs] = esc[:n]
        return qb, qe, rb, re, score

    def _dedup_and_mark(self, regs: list[AlnReg], key=None) -> list[AlnReg]:
        """mem_sort_dedup + mem_mark_primary_se semantics.

        ``key(r) -> (kb, ke)`` supplies the reference-interval used for
        overlap tests (defaults to the region's own rb/re; the sharded
        aligner passes global pseudo-2L keys)."""
        opt = self.options
        if key is None:
            key = lambda r: (r.rb, r.re)       # noqa: E731
        # dedup near-identical regions; re only breaks ties after qb so
        # the single-index path keeps its historical (-score, rb, qb)
        # survivor order
        regs = sorted(regs, key=lambda r: (-r.score, key(r)[0], r.qb,
                                           key(r)[1]))
        out: list[AlnReg] = []
        for r in regs:
            dup = False
            krb, kre = key(r)
            for o in out:
                okb, oke = key(o)
                if max(krb, okb) < min(kre, oke):
                    inter = min(kre, oke) - max(krb, okb)
                    minw = min(kre - krb, oke - okb)
                    if inter >= opt.mask_level_redun * minw \
                            and max(r.qb, o.qb) < min(r.qe, o.qe):
                        dup = True
                        break
            if not dup:
                out.append(r)
        # bwa's mem_mark_primary_se walk order: score desc, equal
        # scores broken by hash_64(id + i), where i is the region's
        # index in the post-dedup array — which mem_sort_dedup_patch
        # leaves sorted by (score desc, rb, qb), exactly ``out``'s
        # order here — and id = 0 (mem_align1 passes 0; a caller-chosen
        # id would shuffle equal-score ties deterministically).  This
        # pins which of two equal-score ambiguous hits becomes primary
        # (seq_test.cpp:893-911 expects the reverse-strand hit).
        ranked = sorted(enumerate(out),
                        key=lambda t: (-t[1].score, _hash64(t[0])))
        out = [r for _, r in ranked]
        # mark primary/secondary by query overlap.  sub_n counts
        # losers within tmp = max(a+b, o_del+e_del, o_ins+e_ins) of
        # the primary (mem_mark_primary_se_core's `tmp`; the previous
        # `<= a` version under-counted and inflated MAPQ — caught by
        # tests/test_record_oracle.py).
        tmp = max(opt.a + opt.b, opt.o_del + opt.e_del,
                  opt.o_ins + opt.e_ins)
        kept: list[int] = []
        for i, r in enumerate(out):
            placed = False
            for k in kept:
                p = out[k]
                bmax, emin = max(r.qb, p.qb), min(r.qe, p.qe)
                if emin > bmax:
                    minl = min(r.qe - r.qb, p.qe - p.qb)
                    if emin - bmax >= opt.mask_level * minl:
                        r.secondary = k
                        if p.sub == 0:
                            p.sub = r.score
                        if p.score - r.score <= tmp:
                            p.sub_n += 1
                        placed = True
                        break
            if not placed:
                kept.append(i)
        if len(out) > MAX_REGS:
            self.stats["regs_truncated"] += 1
        return out[:MAX_REGS]

    # ------------------------------------------------------------------
    # MAPQ (bwa mem_approx_mapq_se)
    # ------------------------------------------------------------------

    def _mapq(self, r: AlnReg) -> int:
        opt = self.options
        sub = r.sub if r.sub else opt.min_seed_len * opt.a
        sub = max(sub, r.csub)
        if sub >= r.score:
            return 0
        length = max(r.qe - r.qb, r.re - r.rb)
        identity = 1.0 - float(length * opt.a - r.score) \
            / (opt.a + opt.b) / length
        if r.score == 0:
            mapq = 0
        else:
            tmp = 1.0 if length < opt.mapQ_coef_len \
                else opt.mapQ_coef_fac / math.log(length)
            tmp *= identity * identity
            mapq = int(6.02 * (r.score - sub) / opt.a * tmp * tmp + 0.499)
        if r.sub_n > 0:
            mapq -= int(4.343 * math.log(r.sub_n + 1) + 0.499)
        mapq = min(mapq, 60)
        mapq = max(mapq, 0)
        mapq = int(mapq * (1.0 - r.frac_rep) + 0.499)
        return mapq

    # ------------------------------------------------------------------
    # CIGAR + record assembly
    # ------------------------------------------------------------------

    def _regions_to_hits(self, enc, lens, names, seqs, regions):
        """Global-align every region, build per-read hit dicts."""
        opt = self.options
        # minimum output score: regions under opt.T are not emitted
        # (bwa mem_reg2sam's `score < opt->T` skip; NA still counts all
        # regions like the reference's `regs.n`).  The reference's own
        # alignSequence bypasses this filter because it calls
        # mem_reg2aln directly — we follow bwa-mem output semantics.
        flat = [(b, r) for b, rs in enumerate(regions) for r in rs
                if r.score >= opt.T]
        hits_per_read: list[list[dict]] = [[] for _ in range(len(regions))]
        if not flat:
            return hits_per_read
        # static shapes: query bucket = read length; target slack
        # covers deletions up to 128 bp in the narrow bucket.  Regions
        # with a larger reference span (long deletions) go through a
        # WIDE bucket (up to +512 bp); only spans beyond that are
        # dropped — and counted, never silent.
        Lq = enc.shape[1]
        Lt = enc.shape[1] + min(2 * opt.w, 128)
        Lt_wide = enc.shape[1] + 512
        kept = []
        for b, r in flat:
            span_t = r.re - r.rb
            if r.qe - r.qb <= Lq and span_t <= Lt_wide:
                kept.append((b, r))
                if span_t > Lt:
                    self.stats["regions_widened"] += 1
            else:
                self.stats["regions_dropped_wide"] += 1
        flat = kept
        if not flat:
            return hits_per_read
        # fast path: a region whose extension score equals span*a with
        # equal query/target spans can only be an exact match (any
        # mismatch or gap strictly lowers the DP optimum), so its CIGAR
        # is one M run with NM=0 — verified by a host memcmp.  No
        # global DP needed for those (the majority at low error rates).
        perfect = np.zeros(len(flat), dtype=bool)
        for m, (b, r) in enumerate(flat):
            span = r.qe - r.qb
            if (r.score == span * opt.a and r.re - r.rb == span
                    and np.array_equal(enc[b, r.qb:r.qe],
                                       self.text[r.rb:r.re])):
                perfect[m] = True
        cigars: dict[int, list[tuple[str, int]]] = {}
        nms_by_row: dict[int, int] = {}
        for m in np.flatnonzero(perfect):
            b, r = flat[m]
            cigars[m] = [("M", r.qe - r.qb)]
            nms_by_row[m] = 0
        spans = np.array([r.re - r.rb for _, r in flat], np.int64)
        narrow = np.flatnonzero(~perfect & (spans <= Lt))
        wide = np.flatnonzero(~perfect & (spans > Lt))
        for dev_rows, width, wide_band in ((narrow, Lt, False),
                                           (wide, Lt_wide, True)):
            if not dev_rows.size:
                continue
            M = _bucket(dev_rows.size)
            q = np.full((M, Lq), 4, np.uint8)
            t = np.full((M, width), 4, np.uint8)
            ql = np.zeros(M, np.int32)
            tl = np.zeros(M, np.int32)
            for k, m in enumerate(dev_rows):
                b, r = flat[m]
                ql[k] = r.qe - r.qb
                tl[k] = r.re - r.rb
                q[k, :ql[k]] = enc[b, r.qb:r.qe]
                t[k, :tl[k]] = self.text[r.rb:r.re]
            band = (Lt_wide + 8) if wide_band else (2 * opt.w + 8)
            if self.mesh is not None and not wide_band:
                res = self._sh_global(jnp.asarray(q), jnp.asarray(ql),
                                      jnp.asarray(t), jnp.asarray(tl))
            else:
                res = global_and_traceback_packed(
                    jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t),
                    jnp.asarray(tl),
                    o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                    e_ins=opt.e_ins, match=opt.a, mismatch=opt.b,
                    band=band)
            snm, packed = (np.asarray(res[0]), np.asarray(res[1]))
            nms = snm[:, 1]
            dev_cigs = _ops_to_cigars_batch(
                _unpack_ops(np.asarray(packed)), dev_rows.size)
            for k, m in enumerate(dev_rows):
                cigars[m] = dev_cigs[k]
                nms_by_row[m] = int(nms[k])

        l_pac = self.index.l_pac
        # region-list index per read: hit['sec'] points into this
        # numbering (for XA grouping)
        slot_of = [{id(r): k for k, r in enumerate(rs)}
                   for rs in regions]
        for m, (b, r) in enumerate(flat):
            cig2l = cigars[m]
            nm = nms_by_row[m]
            is_rev = r.rb >= l_pac
            L = int(lens[b])
            if is_rev:
                cig_sam = list(reversed(cig2l))
                clip5, clip3 = L - r.qe, r.qb
                pos2l = 2 * l_pac - r.re
            else:
                cig_sam = cig2l
                clip5, clip3 = r.qb, L - r.qe
                pos2l = r.rb
            rid, pos = self.index.pos_to_ref(pos2l)
            # region crossing a contig boundary: drop (bwa trims/flags)
            ref_len = self.index.ref.anns[rid].length
            if pos + (r.re - r.rb) > ref_len:
                continue
            full = ([("N", clip5)] if clip5 else []) + cig_sam \
                + ([("N", clip3)] if clip3 else [])
            # secondary alignments carry mapq 0 (bwa mem_reg2aln)
            mapq = self._mapq(r) if r.secondary < 0 else 0
            hits_per_read[b].append(dict(
                rid=rid, pos=pos, is_rev=is_rev, score=r.score,
                mapq=mapq, secondary=r.secondary >= 0,
                cigar=full, nm=nm, n_regs=len(regions[b]),
                slot=slot_of[b].get(id(r), -1), sec=r.secondary))
        return hits_per_read

    # ------------------------------------------------------------------
    # fully fused single-dispatch path (device_full.align_full)
    # ------------------------------------------------------------------

    def _dispatch_full(self, enc: np.ndarray, lens: np.ndarray):
        """ONE upload buffer + one dispatch for the whole batch."""
        opt = self.options
        enc_lens = np.concatenate(
            [enc, lens.astype("<u4").view(np.uint8).reshape(-1, 4)],
            axis=1)
        fn = align_full_wide if self.wide else align_full
        return fn(
            self.fm, self.text_j, jnp.asarray(enc_lens),
            l_pac=self.index.l_pac, max_seeds=MAX_SEEDS,
            min_seed_len=opt.min_seed_len, max_occ=opt.max_occ,
            k_occ=MAX_OCC_LOCATE, band=opt.w,
            max_chain_gap=opt.max_chain_gap, drop_ratio=opt.drop_ratio,
            max_chains=MAX_CHAINS, o_del=opt.o_del, e_del=opt.e_del,
            o_ins=opt.o_ins, e_ins=opt.e_ins, match=opt.a,
            mismatch=opt.b, pen_clip5=opt.pen_clip5,
            pen_clip3=opt.pen_clip3, w=opt.w, zdrop=opt.zdrop,
            T=opt.T, mask_level=opt.mask_level,
            mask_level_redun=opt.mask_level_redun,
            glob_band=2 * opt.w + 8,
            split_len=opt.split_len, split_width=opt.split_width,
            min_chain_weight=opt.min_chain_weight,
            max_chain_extend=opt.max_chain_extend,
                max_mem_intv=opt.max_mem_intv)

    def _mapq_vals(self, score, sub, sub_n, qspan, tspan, frac_rep):
        """Float64 mem_approx_mapq_se (identical to _mapq) as scalars."""
        opt = self.options
        sub = sub if sub else opt.min_seed_len * opt.a
        if sub >= score:
            return 0
        length = max(qspan, tspan)
        identity = 1.0 - float(length * opt.a - score) \
            / (opt.a + opt.b) / length
        if score == 0:
            return 0
        tmp = 1.0 if length < opt.mapQ_coef_len \
            else opt.mapQ_coef_fac / math.log(length)
        tmp *= identity * identity
        mapq = int(6.02 * (score - sub) / opt.a * tmp * tmp + 0.499)
        if sub_n > 0:
            mapq -= int(4.343 * math.log(sub_n + 1) + 0.499)
        mapq = min(mapq, 60)
        mapq = max(mapq, 0)
        return int(mapq * (1.0 - frac_rep) + 0.499)

    def _hits_from_full(self, enc, lens, res):
        """Unpack align_full outputs into per-read hit dicts (the
        fused equivalent of _collect_regions + _regions_to_hits).

        Thin adapter over the columnar unpacking so the object API and
        the native emission path share ONE semantic source."""
        cols = self._hits_cols_from_full(enc, lens, res)
        if cols is None:
            # extension-stage DP slot overflow: redo through the
            # classic (uncompacted-capable) path
            B = enc.shape[0]
            regs = self._collect_regions(enc, lens)[:B]
            return self._regions_to_hits(enc, lens, [""] * B,
                                         [""] * B, regs)
        return self._cols_to_hit_dicts(cols, enc.shape[0])

    def _cols_to_hit_dicts(self, cols, B):
        """Columnar hits -> per-read dict lists (object-API shape)."""
        hits: list[list[dict]] = [[] for _ in range(B)]
        ops_str = "MDI"
        ro, rl = cols["run_ops"], cols["run_lens"]
        ri = cols["read_idx"]
        for i in range(ri.size):
            n = int(cols["cig_n"][i])
            if n == 0:
                cig2l = [("M", int(cols["match_len"][i]))]
            else:
                o = int(cols["cig_off"][i])
                cig2l = [(ops_str[ro[k]], int(rl[k]))
                         for k in range(o, o + n)]
            if cols["is_rev"][i]:
                cig2l = list(reversed(cig2l))
            c5, c3 = int(cols["clip5"][i]), int(cols["clip3"][i])
            full = ([("N", c5)] if c5 else []) + cig2l \
                + ([("N", c3)] if c3 else [])
            hits[int(ri[i])].append(dict(
                rid=int(cols["rid"][i]), pos=int(cols["pos"][i]),
                is_rev=bool(cols["is_rev"][i]),
                score=int(cols["score"][i]),
                mapq=int(cols["mapq"][i]),
                secondary=bool(cols["is_sec"][i]),
                cigar=full, nm=int(cols["nm"][i]),
                n_regs=int(cols["n_regs"][i]),
                slot=int(cols["slot"][i]), sec=int(cols["sec"][i])))
        return hits

    def _hits_cols_from_full(self, enc, lens, res):
        """Columnar hit extraction from align_full outputs: flat
        per-hit numpy arrays (grouped by read, aligner append order)
        ready for the native C++ record encoder (native/bamenc.cpp).
        Returns None when the fused program's extension DP slots
        overflowed (caller falls back to the classic path)."""
        opt = self.options
        regions = np.asarray(res[0])
        snm = np.asarray(res[1])
        packed = np.asarray(res[2])
        B = enc.shape[0]
        C = REGION_SLOTS
        if self.wide:
            # join the (hi, lo) rb/re planes into the int32 layout's
            # 10-field order, widened to int64 (the vectorized math
            # below is already int64-safe)
            fw = regions[:, :C * NFIELD_W].reshape(B, C, NFIELD_W) \
                .astype(np.int64)
            join = fw[:, :, 2] * (1 << LO_BITS) + fw[:, :, 3], \
                fw[:, :, 4] * (1 << LO_BITS) + fw[:, :, 5]
            fields = np.stack(
                [fw[:, :, 0], fw[:, :, 1], join[0], join[1],
                 fw[:, :, 6], fw[:, :, 7], fw[:, :, 8], fw[:, :, 9],
                 fw[:, :, 10], fw[:, :, 11]], axis=2)
            extra0 = C * NFIELD_W
        else:
            fields = regions[:, :C * NFIELD].reshape(B, C, NFIELD)
            extra0 = C * NFIELD
        rep_cov = regions[:, extra0]
        n_regs = regions[:, extra0 + 1]
        self.stats["occ_clipped"] += int(regions[:, extra0 + 2].sum())
        self.stats["seeds_at_cap"] += int(regions[:, extra0 + 3].sum())
        self.stats["chains_at_cap"] += int(
            (regions[:, extra0 + 4] > MAX_CHAINS).sum())
        self.stats["escapees_deferred"] += int(
            regions[:, extra0 + 7].sum())
        # extension-stage DP slot overflow: the fused program's
        # compacted extension dropped chains; redo the batch through
        # the classic (uncompacted-capable) path
        from .device_pipeline import dp_rows
        if B and int(regions[0, extra0 + 6]) > dp_rows(B):
            # telemetry: this fallback re-runs the whole batch through
            # the classic path (~2.5x cost) — it must stay RARE
            self.stats["fused_overflow_fallback"] += 1
            return None
        # batch run-length decode for every used DP row
        n_dp = int(regions[0, extra0 + 5]) if B else 0
        run_rows, run_ops, run_lens = _ops_to_runs(
            _unpack_ops(packed), n_dp)

        # host fallback for wide/overflow regions (rare)
        fb_rows = []            # (b, j) needing a host global pass
        flags = fields[:, :, 8]
        live = (flags & FLAG_EMIT) != 0
        scoref = fields[:, :, 4]
        for b, j in zip(*np.nonzero(live & (scoref >= opt.T)
                                    & ((flags & (FLAG_WIDE | FLAG_OVER))
                                       != 0))):
            fb_rows.append((b, j))
            if flags[b, j] & FLAG_WIDE:
                self.stats["regions_widened"] += 1
        keep_fb: list[tuple] = []
        fb_nm = np.zeros(0, np.int32)
        if fb_rows:
            Lq = enc.shape[1]
            Lt_wide = Lq + 512
            for b, j in fb_rows:
                if fields[b, j, 1] - fields[b, j, 0] <= Lq \
                        and fields[b, j, 3] - fields[b, j, 2] <= Lt_wide:
                    keep_fb.append((b, j))
                else:
                    self.stats["regions_dropped_wide"] += 1
            if keep_fb:
                M = _bucket(len(keep_fb))
                q = np.full((M, Lq), 4, np.uint8)
                t = np.full((M, Lt_wide), 4, np.uint8)
                ql = np.zeros(M, np.int32)
                tl = np.zeros(M, np.int32)
                for k, (b, j) in enumerate(keep_fb):
                    qb, qe, rb, re = fields[b, j, :4]
                    ql[k] = qe - qb
                    tl[k] = re - rb
                    q[k, :ql[k]] = enc[b, qb:qe]
                    t[k, :tl[k]] = self.text[rb:re]
                r2 = global_and_traceback_packed(
                    jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t),
                    jnp.asarray(tl), o_del=opt.o_del, e_del=opt.e_del,
                    o_ins=opt.o_ins, e_ins=opt.e_ins, match=opt.a,
                    mismatch=opt.b, band=Lt_wide + 8)
                snm2 = np.asarray(r2[0])
                fb_nm = snm2[:len(keep_fb), 1].astype(np.int32)
                # append fallback runs after the main DP rows (row ids
                # offset by n_dp keep run_rows globally sorted)
                fb_rr, fb_ro, fb_rl = _ops_to_runs(
                    _unpack_ops(np.asarray(r2[1])), len(keep_fb))
                run_rows = np.concatenate([run_rows, fb_rr + n_dp])
                run_ops = np.concatenate([run_ops, fb_ro])
                run_lens = np.concatenate([run_lens, fb_rl])

        l_pac = self.index.l_pac
        # vectorized per-slot math (the B*C Python loop was the fused
        # path's host bottleneck); Python touches only emitted slots
        qb_a = fields[:, :, 0]; qe_a = fields[:, :, 1]
        rb_a = fields[:, :, 2]; re_a = fields[:, :, 3]
        sc_a = fields[:, :, 4]
        emit = live & (sc_a >= opt.T)
        dprow_a = fields[:, :, 9]
        has_cig = (dprow_a >= 0) | ((flags & FLAG_PERFECT) != 0)
        is_rev = rb_a >= l_pac
        L_a = lens[:, None].astype(np.int64)
        clip5 = np.where(is_rev, L_a - qe_a, qb_a)
        clip3 = np.where(is_rev, qb_a, L_a - qe_a)
        pos2l = np.where(is_rev, 2 * l_pac - re_a, rb_a)
        offs = self._ann_offs
        rid_a = np.searchsorted(offs, pos2l, side="right") - 1
        pos_a = pos2l - offs[rid_a]
        ref_len = self._ann_lens[rid_a]
        in_contig = pos_a + (re_a - rb_a) <= ref_len
        sec_mask = fields[:, :, 7] >= 0
        # vectorized float64 mem_approx_mapq_se
        sub_a2 = np.where(fields[:, :, 5] > 0, fields[:, :, 5],
                          opt.min_seed_len * opt.a).astype(np.float64)
        length = np.maximum(qe_a - qb_a, re_a - rb_a).astype(np.float64)
        length = np.maximum(length, 1.0)
        ident = 1.0 - (length * opt.a - sc_a) / (opt.a + opt.b) / length
        tmp = np.where(length < opt.mapQ_coef_len, 1.0,
                       opt.mapQ_coef_fac / np.log(np.maximum(length, 2.0)))
        tmp = tmp * ident * ident
        mq = (6.02 * (sc_a - sub_a2) / opt.a * tmp * tmp
              + 0.499).astype(np.int64)
        subn_f = fields[:, :, 6]
        mq = mq - np.where(subn_f > 0,
                           (4.343 * np.log(subn_f + 1) + 0.499)
                           .astype(np.int64), 0)
        mq = np.clip(mq, 0, 60)
        frac = rep_cov.astype(np.float64) / np.maximum(lens, 1)[:B]
        mq = (mq * (1.0 - frac[:, None]) + 0.499).astype(np.int64)
        mq = np.where(sub_a2 >= sc_a, 0, mq)
        mq = np.where(sec_mask, 0, mq)

        # ---- columnar hit assembly (no per-hit Python objects) -------
        b_m, j_m = np.nonzero(emit & has_cig & in_contig)
        perf_m = (flags[b_m, j_m] & FLAG_PERFECT) != 0
        d_m = np.where(perf_m, 0, dprow_a[b_m, j_m]).astype(np.int64)
        if run_rows.size:
            off_m = np.searchsorted(run_rows, d_m).astype(np.int64)
            cnt_m = (np.searchsorted(run_rows, d_m, side="right")
                     - off_m).astype(np.int32)
        else:
            off_m = np.zeros(d_m.size, np.int64)
            cnt_m = np.zeros(d_m.size, np.int32)
        off_m = np.where(perf_m, 0, off_m)
        cnt_m = np.where(perf_m, 0, cnt_m).astype(np.int32)
        if n_dp:
            nm_m = np.where(perf_m, 0,
                            snm[np.clip(d_m, 0, n_dp - 1), 1]
                            ).astype(np.int32)
        else:
            nm_m = np.zeros(d_m.size, np.int32)
        mlen_m = np.where(perf_m, qe_a[b_m, j_m] - qb_a[b_m, j_m],
                          0).astype(np.int32)
        # fallback-path regions (wide/overflow) appended per read AFTER
        # the main slots (same order the dict path historically used)
        fb_b, fb_j, fb_off, fb_cnt, fb_nm_k = [], [], [], [], []
        for k, (b, j) in enumerate(keep_fb):
            if not in_contig[b, j]:
                continue
            d = n_dp + k
            o = int(np.searchsorted(run_rows, d))
            e = int(np.searchsorted(run_rows, d, side="right"))
            fb_b.append(b); fb_j.append(j)
            fb_off.append(o); fb_cnt.append(e - o)
            fb_nm_k.append(int(fb_nm[k]))
        ab = np.concatenate([b_m, np.array(fb_b, np.int64)]
                            ).astype(np.int64)
        aj = np.concatenate([j_m, np.array(fb_j, np.int64)]
                            ).astype(np.int64)
        off_all = np.concatenate([off_m,
                                  np.array(fb_off, np.int64)])
        cnt_all = np.concatenate([cnt_m,
                                  np.array(fb_cnt, np.int32)])
        nm_all = np.concatenate([nm_m, np.array(fb_nm_k, np.int32)])
        mlen_all = np.concatenate([mlen_m,
                                   np.zeros(len(fb_b), np.int32)])
        order = np.argsort(ab, kind="stable")
        ab, aj = ab[order], aj[order]
        return dict(
            read_idx=ab.astype(np.int32),
            rid=rid_a[ab, aj].astype(np.int32),
            pos=pos_a[ab, aj].astype(np.int32),
            is_rev=is_rev[ab, aj].astype(np.uint8),
            is_sec=sec_mask[ab, aj].astype(np.uint8),
            score=sc_a[ab, aj].astype(np.int32),
            mapq=mq[ab, aj].astype(np.int32),
            nm=np.ascontiguousarray(nm_all[order], np.int32),
            n_regs=n_regs[ab].astype(np.int32),
            slot=aj.astype(np.int32),
            sec=fields[ab, aj, 7].astype(np.int32),
            clip5=clip5[ab, aj].astype(np.int32),
            clip3=clip3[ab, aj].astype(np.int32),
            cig_off=np.ascontiguousarray(off_all[order], np.int64),
            cig_n=np.ascontiguousarray(cnt_all[order], np.int32),
            match_len=np.ascontiguousarray(mlen_all[order], np.int32),
            run_ops=np.ascontiguousarray(run_ops, np.uint8),
            run_lens=np.ascontiguousarray(run_lens, np.int32))

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def _encode_batch(self, seqs: list[str]):
        L = _round_up(max(len(s) for s in seqs), 32)
        Bp = _bucket(len(seqs), mn=8)   # static read-batch bucket
        lens = np.zeros(Bp, np.int64)
        lens[:len(seqs)] = [len(s) for s in seqs]
        enc = np.full((Bp, L), 4, np.uint8)
        # one table lookup over the whole batch (row-major mask order
        # matches the concatenation order)
        blob = "".join(seqs).encode()
        codes = NT4_TABLE[np.frombuffer(blob, np.uint8)]
        mask = np.arange(L, dtype=np.int64)[None, :] < lens[:, None]
        enc[mask] = codes
        return enc, lens

    def align_stream(self, read_iter, batch_size: int = 4096,
                     hardclip: bool = False, keep_sec_frac: float = 0.9,
                     max_secondary: int = 10, workers: int = 2):
        """Pipelined streaming alignment: yields (read, records) pairs.

        Each batch's seed stage is dispatched ahead, and batch
        finishing (extension/global dispatches + host processing) runs
        on a small thread pool: one batch's host work overlaps another
        batch's device fetch-waits (the GIL is released while blocking
        on the link).  Results are yielded in order."""
        import concurrent.futures as _fut

        def batches():
            buf = []
            for r in read_iter:
                buf.append(r)
                if len(buf) >= batch_size:
                    yield buf
                    buf = []
            if buf:
                yield buf

        def finish(args):
            return list(self._finish_batch(
                *args, hardclip, keep_sec_frac, max_secondary))

        with _fut.ThreadPoolExecutor(max(workers, 1)) as pool:
            inflight: list = []
            fused = self.mesh is None and type(self) is BWAAligner
            for chunk in batches():
                enc, lens = self._encode_batch([r.seq for r in chunk])
                if fused:
                    s1 = self._dispatch_full(enc, lens)
                else:
                    s1 = self._dispatch_stage1(
                        jnp.asarray(enc),
                        jnp.asarray(lens.astype(np.int32)))
                inflight.append(pool.submit(finish,
                                            (chunk, enc, lens, s1)))
                while len(inflight) >= max(workers, 1) + 1:
                    yield from inflight.pop(0).result()
            for fut in inflight:
                yield from fut.result()

    # ------------------------------------------------------------------
    # native record emission (write-side fast path; native/bamenc.cpp)
    # ------------------------------------------------------------------

    def _ref_name_arrays(self):
        """Contig-name blob + offsets for the native XA/SAM encoder."""
        if getattr(self, "_ref_blob_cache", None) is None:
            enc_names = [n.encode() for n in self._contig_names()]
            off = np.zeros(len(enc_names) + 1, np.int64)
            np.cumsum(np.array([len(b) for b in enc_names], np.int64),
                      out=off[1:])
            blob = np.frombuffer(b"".join(enc_names), np.uint8)
            self._ref_blob_cache = (blob, off)
        return self._ref_blob_cache

    def _payload_batch(self, chunk, enc, lens, s1, hardclip,
                       keep_sec_frac, max_secondary, sam=False):
        """Finisher for the native-emission path: fused outputs ->
        serialized BAM records (or SAM text).  Falls back to the
        Python object path (byte-identically — pinned by
        tests/test_native_emit.py) when the native library is missing,
        the aligner is sharded, or the fused program overflowed."""
        B = len(chunk)
        cols = None
        if self.mesh is None and type(self) is BWAAligner \
                and _native.get_lib() is not None:
            cols = self._hits_cols_from_full(enc, lens, s1)
        if cols is None:
            hdr = None
            if sam:
                hdr = self.index.header_from_index()
            payload = bytearray()
            counts = np.zeros(B, np.int32)
            from ..io.bam import encode_record
            for b, (_, recs) in enumerate(self._finish_batch(
                    chunk, enc, lens, s1, hardclip, keep_sec_frac,
                    max_secondary)):
                counts[b] = len(recs)
                for r in recs:
                    if sam:
                        payload += r.to_sam(hdr).encode() + b"\n"
                    else:
                        payload += encode_record(r)
            return bytes(payload), counts
        mask = cols["read_idx"] < B
        if not mask.all():
            cols = _filter_cols(cols, mask)
        opt = self.options
        ksf = keep_sec_frac
        if keep_sec_frac < 0.0 or keep_sec_frac > 1.0:
            cols = _filter_cols(cols, cols["is_sec"] == 0)
            ksf = 0.0
        qn = [r.name.encode() for r in chunk]
        sq = [r.seq.encode() for r in chunk]
        qname_off = np.zeros(B + 1, np.int64)
        np.cumsum(np.array([len(x) for x in qn], np.int64),
                  out=qname_off[1:])
        seq_off = np.zeros(B + 1, np.int64)
        np.cumsum(np.array([len(x) for x in sq], np.int64),
                  out=seq_off[1:])
        ref_blob, ref_off = self._ref_name_arrays()
        return _native.bam_encode_hits(
            cols, np.frombuffer(b"".join(qn), np.uint8), qname_off,
            np.frombuffer(b"".join(sq), np.uint8), seq_off,
            ref_blob, ref_off, hardclip, ksf, max_secondary,
            opt.XA_drop_ratio, opt.max_XA_hits,
            mode=1 if sam else 0)

    def align_batch_bam(self, seqs: list[str], names: list[str],
                        hardclip: bool = False,
                        keep_sec_frac: float = 0.9,
                        max_secondary: int = 10, sam: bool = False):
        """Batch alignment with native record emission.

        Returns (payload, counts): payload is the concatenation of
        serialized BAM records (or SAM text lines with ``sam=True``)
        and counts[i] is the number of records emitted for read i.
        Byte-identical to serializing :meth:`align_batch`'s records;
        the record-assembly stage (XA gathering, MAPQ sort,
        keepSecFrac/maxSecondary filters, clip rewrite, revcomp 4-bit
        packing, tag emission — BWAAligner.cpp:133-241 semantics) runs
        in C++ (native/bamenc.cpp)."""
        import collections
        _Read = collections.namedtuple("_Read", "name seq")
        B = len(seqs)
        if B == 0:
            return b"", np.zeros(0, np.int32)
        chunk = [_Read(n, s) for n, s in zip(names, seqs)]
        enc, lens = self._encode_batch(seqs)
        if self.mesh is None and type(self) is BWAAligner:
            s1 = self._dispatch_full(enc, lens)
        else:
            s1 = self._dispatch_stage1(
                jnp.asarray(enc), jnp.asarray(lens.astype(np.int32)))
        return self._payload_batch(chunk, enc, lens, s1, hardclip,
                                   keep_sec_frac, max_secondary, sam)

    def align_stream_bam(self, read_iter, batch_size: int = 4096,
                         hardclip: bool = False,
                         keep_sec_frac: float = 0.9,
                         max_secondary: int = 10, workers: int = 2,
                         sam: bool = False):
        """Pipelined streaming alignment with native record emission.

        Yields (chunk, payload, counts) per batch — chunk is the list
        of input reads, payload the serialized BAM records (or SAM
        text with ``sam=True``), counts the per-read record counts.
        The C encode call releases the GIL, so one batch's record
        assembly overlaps another's device fetch-wait — this is the
        production fastq->BAM path (the host-bound Python record loop
        was the r3 9.3k-17.2k throughput swing; VERDICT r3 #2)."""
        import concurrent.futures as _fut

        def batches():
            buf = []
            for r in read_iter:
                buf.append(r)
                if len(buf) >= batch_size:
                    yield buf
                    buf = []
            if buf:
                yield buf

        def finish(args):
            chunk, enc, lens, s1 = args
            payload, counts = self._payload_batch(
                chunk, enc, lens, s1, hardclip, keep_sec_frac,
                max_secondary, sam)
            return chunk, payload, counts

        with _fut.ThreadPoolExecutor(max(workers, 1)) as pool:
            inflight: list = []
            fused = self.mesh is None and type(self) is BWAAligner
            for chunk in batches():
                enc, lens = self._encode_batch([r.seq for r in chunk])
                if fused:
                    s1 = self._dispatch_full(enc, lens)
                else:
                    s1 = self._dispatch_stage1(
                        jnp.asarray(enc),
                        jnp.asarray(lens.astype(np.int32)))
                inflight.append(pool.submit(finish,
                                            (chunk, enc, lens, s1)))
                while len(inflight) >= max(workers, 1) + 1:
                    yield inflight.pop(0).result()
            for fut in inflight:
                yield fut.result()

    def _finish_batch(self, chunk, enc, lens, s1, hardclip,
                      keep_sec_frac, max_secondary):
        names = [r.name for r in chunk]
        seqs = [r.seq for r in chunk]
        B = len(chunk)
        if self.mesh is None and type(self) is BWAAligner:
            hits = self._hits_from_full(enc, lens, s1)
            if keep_sec_frac < 0.0 or keep_sec_frac > 1.0:
                hits = [[h for h in hs if not h["secondary"]]
                        for hs in hits]
        else:
            regions = self._collect_regions(enc, lens, stage1=s1)[:B]
            if keep_sec_frac < 0.0 or keep_sec_frac > 1.0:
                regions = [[r for r in rs if r.secondary < 0]
                           for rs in regions]
            hits = self._regions_to_hits(enc, lens, names, seqs,
                                         regions)
        for b in range(B):
            yield chunk[b], self._assemble_records(
                seqs[b], names[b], hits[b], hardclip, keep_sec_frac,
                max_secondary)

    def align_batch(self, seqs: list[str], names: list[str],
                    hardclip: bool = False, keep_sec_frac: float = 0.9,
                    max_secondary: int = 10) -> list[list[BamRecord]]:
        """Align a batch of reads; returns per-read BamRecord lists with
        the reference's sort/filter semantics
        (BWAAligner.cpp:133-241)."""
        B = len(seqs)
        if B == 0:
            return []
        if max(len(s) for s in seqs) > self.LONG_READ_BP \
                and type(self) is BWAAligner:
            # long queries (assembled contigs via the fml path etc.)
            # exceed the fused pipeline's packed chain keys: route
            # through the host-chained long path
            return self._align_batch_long(seqs, names, hardclip,
                                          keep_sec_frac, max_secondary)
        enc, lens = self._encode_batch(seqs)
        if self.mesh is None and type(self) is BWAAligner:
            res = self._dispatch_full(enc, lens)
            hits_per_read = self._hits_from_full(enc, lens, res)
            if keep_sec_frac < 0.0 or keep_sec_frac > 1.0:
                hits_per_read = [[h for h in hs if not h["secondary"]]
                                 for hs in hits_per_read]
        else:
            regions = self._collect_regions(enc, lens)[:B]
            if keep_sec_frac < 0.0 or keep_sec_frac > 1.0:
                regions = [[r for r in rs if r.secondary < 0]
                           for rs in regions]
            hits_per_read = self._regions_to_hits(enc, lens, names,
                                                  seqs, regions)
        out = []
        for b in range(B):
            out.append(self._assemble_records(
                seqs[b], names[b], hits_per_read[b], hardclip,
                keep_sec_frac, max_secondary))
        return out

    def align_sequence(self, seq, name: str = "", out: list | None = None,
                       hardclip: bool = False, keep_sec_frac: float = 0.9,
                       max_secondary: int = 10) -> list[BamRecord]:
        """Reference-compatible single-read API
        (alignSequence BWAAligner.cpp:89-252).  Accepts a sequence
        string or an UnalignedSequence."""
        if isinstance(seq, UnalignedSequence):
            us = seq
            recs = self.align_sequence(us.seq, us.name, None, hardclip,
                                       keep_sec_frac, max_secondary)
            if self._copy_comment:
                for r in recs:
                    r.add_z_tag("BC", us.com)
            if out is not None:
                out.extend(recs)
            return recs
        recs = self.align_batch([seq], [name], hardclip, keep_sec_frac,
                                max_secondary)[0]
        if out is not None:
            out.extend(recs)
        return recs

    def _contig_names(self) -> list[str]:
        """rid -> contig name (works for plain and sharded indexes via
        the BAM-header view; cached)."""
        if getattr(self, "_names_cache", None) is None:
            hdr = self.index.header_from_index()
            self._names_cache = [hdr.id2name(i)
                                 for i in range(hdr.num_sequences())]
        return self._names_cache

    def _assemble_records(self, seq: str, name: str, hits: list[dict],
                          hardclip: bool, keep_sec_frac: float,
                          max_secondary: int) -> list[BamRecord]:
        # XA (bwa mem_gen_alt, bwamem_extra.c semantics): each
        # secondary hit whose score >= XA_drop_ratio * its primary's
        # score becomes a "ref,(+-)pos1,cigar,NM;" entry on that
        # primary; a primary with more than max_XA_hits qualifying
        # alternates gets NO XA (bwa's cnt[r] > max_XA_hits skip).
        # Alternates are gathered BEFORE the keepSecFrac/maxSecondary
        # output filters, so filtered-out secondaries still surface in
        # XA.  (The reference library itself never emits XA —
        # mem_reg2aln zero-fills it, BWAAligner.cpp:240 guards on it —
        # so this follows `bwa mem` output semantics, limited to
        # score >= T regions, which are the ones with computed CIGARs.)
        opt = self.options
        xa_of: dict[int, list[str]] = {}
        if hits:
            by_slot = {h["slot"]: h for h in hits if h.get("slot", -1) >= 0}
            names = self._contig_names()
            for h in hits:
                r = h.get("sec", -1)
                if r < 0:
                    continue
                p = by_slot.get(r)
                if p is None or h["score"] < p["score"] * opt.XA_drop_ratio:
                    continue
                cig = "".join(
                    f"{ln}{'S' if op == 'N' else op}"
                    for op, ln in h["cigar"])
                xa_of.setdefault(r, []).append(
                    f"{names[h['rid']]},"
                    f"{'-' if h['is_rev'] else '+'}{h['pos'] + 1},"
                    f"{cig},{h['nm']};")
        # sort: MAPQ desc, then rid, then pos (BWAAligner.cpp:6-12)
        hits = sorted(hits, key=lambda h: (-h["mapq"], h["rid"], h["pos"]))
        out: list[BamRecord] = []
        primary_score = 0.0
        for i, h in enumerate(hits):
            is_sec = h["secondary"]
            too_low = is_sec and (primary_score * keep_sec_frac > h["score"])
            too_many = is_sec and (i > max_secondary)
            if too_low or too_many:
                continue
            if not is_sec:
                primary_score = h["score"]
            rec = BamRecord()
            rec.qname = name
            rec.tid = h["rid"]
            rec.pos = h["pos"]
            rec.mapq = h["mapq"]
            rec.flag = (FSECONDARY if is_sec else 0) \
                | (FREVERSE if h["is_rev"] else 0)
            # clip handling: N placeholder -> S or H
            # (BWAAligner.cpp:164-202)
            clip_op = "H" if hardclip else "S"
            fields = []
            clipped = seq
            if hardclip:
                tstart = 0
                clen = 0
                for k, (op, ln) in enumerate(h["cigar"]):
                    if k == 0 and op == "N":
                        tstart = ln
                    elif op in ("M", "I", "S", "=", "X"):
                        clen += ln
                clipped = seq[tstart:tstart + clen] if clen else seq
            for op, ln in h["cigar"]:
                fields.append(CigarField(clip_op if op == "N" else op, ln))
            rec.cigar = Cigar(fields)
            rec.seq = revcomp(clipped) if h["is_rev"] else clipped.upper()
            rec.qual = None
            rec.add_int_tag("NA", h["n_regs"])
            rec.add_int_tag("NM", h["nm"])
            xa = xa_of.get(h.get("slot", -1))
            if xa and not is_sec and len(xa) <= opt.max_XA_hits:
                rec.add_z_tag("XA", "".join(xa))
            rec.add_int_tag("AS", h["score"])
            out.append(rec)
        return out
