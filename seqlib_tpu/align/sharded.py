"""Sharded-index aligner: BWA-MEM semantics over a ShardedFMIndex.

Runs the fused stage-1 pipeline (seed scan + SA locate + chaining +
extension — align/device_pipeline.py) once per index shard, then
merges the per-shard candidate regions into one global region list per
read before dedup / primary-secondary marking / MAPQ, so the emitted
records have whole-reference semantics (a read's best hit wins no
matter which shard holds it, secondaries across shards are marked and
score-filtered together, exactly as the reference's single-index
``mem_mark_primary_se`` pass would — /root/reference/src/BWAAligner.cpp
:104-149 over one bwaidx_t).

Cross-shard overlap tests use *global pseudo-2L keys*: forward-strand
regions map to [0, G) (G = total forward bp) by adding the shard's
forward offset; reverse-strand regions map to [G, 2G) via the mirror
``2*l_pac - coord``.  The mirror preserves interval overlap, so the
dedup/mask-level logic is unchanged from the single-index path.

Device placement: by default every shard's FM-index lives on the
default device and stage-1 runs shard-after-shard (all dispatches are
async, so the device pipelines them back-to-back).  Passing
``devices=[...]`` pins shard k to devices[k % n] — the tensor-parallel
analog (SURVEY.md §2.2): stage-1 for all shards runs concurrently,
one shard per chip, with the (small) read batch broadcast to each.

frac_rep approximation: bwa computes the repeat fraction of a read
over the whole index; here each shard reports its own, and a region
uses the max across shards for its read (repeats overwhelmingly live
within one contig, hence one shard).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..index.sharded import ShardedFMIndex
from .aligner import AlnReg, BWAAligner
from .options import AlignerOptions


class ShardedBWAAligner(BWAAligner):
    """Drop-in BWAAligner over a ShardedFMIndex.

    Inherits the public API (align_sequence / align_batch /
    align_stream, option setters) and the record-assembly semantics;
    overrides region generation and hit conversion to fan out across
    shards and merge.
    """

    def __init__(self, index: ShardedFMIndex,
                 options: AlignerOptions | None = None,
                 devices: list | None = None):
        # deliberately NOT calling super().__init__: there is no single
        # device FM-index / text for the whole reference.
        self.index = index
        self.options = options or AlignerOptions()
        self.mesh = None
        self._copy_comment = False
        # merged view over per-shard sub-aligner counters
        self.stats = dict(seeds_at_cap=0, occ_clipped=0,
                          chains_at_cap=0, regs_truncated=0,
                          regions_widened=0, regions_dropped_wide=0)
        self.devices = devices
        self.subs: list[BWAAligner] = []
        for s, fmi in enumerate(index.shards):
            sub = BWAAligner(fmi, self.options)
            if devices:
                d = devices[s % len(devices)]
                sub.fm = jax.device_put(sub.fm, d)
                sub.text_j = jax.device_put(sub.text_j, d)
                sub._device = d
            else:
                sub._device = None
            self.subs.append(sub)
        # global pseudo-2L key layout
        self._fwd_off = []
        g = 0
        for sub in self.subs:
            self._fwd_off.append(g)
            g += sub.index.l_pac
        self._g_total = g

    # ------------------------------------------------------------------

    def _dispatch_stage1(self, enc_j, lens_j):
        """Fan the fused stage-1 out to every shard (all async)."""
        outs = []
        for sub in self.subs:
            e, l = enc_j, lens_j
            if sub._device is not None:
                e = jax.device_put(enc_j, sub._device)
                l = jax.device_put(lens_j, sub._device)
            outs.append(sub._dispatch_stage1(e, l))
        return outs

    def _global_key(self, sub_idx: int, r: AlnReg) -> tuple[int, int]:
        # keys are clamped to the shard's own strand range so a region
        # straddling the fwd/rev midpoint (later dropped at the contig
        # boundary check) can never bleed into ANOTHER shard's key range
        # and spuriously dedup a genuine region there
        lp = self.subs[sub_idx].index.l_pac
        off = self._fwd_off[sub_idx]
        if r.rb >= lp:       # reverse strand: mirror into [G, 2G)
            re_c = min(r.re, 2 * lp)
            return (self._g_total + off + (2 * lp - re_c),
                    self._g_total + off + (2 * lp - r.rb))
        return off + r.rb, off + min(r.re, lp)

    def _collect_regions(self, enc: np.ndarray, lens: np.ndarray,
                         stage1=None, dedup: bool = True
                         ) -> list[list[AlnReg]]:
        B = enc.shape[0]
        if stage1 is None:
            enc_j = jnp.asarray(enc)
            lens_j = jnp.asarray(lens.astype(np.int32))
            stage1 = self._dispatch_stage1(enc_j, lens_j)
        regions: list[list[AlnReg]] = [[] for _ in range(B)]
        frac_rep = np.zeros(B)
        for s, (sub, s1) in enumerate(zip(self.subs, stage1)):
            per = sub._collect_regions(enc, lens, stage1=s1, dedup=False)
            for b in range(B):
                for r in per[b]:
                    r.shard = s
                    r.gb, r.ge = self._global_key(s, r)
                    regions[b].append(r)
                    frac_rep[b] = max(frac_rep[b], r.frac_rep)
        if dedup:
            for b in range(B):
                for r in regions[b]:
                    r.frac_rep = frac_rep[b]
                regions[b] = self._dedup_and_mark(
                    regions[b], key=lambda r: (r.gb, r.ge))
        return regions

    def _regions_to_hits(self, enc, lens, names, seqs, regions):
        """Per-shard global alignment + global rid remap and NA fix."""
        B = len(regions)
        merged: list[list[dict]] = [[] for _ in range(B)]
        for s, sub in enumerate(self.subs):
            shard_regs = [[r for r in rs if r.shard == s]
                          for rs in regions]
            if not any(shard_regs):
                continue
            hits = sub._regions_to_hits(enc, lens, names, seqs,
                                        shard_regs)
            roff = self.index.first_rid[s]
            for b in range(B):
                for h in hits[b]:
                    h["rid"] += roff
                    merged[b].append(h)
        for b in range(B):
            n = len(regions[b])
            for h in merged[b]:
                h["n_regs"] = n     # NA tag counts regions across shards
        return merged
