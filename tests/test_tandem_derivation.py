"""Tandem/stress recall: the per-seed second extension closes the
historical 6/129 deficit (VERDICT r4 #5).

History: through round 4 the pipeline extended exactly ONE anchor (the
longest seed) per chain, and the corpus oracle EXEMPTED the
rep_tandem/rep_stress classes from its score lower bound on the claim
that bwa would land on the same sub-optimal score.  The round-5
derivation (this file's git history) mechanically FALSIFIED that
claim: on rep_stress reads, seeds of other tandem registers escape the
first extension's region, and bwa's mem_chain2aln seed loop
(`if seed contained in an existing region: continue; else extend`)
WOULD extend them — one of those extensions reaches the DP optimum.

The pipeline now mirrors that seed loop with fixed shapes
(device_pipeline ESC_SLOTS: up to three second extensions per read
from the longest escaped occurrences with distinct query starts,
under a cond so escape-free batches skip the work).  Pins:

* below_window == 0 over the FULL tandem+stress classes (the corpus
  oracle's exemption is deleted);
* on known stress reads, the optimum-scoring region demonstrably
  comes from a SECOND extension (the single-anchor score is lower) —
  i.e. the rescue is doing the work, not a chaining accident;
* escapees_deferred telemetry stays 0 (the slots suffice here).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

jax = pytest.importorskip("jax")

from seqlib_tpu.align import BWAAligner  # noqa: E402
from seqlib_tpu.index import FMIndex  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    import regen_golden as rg
    from test_corpus_oracle import Oracle
    genome = rg.make_repeat_genome()
    aln = BWAAligner(FMIndex.construct([("rep1", genome)]))
    reads = [r for r in rg.make_repeat_reads(genome)
             if r[0].startswith(("rep_tandem", "rep_stress"))]
    return aln, Oracle(aln), reads


def test_no_below_window_reads(setup):
    aln, oracle, reads = setup
    out = aln.align_batch([s for _, s in reads], [n for n, _ in reads])
    CLIP = aln.options.pen_clip5 + aln.options.pen_clip3
    below = []
    checked = 0
    for (name, seq), recs in zip(reads, out):
        prim = [r for r in recs if not r.secondary_flag()]
        best, _n, capped = oracle.best_score(seq)
        if capped or best < aln.options.T or not prim:
            continue
        checked += 1
        if prim[0].get_int_tag("AS") < best - CLIP:
            below.append((name, prim[0].get_int_tag("AS"), best))
    assert checked >= 120
    assert not below, below
    assert aln.stats["escapees_deferred"] == 0


def test_rescue_beats_single_anchor(setup):
    """For stress reads the optimum provably needs the SECOND
    extension: rerunning the pipeline with the rescue slots disabled
    (primary-anchor score only, reconstructed from the kept chains'
    first extension) scores strictly lower on at least 3 reads."""
    import numpy as np
    import jax.numpy as jnp

    from seqlib_tpu.align.aligner import MAX_CHAINS, REGION_SLOTS
    from seqlib_tpu.align.device_pipeline import (
        seed_chain_extend_packed, unpack_stage1)
    aln, oracle, reads = setup
    stress = [r for r in reads if r[0].startswith("rep_stress")][:64]
    seqs = [s for _, s in stress]
    enc, lens = aln._encode_batch(seqs)
    packed = seed_chain_extend_packed(
        aln.fm, aln.text_j, jnp.asarray(enc),
        jnp.asarray(lens.astype(np.int32)), l_pac=aln.index.l_pac)
    out = unpack_stage1(np.asarray(packed), REGION_SLOTS)
    n_better = 0
    for b in range(len(stress)):
        keep = out["keep"][b]
        sc = out["score"][b]
        chain_best = max((int(sc[c]) for c in range(MAX_CHAINS)
                          if keep[c]), default=0)
        esc_best = max((int(sc[c]) for c in range(MAX_CHAINS,
                                                  REGION_SLOTS)
                        if keep[c]), default=0)
        if esc_best > chain_best:
            n_better += 1
    assert n_better >= 3, n_better
