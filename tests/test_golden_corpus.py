"""Golden-corpus regression pins (VERDICT r2 item 6): 5k reads across
the reference's own wgsim corpus and a repeat-heavy synthetic with
deterministic mismatch/indel/clip/multimap/tandem classes.

Regenerate intentionally with:  python tests/regen_golden.py
(each golden file starts with '#'-prefixed provenance lines).

These are the whole-pipeline record-level safety net for
correctness-affecting changes (the round-2 seeder swap went unnoticed
partly because only 100 reads were pinned).
"""

import os

import pytest

from seqlib_tpu.align import BWAAligner
from seqlib_tpu.index import FMIndex
from seqlib_tpu.io import FastqReader

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = "/root/reference/tests/data"
CHUNK = 1000


def _golden(name):
    path = os.path.join(HERE, "golden", name)
    lines = open(path).read().splitlines()
    return [l for l in lines if not l.startswith("#")]


def _align_corpus(aligner, hdr, reads):
    # single source of truth for chunking/padding/record order lives in
    # the generator (ADVICE r3: the copy here could drift silently)
    import regen_golden as rg
    return rg._align_corpus(aligner, hdr, reads)


def test_golden_wgsim_4k():
    seqs = [(s.name, s.seq) for s in FastqReader(f"{DATA}/tiny.fa")]
    idx = FMIndex.construct(seqs)
    aln = BWAAligner(idx)
    hdr = idx.header_from_index()

    def load(fq, n):
        out = []
        for rec in FastqReader(f"{DATA}/{fq}"):
            out.append((rec.name, rec.seq))
            if len(out) >= n:
                break
        return out

    reads = load("sim1_bcr.fq", 2000) + load("sim2_bcr.fq", 2000)
    got = _align_corpus(aln, hdr, reads)
    expect = _golden("sam_wgsim_4k.txt")
    assert len(got) == len(expect)
    assert got == expect


def test_golden_repeat_1k():
    import regen_golden as rg
    genome = rg.make_repeat_genome()
    idx = FMIndex.construct([("rep1", genome)])
    aln = BWAAligner(idx)
    hdr = idx.header_from_index()
    reads = rg.make_repeat_reads(genome)
    got = _align_corpus(aln, hdr, reads)
    expect = _golden("sam_repeat_1k.txt")
    assert len(got) == len(expect)
    assert got == expect
    # class sanity: multimapper class must carry XA or mapq 0 records
    dup_lines = [l for l in got if l.startswith("rep_dup_")]
    assert dup_lines
    assert all(l.split("\t")[4] == "0" for l in dup_lines), \
        "exact-duplicate-locus reads must be mapq 0"
    xa_lines = [l for l in got if l.startswith("rep_xa_") and "XA:Z:" in l]
    assert xa_lines, "divergent-copy reads must emit XA alternatives"
