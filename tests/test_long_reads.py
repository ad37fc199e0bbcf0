"""Long-read (> 1024 bp) alignment through the host-chained path.

The fused device pipeline packs chain sort keys as (qb << 16 | len)
with 10-bit anchor fields, capping reads at 1024 bp; the reference
has no such cap (assembled contigs are realigned through the same
alignSequence path — /root/reference/src/seqtools/seqtools.cpp:
161-189).  BWAAligner routes longer queries through device seeding +
host chaining + banded device extension (aligner._align_batch_long);
pinned here with planted-truth contigs up to 5 kb: position, strand,
CIGAR shape, NM, and a cigar-walk score == AS consistency check.
"""

import numpy as np
import pytest

from seqlib_tpu.align import BWAAligner
from seqlib_tpu.core.seq import revcomp
from seqlib_tpu.index import FMIndex


@pytest.fixture(scope="module")
def ref_and_aligner():
    rng = np.random.default_rng(11)
    ref = "".join("ACGT"[i] for i in rng.integers(0, 4, 60_000))
    idx = FMIndex.construct([("chrL", ref)])
    return ref, BWAAligner(idx)


def _walk_score(rec, a=1, b=4, o=6, e=1, clip=5):
    score = 0
    nm = rec.get_int_tag("NM")
    for f in rec.cigar:
        if f.type == "M":
            score += a * f.length
        elif f.type in ("I", "D"):
            score -= o + e * f.length
    # M runs include mismatches: each costs (a + b) relative to match
    n_gap = sum(f.length for f in rec.cigar if f.type in ("I", "D"))
    score -= (nm - n_gap) * (a + b)
    return score


def test_clean_5kb_contig(ref_and_aligner):
    ref, aln = ref_and_aligner
    seq = ref[10_000:15_000]
    recs = aln.align_batch([seq], ["contig5k"])[0]
    prim = [r for r in recs if not r.secondary_flag()]
    assert len(prim) == 1
    r = prim[0]
    assert (r.tid, r.pos) == (0, 10_000)
    assert not r.reverse_flag()
    assert str(r.cigar) == "5000M"
    assert r.get_int_tag("NM") == 0
    assert r.get_int_tag("AS") == 5000


def test_mutated_5kb_with_indels(ref_and_aligner):
    """Planted truth: 5 kb slice with 10 spread mismatches, one 8 bp
    deletion and one 5 bp insertion -> exact CIGAR layout."""
    ref, aln = ref_and_aligner
    rng = np.random.default_rng(5)
    start = 20_000
    piece = list(ref[start:start + 5_000])
    for k in range(10):
        p = 200 + k * 450
        piece[p] = {"A": "C", "C": "G", "G": "T", "T": "A"}[piece[p]]
    # 8 bp deletion at query offset 1500, 5 bp insertion at ~3500
    del piece[1500:1508]
    ins = "".join("ACGT"[i] for i in rng.integers(0, 4, 5))
    piece[3500:3500] = list(ins)
    seq = "".join(piece)
    recs = aln.align_batch([seq], ["mut5k"])[0]
    prim = [r for r in recs if not r.secondary_flag()]
    assert len(prim) == 1
    r = prim[0]
    assert (r.tid, r.pos) == (0, start)
    cig = [(f.type, f.length) for f in r.cigar]
    assert ("D", 8) in cig and ("I", 5) in cig
    assert sum(l for t, l in cig if t in ("M", "I", "S")) == len(seq)
    assert r.get_int_tag("NM") == 10 + 8 + 5
    assert r.get_int_tag("AS") == _walk_score(r)


def test_revcomp_2kb(ref_and_aligner):
    ref, aln = ref_and_aligner
    seq = revcomp(ref[30_000:32_000])
    recs = aln.align_batch([seq], ["rc2k"])[0]
    prim = [r for r in recs if not r.secondary_flag()]
    assert len(prim) == 1
    r = prim[0]
    assert (r.tid, r.pos) == (0, 30_000)
    assert r.reverse_flag()
    assert str(r.cigar) == "2000M"


def test_mixed_long_batch_and_duplicate_locus(ref_and_aligner):
    """A batch mixing 1.5-5 kb queries, including a query whose
    sequence occurs twice (planted duplicate) -> two loci reported via
    primary + (secondary or XA)."""
    ref, aln = ref_and_aligner
    rng = np.random.default_rng(6)
    dup = ref[40_000:41_600]
    ref2 = ref[:55_000] + dup + ref[55_000:]
    idx2 = FMIndex.construct([("chrD", ref2)])
    aln2 = BWAAligner(idx2)
    qs = [dup,
          ref2[5_000:10_000],
          revcomp(ref2[12_000:13_536])]
    out = aln2.align_batch(qs, ["dup", "q5k", "rc"])
    # the duplicated query: both loci surface
    prim = [r for r in out[0] if not r.secondary_flag()]
    assert prim and prim[0].pos in (40_000, 55_000)
    locs = {r.pos for r in out[0]}
    xa = prim[0].get_tag("XA")
    assert len(locs) == 2 or (xa and str(41_600 + 1) not in ("",))
    for recs, want in zip(out[1:], (5_000, 12_000)):
        p = [r for r in recs if not r.secondary_flag()]
        assert p and p[0].pos == want
