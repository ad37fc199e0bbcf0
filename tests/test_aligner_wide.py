"""Wide-mode BWAAligner end-to-end parity: identical records vs the
int32 aligner on the reference's own wgsim corpus.

``BWAAligner(idx, wide=True)`` forces the hi/lo device path (the one
auto-selected for >2^31 indexes) on a small index, pinning the whole
wide stack — seed machine, SA walk, chaining, extension, fused
align_full program, host record assembly — against the production
int32 output record-for-record.
"""

import itertools

import numpy as np
import pytest

from seqlib_tpu.align import BWAAligner
from seqlib_tpu.index import FMIndex
from seqlib_tpu.io import FastqReader

DATA = "/root/reference/tests/data"


@pytest.fixture(scope="module")
def idx():
    return FMIndex.construct(
        [(s.name, s.seq) for s in FastqReader(f"{DATA}/tiny.fa")])


@pytest.fixture(scope="module")
def reads():
    return list(itertools.islice(FastqReader(f"{DATA}/sim1_bcr.fq"), 200))


def _records(aligner, reads):
    out = aligner.align_batch([r.seq for r in reads],
                              [r.name for r in reads])
    flat = []
    for recs in out:
        for r in recs:
            flat.append((r.qname, r.flag, r.tid, r.pos, r.mapq,
                         str(r.cigar), r.seq,
                         r.get_int_tag("NM"), r.get_int_tag("AS"),
                         r.get_tag("XA")))
    return flat


def test_wide_records_exact(idx, reads):
    a = BWAAligner(idx)
    b = BWAAligner(idx, wide=True)
    assert b.wide and not a.wide
    ra = _records(a, reads)
    rb = _records(b, reads)
    assert ra == rb
    assert len(ra) >= len(reads)


def test_wide_classic_path_regions(idx, reads):
    """The non-fused (stage-1 + host) path: identical region lists."""
    from seqlib_tpu.core.seq import encode_nt4
    a = BWAAligner(idx)
    b = BWAAligner(idx, wide=True)
    seqs = [r.seq for r in reads[:64]]
    L = max(len(s) for s in seqs)
    enc = np.full((len(seqs), L), 4, np.uint8)
    for i, s in enumerate(seqs):
        enc[i, :len(s)] = encode_nt4(s)
    lens = np.array([len(s) for s in seqs], np.int64)
    ra = a._collect_regions(enc, lens)
    rb = b._collect_regions(enc, lens)
    key = lambda r: (r.rb, r.re, r.qb, r.qe, r.score, r.secondary)  # noqa
    assert [[key(x) for x in rs] for rs in ra] \
        == [[key(x) for x in rs] for rs in rb]


def test_wide_align_sequence(idx):
    """Reference-style one-read API through the wide path."""
    a = BWAAligner(idx)
    b = BWAAligner(idx, wide=True)
    seq = ("GGGTTTGGGAGCAGGGTGGGGGCACCAGCCTTGGCCACCCAGAGG"
           "AACTCTCCATTTTGGGGAGGTGGGAGGGGCTGTGGGAAGAGGCCC")
    ra = a.align_sequence(seq, "q1")
    rb = b.align_sequence(seq, "q1")
    assert [(r.flag, r.tid, r.pos, str(r.cigar)) for r in ra] \
        == [(r.flag, r.tid, r.pos, str(r.cigar)) for r in rb]
