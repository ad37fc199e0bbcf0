"""Region-restricted CRAM iteration through the .crai.

Parity target: the reference's SetRegion(s)+Next work identically on
CRAM because htslib's iterator machinery is format-agnostic
(/root/reference/src/BamReader.cpp:64-151) and BuildIndex indexes
whatever was written (src/BamWriter.cpp:46-67).  Pins:

* BAM-vs-CRAM equality: the same sorted records written to both
  formats, indexed, and region-queried return IDENTICAL results —
  multi-region auto-advance included (VERDICT r4 missing #1's done
  criterion).
* the hand-assembled multi-container spec fixture
  (tests/data/cram/interop_multi.cram + its hand-computed .crai)
  queried through the production reader.
"""

import os

import numpy as np
import pytest

from seqlib_tpu.core import BamHeader, BamRecord, Cigar, GenomicRegion
from seqlib_tpu.io import BamReader, BamWriter

CRAM_DIR = os.path.join(os.path.dirname(__file__), "data", "cram")


def _mk_records(rng, n, n_chr=2, chr_len=5000):
    recs = []
    for i in range(n):
        r = BamRecord()
        r.qname = f"q{i:04d}"
        r.tid = int(rng.integers(0, n_chr))
        r.pos = int(rng.integers(0, chr_len - 100))
        r.mapq = int(rng.integers(0, 61))
        r.flag = 0
        L = int(rng.integers(30, 80))
        r.seq = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
        r.cigar = Cigar(f"{L}M")
        recs.append(r)
    recs.sort(key=lambda r: (r.tid, r.pos))
    return recs


def _write(path, recs, hdr, fmt=None, records_per_container=None):
    w = BamWriter(fmt)
    if records_per_container and path.endswith(".cram"):
        from seqlib_tpu.io import cram as _cram
        w_old = _cram.CramWriter.RECORDS_PER_CONTAINER
        _cram.CramWriter.RECORDS_PER_CONTAINER = records_per_container
        try:
            assert w.open(path)
            w.set_header(hdr)
            for r in recs:
                w.write_record(r)
            w.close()
        finally:
            _cram.CramWriter.RECORDS_PER_CONTAINER = w_old
    else:
        assert w.open(path)
        w.set_header(hdr)
        for r in recs:
            w.write_record(r)
        w.close()
    assert w.build_index()


def _query(path, regions, reference=None):
    r = BamReader()
    if reference is not None:
        r.set_cram_reference(reference)
    assert r.open(path)
    assert r.set_regions(regions)
    out = []
    while True:
        rec = r.next()
        if rec is None:
            break
        out.append((rec.qname, rec.tid, rec.pos, str(rec.cigar)))
    r.close()
    return out


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cram_region")
    rng = np.random.default_rng(7)
    recs = _mk_records(rng, 300)
    hdr = BamHeader([("chrA", 5000), ("chrB", 5000)])
    bam = str(tmp / "x.bam")
    cram = str(tmp / "x.cram")
    _write(bam, recs, hdr)
    _write(cram, recs, hdr, records_per_container=40)
    assert os.path.exists(cram + ".crai")
    return bam, cram, recs


def test_bam_cram_region_equality(corpus):
    bam, cram, _ = corpus
    regions = [GenomicRegion(0, 1000, 1600),
               GenomicRegion(1, 200, 900),
               GenomicRegion(0, 4000, 4999)]
    got_bam = _query(bam, regions)
    got_cram = _query(cram, regions)
    assert got_bam == got_cram
    assert len(got_bam) > 5


def test_cram_region_matches_scan_filter(corpus):
    _, cram, recs = corpus
    gr = GenomicRegion(1, 1500, 3000)
    beg, end = gr.pos1 - 1, gr.pos2
    want = [(r.qname, r.tid, r.pos, str(r.cigar)) for r in recs
            if r.tid == 1 and r.position_end() > beg and r.pos < end]
    assert _query(cram, [gr]) == want


def test_cram_region_empty_and_reset(corpus):
    _, cram, _ = corpus
    assert _query(cram, [GenomicRegion(0, 4999, 5000)]) == []
    r = BamReader()
    assert r.open(cram)
    assert r.set_regions([GenomicRegion(0, 1, 500)])
    n_r = sum(1 for _ in r)
    r.reset()
    n_all = sum(1 for _ in r)
    assert n_all == 300 and 0 < n_r < n_all


def test_crai_roundtrip(corpus, tmp_path):
    from seqlib_tpu.io.cram import read_crai, write_crai
    _, cram, _ = corpus
    entries = read_crai(cram + ".crai")
    assert len(entries) >= 7    # 300 records / 40 per container
    p = str(tmp_path / "copy.crai")
    write_crai(p, entries)
    assert read_crai(p) == entries


def test_multicontainer_spec_fixture():
    """Hand-assembled multi-container CRAM + hand-computed .crai
    (gen_interop_fixture.gen_multicontainer) queried through the
    production reader."""
    path = os.path.join(CRAM_DIR, "interop_multi.cram")
    r = BamReader()
    assert r.open(path)
    allrecs = [(x.qname, x.tid, x.pos) for x in iter(r.next, None)]
    assert len(allrecs) == 10
    r.close()
    # chr1 window hitting only the middle container
    got = _query(path, [GenomicRegion(0, 480, 640)])
    assert [g[0] for g in got] == ["c1r0", "c1r1"]
    # window overlapping container 1's tail record only
    got = _query(path, [GenomicRegion(0, 240, 260)])
    assert [g[0] for g in got] == ["c0r2"]
    # multi-region across chromosomes, auto-advance
    got = _query(path, [GenomicRegion(0, 900, 1000),
                        GenomicRegion(1, 1, 120)])
    assert [g[0] for g in got] == ["c2r0", "c2r1", "c2r2", "c3r0"]
