"""Stats (Histogram, BamStats, STCoverage, Fractions) and SeqPlot tests."""

import numpy as np
import pytest

from seqlib_tpu.core import BamHeader, BamRecord, Cigar, GenomicRegion
from seqlib_tpu.core.record import FDUP, FPAIRED, FMREVERSE, FSECONDARY
from seqlib_tpu.plot import SeqPlot
from seqlib_tpu.stats import (BamStats, Fractions, Histogram, STCoverage,
                              mean_phred)


def mkread(qname="r", tid=0, pos=100, seq="ACGTACGTAC", cigar="10M",
           flag=0, mapq=30):
    r = BamRecord()
    r.qname = qname
    r.tid = tid
    r.pos = pos
    r.seq = seq
    r.cigar = Cigar(cigar)
    r.flag = flag
    r.mapq = mapq
    r.mtid = tid
    r.mpos = pos + 200
    return r


# -- Histogram --------------------------------------------------------------

def test_histogram_fixed_width():
    h = Histogram(0, 100, 10)
    assert h.num_bins() == 11  # [0..9] ... [100,100]
    h.add_elem(5)
    h.add_elem(7)
    h.add_elem(15)
    assert h.bin_count(0) == 2
    assert h.bin_count(1) == 1
    assert h.total_count() == 3
    h.remove_elem(5)
    assert h.bin_count(0) == 1
    with pytest.raises(ValueError):
        Histogram(10, 10, 1)


def test_histogram_quantile_init():
    h = Histogram()
    h.initialize(4, [1, 2, 3, 4, 100, 200, 300, 400])
    assert h.num_bins() >= 2
    for v in (1, 4, 100, 400):
        h.add_elem(v)
    assert h.total_count() == 4


def test_histogram_csv():
    h = Histogram(0, 10, 5)
    h.add_elem(3)
    csv = h.to_csv()
    assert "0,4,1" in csv


# -- BamStats ---------------------------------------------------------------

def test_bamstats_groups_and_counters():
    st = BamStats()
    r1 = mkread()
    r1.add_z_tag("RG", "G1")
    r1.add_int_tag("NM", 2)
    st.add_read(r1)
    r2 = mkread(flag=FDUP)
    r2.add_z_tag("RG", "G1")
    st.add_read(r2)
    r3 = mkread(qname="X:123")
    st.add_read(r3)  # no RG -> QNAMED_X
    assert set(st.group_map) == {"G1", "QNAMED_X"}
    g = st.group_map["G1"]
    assert g.reads == 2
    assert g.duplicate == 1
    assert g.mapq.total_count() == 2
    out = repr(st)
    assert out.startswith("ReadGroup\t")
    assert "G1" in out


def test_mean_phred():
    r = mkread()
    assert mean_phred(r) == -1.0
    r.qual = np.array([10, 20, 30], dtype=np.uint8)
    assert mean_phred(r) == 20.0


# -- STCoverage -------------------------------------------------------------

def test_coverage_basic():
    cov = STCoverage()
    cov.add_read(mkread(pos=100))
    cov.add_read(mkread(pos=105))
    assert cov.get_coverage_at_position(0, 100) == 1
    assert cov.get_coverage_at_position(0, 106) == 2
    assert cov.get_coverage_at_position(0, 500) == 0
    assert cov.get_coverage_at_position(5, 100) == 0
    assert cov.max_cov() == 2


def test_coverage_full_length_and_buff():
    cov = STCoverage()
    r = mkread(pos=100, seq="ACGTACGTAC", cigar="3S7M")
    cov.add_read(r, full_length=True)
    # starts 3 before pos
    assert cov.get_coverage_at_position(0, 97) == 1
    cov2 = STCoverage()
    cov2.add_read(mkread(pos=100), buff=2)
    assert cov2.get_coverage_at_position(0, 100) == 0
    assert cov2.get_coverage_at_position(0, 102) == 1


def test_coverage_bedgraph():
    gr = GenomicRegion(0, 100, 200)
    cov = STCoverage(gr)
    cov.add_read(mkread(pos=120))
    bg = cov.to_bedgraph()
    assert bg
    lines = bg.strip().split("\n")
    assert all(len(l.split("\t")) == 4 for l in lines)


# -- Fractions --------------------------------------------------------------

def test_fractions_bed(tmp_path):
    bed = tmp_path / "f.bed"
    bed.write_text("chr1\t100\t200\t0.25\nchr1\t500\t600\t0.75\n")
    hdr = BamHeader([("chr1", 10000)])
    fr = Fractions()
    assert fr.read_from_bed(str(bed), hdr)
    assert fr.size() == 2
    assert fr.find_fraction(0, 150, 160) == 0.25
    assert fr.find_fraction(0, 550, 560) == 0.75
    assert fr.find_fraction(0, 5000, 5100) == 1.0


# -- SeqPlot ----------------------------------------------------------------

def test_seqplot_renders_stacked():
    sp = SeqPlot()
    sp.set_view(GenomicRegion(0, 100, 200))
    reads = [
        mkread(qname="a", pos=105, seq="AAAAAAAAAA", cigar="10M"),
        mkread(qname="b", pos=107, seq="CCCCCCCCCC", cigar="10M"),
        mkread(qname="c", pos=140, seq="GGGGGGGGGG", cigar="10M"),
    ]
    out = sp.plot_alignment_records(reads)
    lines = out.splitlines()
    assert len(lines) == 2  # b overlaps a -> second line; c fits after a
    assert "AAAAAAAAAA" in lines[0]
    assert "GGGGGGGGGG" in lines[0]
    assert "CCCCCCCCCC" in lines[1]
    assert "a>>>1:105" in lines[0]


def test_seqplot_gapped_and_filtered():
    sp = SeqPlot()
    sp.set_view(GenomicRegion(0, 100, 200))
    rd = mkread(qname="d", pos=110, seq="AAAAACCCCC", cigar="5M3D5M")
    out = sp.plot_alignment_records([rd])
    assert "AAAAA---CCCCC" in out
    # outside view -> skipped
    assert sp.plot_alignment_records([mkread(tid=1)]) == ""
    assert sp.plot_alignment_records([mkread(pos=50)]) == ""
