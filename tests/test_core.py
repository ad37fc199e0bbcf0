"""Core data-model tests.

Mirrors the live Catch2 suite (/root/reference/tests/test_BamRecord.cpp)
plus behavioral expectations from the legacy suite
(/root/reference/seq_test/seq_test.cpp).
"""

import numpy as np
import pytest

from seqlib_tpu.core import (BamHeader, BamRecord, Cigar, CigarField,
                             GenomicRegion, UnalignedSequence, revcomp)
from seqlib_tpu.core.record import (FRORIENTATION, FFORIENTATION,
                                    UDORIENTATION, FREVERSE, FMREVERSE,
                                    FPAIRED)


# -- Cigar (parity: tests/test_BamRecord.cpp) -------------------------------

def test_cigarfield_prints():
    assert repr(CigarField("M", 10)) == "10M"
    assert repr(CigarField("I", 3)) == "3I"
    assert repr(CigarField("D", 7)) == "7D"


def test_cigar_parse():
    c = Cigar("5M2I3D4S")
    expected = [("M", 5), ("I", 2), ("D", 3), ("S", 4)]
    assert [(f.type, f.length) for f in c] == expected


def test_cigar_equality():
    a = Cigar("10M5I")
    b = Cigar()
    b.add(CigarField("M", 10))
    b.add(CigarField("I", 5))
    assert a == b
    assert not (a == Cigar("10M4I"))


def test_cigar_query_consumed():
    assert Cigar("5M2I3D4S").num_query_consumed() == 11


def test_cigar_reference_consumed():
    assert Cigar("5M2I3D4S").num_reference_consumed() == 8


def test_cigar_invalid():
    with pytest.raises(ValueError):
        CigarField("Q", 5)
    with pytest.raises(ValueError):
        CigarField("M", 0)
    with pytest.raises(ValueError):
        Cigar("5M3")


def test_cigar_bam_roundtrip():
    c = Cigar("5M2I3D4S10H")
    enc = c.to_bam_encoded()
    assert Cigar.from_bam_encoded(enc) == c


# -- GenomicRegion ----------------------------------------------------------

def test_region_basic():
    g = GenomicRegion(0, 100, 200, "+")
    assert g.width() == 101
    assert not g.is_empty()
    assert GenomicRegion().is_empty()


def test_region_validation():
    with pytest.raises(ValueError):
        GenomicRegion(0, 200, 100)
    with pytest.raises(ValueError):
        GenomicRegion(0, 100, 200, "x")


def test_region_overlap_codes():
    a = GenomicRegion(0, 100, 200)
    assert a.get_overlap(GenomicRegion(1, 100, 200)) == 0   # diff chrom
    assert a.get_overlap(GenomicRegion(0, 300, 400)) == 0   # none
    assert a.get_overlap(GenomicRegion(0, 150, 250)) == 1   # partial
    assert a.get_overlap(GenomicRegion(0, 120, 180)) == 2   # arg within
    assert a.get_overlap(GenomicRegion(0, 50, 300)) == 3    # self within
    assert a.get_overlap(a) in (2, 3)


def test_region_ordering():
    assert GenomicRegion(0, 1, 10) < GenomicRegion(0, 2, 10)
    assert GenomicRegion(0, 1, 10) < GenomicRegion(1, 1, 10)
    assert GenomicRegion(0, 1, 9) < GenomicRegion(0, 1, 10)
    assert GenomicRegion(0, 1, 10) == GenomicRegion(0, 1, 10, "-")


def test_region_pad():
    g = GenomicRegion(0, 100, 200)
    g.pad(10)
    assert (g.pos1, g.pos2) == (90, 210)
    with pytest.raises(ValueError):
        GenomicRegion(0, 100, 110).pad(-100)


def test_region_from_string_with_header():
    hdr = BamHeader([("chr1", 1000), ("chr2", 2000)])
    g = GenomicRegion("chr2:100-200", hdr=hdr)
    assert (g.chr, g.pos1, g.pos2) == (1, 100, 200)
    g2 = GenomicRegion("chr1:1,000", hdr=hdr)
    assert (g2.chr, g2.pos1) == (0, 1000)
    g3 = GenomicRegion("chr1", hdr=hdr)
    assert (g3.chr, g3.pos1, g3.pos2) == (0, 1, 1000)
    with pytest.raises(ValueError):
        GenomicRegion("chrZ:1-2", hdr=hdr)


def test_region_chr_naming():
    assert GenomicRegion(22, 1, 2).chr_name() == "X"
    assert GenomicRegion(23, 1, 2).chr_name() == "Y"
    assert GenomicRegion(24, 1, 2).chr_name() == "M"
    assert GenomicRegion(0, 1, 2).chr_name() == "1"


def test_region_distances():
    a = GenomicRegion(0, 100, 200)
    assert a.distance_between_starts(GenomicRegion(0, 150, 160)) == 50
    assert a.distance_between_starts(GenomicRegion(1, 150, 160)) == -1
    assert a.distance_between_ends(GenomicRegion(0, 100, 300)) == 100


# -- BamHeader --------------------------------------------------------------

def test_header_from_sequences():
    hdr = BamHeader([("bcr", 141530), ("abl", 178633)])
    assert hdr.num_sequences() == 2
    assert hdr.name2id("abl") == 1
    assert hdr.name2id("nope") == -1
    assert hdr.id2name(0) == "bcr"
    assert hdr.get_sequence_length("bcr") == 141530
    assert hdr.get_sequence_length(1) == 178633
    assert hdr.get_sequence_length("nope") == -1
    with pytest.raises(IndexError):
        hdr.id2name(5)


def test_header_from_text_roundtrip():
    text = "@HD\tVN:1.4\n@SQ\tSN:c1\tLN:100\n@SQ\tSN:c2\tLN:200\n"
    hdr = BamHeader(text)
    assert hdr.num_sequences() == 2
    assert hdr.as_string() == text
    assert BamHeader().is_empty()
    assert not hdr.is_empty()


# -- BamRecord --------------------------------------------------------------

def test_record_manual_construction():
    gr = GenomicRegion(0, 100, 109, "+")
    r = BamRecord("read1", "ACGTACGTAC", gr, Cigar("10M"))
    assert r.qname == "read1"
    assert r.sequence() == "ACGTACGTAC"
    assert r.mapq == 60
    assert not r.reverse_flag()
    r2 = BamRecord("read2", "ACGTACGTAC", GenomicRegion(0, 100, 109, "-"),
                   "10M")
    assert r2.reverse_flag()


def test_record_manual_construction_validates():
    gr = GenomicRegion(0, 100, 109, "+")
    with pytest.raises(ValueError):
        BamRecord("r", "ACGT", gr, Cigar("10M"))
    with pytest.raises(ValueError):
        BamRecord("r", "ACGTACGTAC", GenomicRegion(0, 100, 105), Cigar("10M"))


def test_record_flags():
    r = BamRecord()
    r.flag = FPAIRED | FREVERSE
    assert r.paired_flag() and r.reverse_flag()
    assert not r.duplicate_flag()
    assert r.mapped_flag()  # FUNMAP not set
    r.set_qc_fail(True)
    assert r.qc_fail_flag()
    r.set_qc_fail(False)
    assert not r.qc_fail_flag()


def test_record_cigar_arithmetic():
    r = BamRecord()
    r.seq = "A" * 20
    r.cigar = Cigar("5S10M2I3S")
    r.pos = 100
    assert r.alignment_position() == 5
    assert r.alignment_end_position() == 17
    assert r.num_soft_clip() == 8
    assert r.num_hard_clip() == 0
    assert r.num_clip() == 8
    assert r.num_match_bases() == 10
    assert r.max_insertion_bases() == 2
    assert r.max_deletion_bases() == 0
    assert r.num_aligned_bases() == 12
    assert r.position_end() == 110


def test_record_pair_orientation():
    r = BamRecord()
    r.flag = FPAIRED | FMREVERSE
    r.tid = r.mtid = 0
    r.pos, r.mpos = 100, 300
    r.seq = "A" * 10
    assert r.pair_orientation() == FRORIENTATION
    assert r.proper_orientation()
    r.flag = FPAIRED
    assert r.pair_orientation() == FFORIENTATION
    r.flag = FPAIRED | 0x4  # unmapped
    assert r.pair_orientation() == UDORIENTATION


def test_record_quality_trim():
    r = BamRecord()
    r.seq = "ACGTACGTAC"
    r.set_qualities("##IIIIII##", 33)
    start, end = r.quality_trimmed_sequence(4)
    assert (start, end) == (2, 8)
    r.qual = None
    assert r.quality_trimmed_sequence(4) == (0, -1)


def test_record_tags():
    r = BamRecord()
    r.add_z_tag("XY", "hello")
    r.add_int_tag("NM", 3)
    assert r.get_z_tag("XY") == "hello"
    assert r.get_int_tag("NM") == 3
    assert r.get_tag("NM") == "3"
    assert r.get_z_tag("ZZ") is None
    r.remove_tag("XY")
    assert r.get_z_tag("XY") is None


def test_record_overlapping_coverage():
    a = BamRecord()
    a.cigar = Cigar("10M")
    a.seq = "A" * 10
    b = BamRecord()
    b.cigar = Cigar("5S5M")
    b.seq = "A" * 10
    assert a.overlapping_coverage(b) == 5


def test_record_sam_line():
    hdr = BamHeader([("chr1", 1000)])
    gr = GenomicRegion(0, 99, 108, "+")
    r = BamRecord("q1", "ACGTACGTAC", gr, Cigar("10M"))
    r.pos = 99
    sam = r.to_sam(hdr)
    f = sam.split("\t")
    assert f[0] == "q1"
    assert f[2] == "chr1"
    assert f[3] == "100"
    assert f[5] == "10M"
    assert f[9] == "ACGTACGTAC"


# -- misc -------------------------------------------------------------------

def test_revcomp():
    assert revcomp("ACGT") == "ACGT"
    assert revcomp("AACG") == "CGTT"
    assert revcomp("ACGTN") == "NACGT"


def test_unaligned_sequence_fastq():
    u = UnalignedSequence("r1", "ACGT", "IIII")
    assert u.to_fastq() == "@r1\nACGT\n+\nIIII\n"
    assert UnalignedSequence("r2", "AC").to_fastq() == "@r2\nAC\n+\nII\n"


def test_append_tag():
    r = BamRecord()
    r.append_tag("SW", "a")
    assert r.get_z_tag("SW") == "a"
    r.append_tag("SW", "b")
    assert r.get_z_tag("SW") == "axb"
