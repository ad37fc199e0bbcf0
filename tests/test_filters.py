"""ReadFilter engine tests (JSON DSL parity with
/root/reference/src/ReadFilter.cpp and legacy seq_test expectations).
"""

import numpy as np
import pytest

from seqlib_tpu.core import BamHeader, BamRecord, Cigar, GenomicRegion
from seqlib_tpu.core.record import (FPAIRED, FREVERSE, FMREVERSE, FDUP,
                                    FUNMAP, FMUNMAP, FSECONDARY)
from seqlib_tpu.filters import (AbstractRule, AhoCorasick, AhoCorasickTrie,
                                Flag, FlagRule, Range, ReadFilter,
                                ReadFilterCollection)
from seqlib_tpu.intervals import GRC


def mkread(qname="r1", tid=0, pos=100, mapq=30, flag=0, seq="ACGTACGTAC",
           cigar="10M", nm=None, mtid=None, mpos=None):
    r = BamRecord()
    r.qname = qname
    r.tid = tid
    r.pos = pos
    r.mapq = mapq
    r.flag = flag
    r.seq = seq
    r.cigar = Cigar(cigar)
    r.mtid = tid if mtid is None else mtid
    r.mpos = pos + 200 if mpos is None else mpos
    if nm is not None:
        r.add_int_tag("NM", nm)
    return r


# -- Range ------------------------------------------------------------------

def test_range_semantics():
    assert Range().is_valid(12345)
    r = Range(10, 20, False, False)
    assert r.is_valid(10) and r.is_valid(20) and not r.is_valid(9)
    inv = Range(10, 20, True, False)
    assert inv.is_valid(9) and inv.is_valid(21) and not inv.is_valid(15)


def test_range_parse_forms():
    r = Range()
    r.parse_json({"mapq": 10}, "mapq")
    assert (r.min, r.max, r.inverted) == (10, 2**31 - 1, False)
    r2 = Range()
    r2.parse_json({"isize": [100, 600]}, "isize")
    assert (r2.min, r2.max) == (100, 600)
    r3 = Range()
    r3.parse_json({"clip": True}, "clip")
    assert (r3.min, r3.max, r3.inverted) == (1, 2**31 - 1, False)
    r4 = Range()
    r4.parse_json({"clip": False}, "clip")
    assert r4.inverted and (r4.min, r4.max) == (1, 2**31 - 1)


# -- FlagRule ---------------------------------------------------------------

def test_flagrule_masks():
    fr = FlagRule()
    fr.parse_json({"allflag": 0x1 | 0x10})
    assert fr.is_valid(mkread(flag=0x1 | 0x10 | 0x20))
    assert not fr.is_valid(mkread(flag=0x1))
    fr2 = FlagRule()
    fr2.parse_json({"!anyflag": 0x400})
    assert fr2.is_valid(mkread(flag=0))
    assert not fr2.is_valid(mkread(flag=FDUP))


def test_flagrule_named():
    fr = FlagRule()
    fr.parse_json({"duplicate": False})
    assert fr.is_valid(mkread(flag=0))
    assert not fr.is_valid(mkread(flag=FDUP))
    fr2 = FlagRule()
    fr2.parse_json({"mapped": True})
    assert fr2.is_valid(mkread(flag=0))
    assert not fr2.is_valid(mkread(flag=FUNMAP))


def test_flagrule_orientation():
    fr = FlagRule()
    fr.parse_json({"fr": True})
    # proper FR pair
    ok = mkread(flag=FPAIRED | FMREVERSE, pos=100, mpos=400)
    assert fr.is_valid(ok)
    # FF pair fails
    ff = mkread(flag=FPAIRED, pos=100, mpos=400)
    assert not fr.is_valid(ff)
    # unpaired fails when orientation requested
    assert not fr.is_valid(mkread(flag=0))


# -- AbstractRule -----------------------------------------------------------

def test_abstract_rule_ranges():
    ar = AbstractRule()
    ar.parse_json({"mapq": [10, 50]})
    assert ar.is_valid(mkread(mapq=30))
    assert not ar.is_valid(mkread(mapq=5))
    assert not ar.is_valid(mkread(mapq=55))


def test_abstract_rule_nm_len_clip():
    ar = AbstractRule()
    ar.parse_json({"nm": [1, 100]})
    assert not ar.is_valid(mkread(nm=0))
    assert ar.is_valid(mkread(nm=3))
    ar2 = AbstractRule()
    ar2.parse_json({"length": [20, 1000]})
    assert not ar2.is_valid(mkread(seq="ACGTACGTAC", cigar="10M"))
    ar3 = AbstractRule()
    ar3.parse_json({"clip": True})
    assert not ar3.is_valid(mkread())
    clipped = mkread(seq="ACGTACGTAC", cigar="3S7M")
    assert ar3.is_valid(clipped)


def test_abstract_rule_subsample_deterministic():
    ar = AbstractRule()
    ar.subsam_frac = 0.5
    votes = [ar.is_valid(mkread(qname=f"read{i}")) for i in range(400)]
    frac = sum(votes) / len(votes)
    assert 0.4 < frac < 0.6
    # deterministic
    assert votes == [ar.is_valid(mkread(qname=f"read{i}"))
                     for i in range(400)]


def test_abstract_rule_rg():
    ar = AbstractRule()
    ar.parse_json({"rg": "RG7"})
    r = mkread()
    r.add_z_tag("RG", "RG7")
    assert ar.is_valid(r)
    r2 = mkread()
    r2.add_z_tag("RG", "other")
    assert not ar2_fail(ar, r2)


def ar2_fail(ar, r):
    return ar.is_valid(r)


def test_motif_rule(tmp_path):
    mfile = tmp_path / "motifs.txt"
    mfile.write_text("ACGTAC\nTTTTTT\n")
    ar = AbstractRule()
    ar.parse_json({"motif": str(mfile)})
    assert ar.is_valid(mkread(seq="GGACGTACGG"))
    assert not ar.is_valid(mkread(seq="GGGGGGGGGG"))
    inv = AbstractRule()
    inv.parse_json({"!motif": str(mfile)})
    assert not inv.is_valid(mkread(seq="GGACGTACGG"))
    assert inv.is_valid(mkread(seq="GGGGGGGGGG"))


# -- Aho-Corasick -----------------------------------------------------------

def test_ahocorasick_trie():
    t = AhoCorasickTrie()
    for p in ("he", "she", "his", "hers"):
        t.insert(p)
    matches = t.parse_text("ushers")
    found = {m[2] for m in matches}
    assert found == {"she", "he", "hers"}


def test_ahocorasick_wrapper(tmp_path):
    f = tmp_path / "m.txt"
    f.write_text("AAA\nCCC\n")
    a = AhoCorasick()
    a.trie_from_file(str(f))
    assert a.count == 2
    assert a.query_text("GGAAAGG") == 1
    assert a.query_text("AAAA") == 2  # overlapping
    assert a.query_text("GGGG") == 0
    with pytest.raises(RuntimeError):
        AhoCorasick().trie_from_file("/nonexistent")


# -- ReadFilter / Collection ------------------------------------------------

def test_readfilter_region_gating():
    rf = ReadFilter()
    grc = GRC()
    grc.add(GenomicRegion(0, 50, 150))
    rf.set_regions(grc)
    assert rf.is_read_overlapping_region(mkread(pos=100))
    assert not rf.is_read_overlapping_region(mkread(pos=5000))
    assert not rf.is_read_overlapping_region(mkread(tid=1, pos=100))


def test_readfilter_matelink():
    rf = ReadFilter()
    grc = GRC()
    grc.add(GenomicRegion(0, 50, 150))
    rf.set_regions(grc)
    rf.m_applies_to_mate = True
    r = mkread(pos=5000, mpos=100)
    assert rf.is_read_overlapping_region(r)


def test_collection_json_basic():
    hdr = BamHeader([("chr1", 100000)])
    script = """
    {"global": {"duplicate": false},
     "r1": {"region": "chr1:1-10,000",
            "rules": [{"mapq": [10, 60]}]}}
    """
    fc = ReadFilterCollection(script, hdr)
    assert len(fc.m_regions) == 1
    assert fc.is_valid(mkread(pos=100, mapq=30))
    assert not fc.is_valid(mkread(pos=100, mapq=5))
    assert not fc.is_valid(mkread(pos=100, mapq=30, flag=FDUP))  # global
    assert not fc.is_valid(mkread(pos=50000, mapq=30))  # outside region


def test_collection_exclude_region():
    hdr = BamHeader([("chr1", 100000)])
    script = """
    {"bad": {"region": "chr1:1000-2000", "exclude": true},
     "all": {"region": "WG"}}
    """
    fc = ReadFilterCollection(script, hdr)
    assert fc.is_valid(mkread(pos=50000))
    assert not fc.is_valid(mkread(pos=1500))


def test_collection_auto_includer():
    hdr = BamHeader([("chr1", 100000)])
    script = '{"bad": {"region": "chr1:1000-2000", "exclude": true}}'
    fc = ReadFilterCollection(script, hdr)
    # excluder only -> auto WG includer added
    assert len(fc.m_regions) == 2
    assert fc.is_valid(mkread(pos=50000))
    assert not fc.is_valid(mkread(pos=1500))


def test_collection_malformed_json_throws():
    hdr = BamHeader([("chr1", 1000)])
    with pytest.raises(ValueError):
        ReadFilterCollection("{invalid json", hdr)


def test_collection_empty_passes_all():
    fc = ReadFilterCollection()
    assert fc.is_valid(mkread())
    assert fc.m_count_seen == 1


def test_collection_counters():
    hdr = BamHeader([("chr1", 100000)])
    fc = ReadFilterCollection('{"a": {"rules": [{"mapq": 10}]}}', hdr)
    fc.is_valid(mkread(mapq=30))
    fc.is_valid(mkread(mapq=5))
    assert fc.m_count_seen == 2
    assert fc.m_count == 1
