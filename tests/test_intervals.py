"""Interval engine tests: IntervalIndex correctness vs brute force,
GRC semantics vs the reference behaviors
(/root/reference/SeqLib/GenomicRegionCollection.cpp and legacy
seq_test.cpp interval cases).
"""

import random

import numpy as np

from seqlib_tpu.core import BamHeader, GenomicRegion
from seqlib_tpu.intervals import GRC, IntervalIndex


def brute_overlap(starts, ends, q1, q2):
    return [i for i in range(len(starts))
            if starts[i] <= q2 and ends[i] >= q1]


def test_interval_index_vs_bruteforce():
    rng = random.Random(42)
    n = 500
    starts = [rng.randint(0, 10000) for _ in range(n)]
    ends = [s + rng.randint(0, 500) for s in starts]
    idx = IntervalIndex(starts, ends)
    for _ in range(200):
        q1 = rng.randint(0, 10000)
        q2 = q1 + rng.randint(0, 800)
        expect = sorted(brute_overlap(starts, ends, q1, q2))
        got = sorted(int(i) for i in idx.find_overlapping(q1, q2))
        assert got == expect
        assert idx.count_overlapping(q1, q2) == len(expect)


def test_interval_index_batch_count():
    rng = random.Random(1)
    starts = [rng.randint(0, 1000) for _ in range(100)]
    ends = [s + rng.randint(0, 100) for s in starts]
    idx = IntervalIndex(starts, ends)
    q1 = np.array([rng.randint(0, 1000) for _ in range(50)])
    q2 = q1 + 50
    counts = idx.count_overlapping_batch(q1, q2)
    for k in range(50):
        assert counts[k] == len(brute_overlap(starts, ends, q1[k], q2[k]))


def test_find_contained():
    idx = IntervalIndex([10, 20, 30], [15, 40, 35])
    assert sorted(idx.find_contained(5, 50).tolist()) == [0, 1, 2]
    assert sorted(idx.find_contained(10, 16).tolist()) == [0]
    assert idx.find_contained(11, 14).size == 0


def test_grc_shuffle_preserves_size():
    grc = GRC()
    grc.add(GenomicRegion(0, 100, 200, "+"))
    grc.add(GenomicRegion(1, 300, 400, "-"))
    before = len(grc)
    grc.shuffle()
    assert len(grc) == before


def test_grc_merge():
    grc = GRC()
    grc.add(GenomicRegion(0, 4, 5))
    grc.add(GenomicRegion(0, 5, 6))     # touching -> merge
    grc.add(GenomicRegion(0, 10, 20))
    grc.add(GenomicRegion(0, 15, 18))   # nested -> merge
    grc.add(GenomicRegion(1, 4, 6))     # other chrom
    grc.merge_overlapping_intervals()
    rs = [(r.chr, r.pos1, r.pos2) for r in grc]
    assert rs == [(0, 4, 6), (0, 10, 20), (1, 4, 6)]


def test_grc_find_overlaps_single():
    grc = GRC()
    grc.add(GenomicRegion(0, 100, 200))
    grc.add(GenomicRegion(0, 150, 250))
    grc.add(GenomicRegion(1, 100, 200))
    grc.create_tree_map()
    out = grc.find_overlaps(GenomicRegion(0, 180, 300))
    assert len(out) == 2
    # trimmed intersections
    assert [(r.pos1, r.pos2) for r in out] == [(180, 200), (180, 250)]
    assert grc.count_overlaps(GenomicRegion(0, 180, 300)) == 2
    assert grc.count_overlaps(GenomicRegion(2, 180, 300)) == 0


def test_grc_find_overlaps_many():
    subject = GRC()
    subject.add(GenomicRegion(0, 100, 200))
    subject.add(GenomicRegion(0, 300, 400))
    subject.create_tree_map()
    query = GRC()
    query.add(GenomicRegion(0, 150, 350))
    query.add(GenomicRegion(0, 500, 600))
    out, qids, sids = query.find_overlaps(subject)
    assert len(out) == 2
    assert qids == [0, 0]
    assert sids == [0, 1]
    assert [(r.pos1, r.pos2) for r in out] == [(150, 200), (300, 350)]


def test_grc_intersection():
    a = GRC()
    a.add(GenomicRegion(0, 100, 200))
    b = GRC()
    b.add(GenomicRegion(0, 150, 250))
    b.add(GenomicRegion(0, 500, 600))
    out = a.intersection(b)
    assert len(out) == 1
    assert (out[0].pos1, out[0].pos2) == (150, 200)


def test_grc_tiling_region():
    gr = GenomicRegion(0, 1, 1000)
    grc = GRC(gr, width=100, ovlp=0)
    assert len(grc) > 0
    assert grc[0].pos1 == 1 and grc[0].pos2 == 101
    # tail covered
    assert grc[len(grc) - 1].pos2 == 1000


def test_grc_tiling_header():
    hdr = BamHeader([("c1", 250)])
    grc = GRC(hdr, width=100, ovlp=0)
    assert len(grc) == 2
    assert grc[0].pos1 == 0 and grc[0].pos2 == 100


def test_grc_read_bed(tmp_path):
    bed = tmp_path / "t.bed"
    bed.write_text("#comment\nchr1\t100\t200\nchr2\t300\t400\nchrZ\t1\t2\n")
    hdr = BamHeader([("chr1", 1000), ("chr2", 1000)])
    grc = GRC()
    assert grc.read_bed(str(bed), hdr)
    assert len(grc) == 2
    assert (grc[0].chr, grc[0].pos1, grc[0].pos2) == (0, 100, 200)


def test_grc_read_bed_gz(tmp_path):
    import gzip
    bed = tmp_path / "t.bed.gz"
    with gzip.open(bed, "wt") as fh:
        fh.write("chr1\t100\t200\n")
    hdr = BamHeader([("chr1", 1000)])
    grc = GRC()
    assert grc.read_bed(str(bed), hdr)
    assert len(grc) == 1


def test_grc_read_vcf(tmp_path):
    vcf = tmp_path / "t.vcf"
    vcf.write_text("##header\n#CHROM\tPOS\nchr1\t1000\t.\tA\tT\n")
    hdr = BamHeader([("chr1", 10000)])
    grc = GRC()
    assert grc.read_vcf(str(vcf), hdr)
    assert len(grc) == 1
    assert (grc[0].pos1, grc[0].pos2) == (1000, 1000)


def test_grc_region_string_constructor():
    hdr = BamHeader([("chr1", 1000)])
    grc = GRC("chr1:100-200", header=hdr)
    assert len(grc) == 1
    assert (grc[0].pos1, grc[0].pos2) == (100, 200)


def test_grc_batch_counts():
    grc = GRC()
    for i in range(100):
        grc.add(GenomicRegion(i % 3, i * 10, i * 10 + 50))
    grc.create_tree_map()
    chrs = np.array([0, 1, 2, 0])
    p1 = np.array([0, 100, 5000, 900])
    p2 = p1 + 100
    counts = grc.count_overlaps_batch(chrs, p1, p2)
    for k in range(4):
        assert counts[k] == grc.count_overlaps(
            GenomicRegion(int(chrs[k]), int(p1[k]), int(p2[k])))


def test_grc_misc():
    grc = GRC()
    grc.add(GenomicRegion(0, 10, 20))
    grc.add(GenomicRegion(0, 30, 40))
    assert grc.total_width() == 22
    grc.pad(2)
    assert (grc[0].pos1, grc[0].pos2) == (8, 22)
    other = GRC()
    other.add(GenomicRegion(1, 1, 2))
    grc.concat(other)
    assert len(grc) == 3
    bed = grc.as_bed_string()
    assert bed.count("\n") == 3
