"""Record-level brute-force differential for dedup / primary marking /
MAPQ / XA (VERDICT r2 item 6).

Construction makes the full region set enumerable BY HAND: a 120 bp
segment is planted at k distinct loci of an otherwise-random genome,
each copy carrying a known number of widely-spaced mismatches (>= 25 bp
apart, so every copy keeps seeds >= min_seed_len and chain weights stay
above the drop_ratio filter).  A read equal to the clean segment then
has EXACTLY the planted loci as candidate regions, with analytically
known scores ``120 - (a+b) * hamming`` (gapless, full-length — any
gapped or clipped alternative scores strictly lower).

The slow oracle below derives, from bwa's documented formulas only
(mem_approx_mapq_se, mem_mark_primary_se walk, hash_64 tie-break,
mem_gen_alt XA rule; /root/reference/src/BWAAligner.cpp:104-241
consumes them), the expected: per-record (pos, strand, score),
primary choice, NM, MAPQ, and XA string — and compares against the
production aligner record-for-record.
"""

import math

import numpy as np
import pytest

from seqlib_tpu.align import AlignerOptions, BWAAligner
from seqlib_tpu.index import FMIndex

A, B_PEN, T = 1, 4, 30
SEG = 120


def _hash64(key: int) -> int:
    """bwa hash_64 (independent copy for the oracle)."""
    mask = (1 << 64) - 1
    key = ((~key & mask) + (key << 21)) & mask
    key = key ^ (key >> 24)
    key = (key + (key << 3) + (key << 8)) & mask
    key = key ^ (key >> 14)
    key = (key + (key << 2) + (key << 4)) & mask
    key = key ^ (key >> 28)
    key = (key + (key << 31)) & mask
    return key


def _mapq(score, sub, sub_n, length, a=A, b=B_PEN,
          coef_len=50, min_seed_len=19):
    """mem_approx_mapq_se, written from the formula."""
    sub = sub if sub else min_seed_len * a
    if sub >= score:
        return 0
    identity = 1.0 - float(length * a - score) / (a + b) / length
    tmp = 1.0 if length < coef_len else math.log(coef_len) / math.log(length)
    tmp *= identity * identity
    mapq = int(6.02 * (score - sub) / a * tmp * tmp + 0.499)
    if sub_n > 0:
        mapq -= int(4.343 * math.log(sub_n + 1) + 0.499)
    return max(0, min(mapq, 60))


def _mk_genome(rng, loci_mm, spacing=700):
    """Random genome with the segment planted at len(loci_mm) loci;
    copy i carries loci_mm[i] mismatches at positions 30, 55, 80, ...
    Returns (genome_string, clean_segment, locus_offsets)."""
    seg = "".join("ACGT"[c] for c in rng.integers(0, 4, SEG))
    parts, offs, cur = [], [], 0
    for mm in loci_mm:
        gap = "".join("ACGT"[c] for c in rng.integers(0, 4, spacing))
        copy = list(seg)
        for j in range(mm):
            p = 30 + 25 * j
            copy[p] = "A" if copy[p] != "A" else "C"
        parts.append(gap)
        cur += spacing
        offs.append(cur)
        parts.append("".join(copy))
        cur += SEG
    parts.append("".join("ACGT"[c] for c in rng.integers(0, 4, 400)))
    return "".join(parts), seg, offs


@pytest.mark.parametrize("loci_mm", [(0, 1, 3), (0, 2), (1, 1, 2)])
def test_records_vs_slow_oracle(loci_mm):
    rng = np.random.default_rng(hash(loci_mm) % 2**31)
    genome, seg, offs = _mk_genome(rng, loci_mm)
    aln = BWAAligner(FMIndex.construct([("g", genome)]))
    opt = aln.options
    recs = aln.align_sequence(seg, "r", max_secondary=10)

    # ---- oracle: region set -> mark/mapq/XA ------------------------
    regions = [dict(pos=offs[i], score=SEG * A - (A + B_PEN) * mm, nm=mm)
               for i, mm in enumerate(loci_mm)
               if SEG * A - (A + B_PEN) * mm >= T]
    # mem_ars order: score desc, pos asc; hash walk over that order
    regions.sort(key=lambda r: (-r["score"], r["pos"]))
    walk = sorted(range(len(regions)),
                  key=lambda i: (-regions[i]["score"], _hash64(i)))
    # full query overlap: first in walk order is THE primary, all
    # others secondary to it; sub = best loser score; sub_n = losers
    # within tmp = primary_score * XA? no: bwa counts csub/sub via the
    # marking walk — with one primary and full overlap, sub is the max
    # loser score and sub_n the count of losers with score >= sub? the
    # formula uses sub_n = number of sub-optimal overlapping hits.
    prim = walk[0]
    losers = [regions[i] for i in walk[1:]]
    # mem_mark_primary_se_core: the FIRST loser (walk order = score
    # desc) sets sub; each loser within tmp = max(a+b, o_del+e_del,
    # o_ins+e_ins) of the primary increments sub_n
    sub = losers[0]["score"] if losers else 0
    tmp = max(A + B_PEN, 6 + 1, 6 + 1)
    sub_n = sum(1 for l in losers
                if regions[prim]["score"] - l["score"] <= tmp)
    exp_mapq = _mapq(regions[prim]["score"], sub, sub_n, SEG)

    got_prim = [r for r in recs if not r.secondary_flag()]
    got_sec = [r for r in recs if r.secondary_flag()]
    assert len(got_prim) == 1
    gp = got_prim[0]
    # primary is the hash-walk winner at the right locus
    assert gp.pos == regions[prim]["pos"]
    assert not gp.reverse_flag()
    assert str(gp.cigar) == f"{SEG}M"
    assert gp.get_int_tag("AS") == regions[prim]["score"]
    assert gp.get_int_tag("NM") == regions[prim]["nm"]
    assert gp.mapq == exp_mapq
    # secondaries: exactly the losers above keep_sec_frac * primary
    exp_sec = sorted(l["pos"] for l in losers
                     if l["score"] >= 0.9 * regions[prim]["score"])
    assert sorted(r.pos for r in got_sec) == exp_sec
    assert all(r.mapq == 0 for r in got_sec)
    # XA (mem_gen_alt): losers with score >= XA_drop_ratio * primary
    exp_xa = sorted((l["pos"], l["score"], l["nm"]) for l in losers
                    if l["score"] >= opt.XA_drop_ratio
                    * regions[prim]["score"])
    xa = gp.get_z_tag("XA")
    if not exp_xa:
        assert not xa
    else:
        got_xa = sorted(
            (int(p.lstrip("+-")) - 1, SEG - int(nm) * (A + B_PEN),
             int(nm))
            for _, p, c, nm in (tuple(e.split(","))
                                for e in xa.split(";") if e))
        assert got_xa == [(p, s, n) for p, s, n in exp_xa]
