"""Paired-end flag/mate annotation and supplementary marking.

The reference's BWAAligner is single-end (alignSequence,
/root/reference/src/BWAAligner.cpp:89); paired flags in its test BAM
come from the bwa-mem CLI (tests/data/wgsim.sh:32-36).  This module
provides that CLI-level behavior for the TPU framework: given per-end
record lists, pick primaries, set pair flags/mate coordinates/insert
size, and mark extra non-secondary hits as supplementary (bwa
mem_reg2sam semantics).
"""

from __future__ import annotations

from ..core.record import (BamRecord, FMREVERSE, FMUNMAP, FPAIRED,
                           FPROPER_PAIR, FREAD1, FREAD2, FREVERSE,
                           FSECONDARY, FSUPPLEMENTARY, FUNMAP)


def mark_supplementary(recs: list[BamRecord]) -> list[BamRecord]:
    """Among non-secondary hits of one read, keep the first (best) as
    representative; flag the rest supplementary (0x800)."""
    seen_primary = False
    for r in recs:
        if r.secondary_flag():
            continue
        if seen_primary:
            r.flag |= FSUPPLEMENTARY
        else:
            seen_primary = True
    return recs


def _primary(recs: list[BamRecord]) -> BamRecord | None:
    for r in recs:
        if not r.secondary_flag() and not r.supplementary_flag():
            return r
    return None


def pair_up(recs1: list[BamRecord], recs2: list[BamRecord],
            max_isize: int = 1000) -> None:
    """Set pair flags and mate info across the two ends' record lists
    (in place).  Mirrors what bwa-mem's mem_sam_pe does after SE
    alignment of both ends (without the mate-SW rescue)."""
    p1, p2 = _primary(recs1), _primary(recs2)
    for r in recs1:
        r.flag |= FPAIRED | FREAD1
    for r in recs2:
        r.flag |= FPAIRED | FREAD2
    for me, other_primary in ((recs1, p2), (recs2, p1)):
        for r in me:
            if other_primary is None:
                r.flag |= FMUNMAP
                r.mtid, r.mpos = -1, -1
                continue
            r.mtid = other_primary.tid
            r.mpos = other_primary.pos
            if other_primary.reverse_flag():
                r.flag |= FMREVERSE
    # insert size + proper pair on the primary pair
    if p1 is not None and p2 is not None and p1.tid == p2.tid:
        left, right = (p1, p2) if p1.pos <= p2.pos else (p2, p1)
        isize = right.position_end() - left.pos
        left.isize = isize
        right.isize = -isize
        proper = (not left.reverse_flag() and right.reverse_flag()
                  and 0 < isize <= max_isize)
        if proper:
            for r in (p1, p2):
                r.flag |= FPROPER_PAIR
