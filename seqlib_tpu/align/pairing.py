"""Paired-end engine: insert-size inference, mate-SW rescue, pair
flags/mate annotation, and supplementary marking.

The reference's BWAAligner is single-end (alignSequence,
/root/reference/src/BWAAligner.cpp:89); the paired flags in its own
test BAM come from the *paired* bwa-mem CLI
(/root/reference/tests/data/wgsim.sh:32-36).  This module provides
that CLI-level behaviour for the TPU framework.  The vendored bwa
submodule is absent from the snapshot, so the semantics below are a
documented reconstruction of bwa-mem's published pairing pipeline:

* ``infer_dir`` — mem_infer_dir's algebra: flip one mate onto the
  other's strand in 2L space; orientation in {FF=0, FR=1, RF=2, RR=3}
  and the leftmost-to-leftmost 2L distance.
* ``infer_isize_stats`` — mem_pestat: per-orientation quartiles,
  outlier-trimmed mean/std, and the [low, high] proper-pair bounds
  (OUTLIER_BOUND=2, MAPPING_BOUND=3, MAX_STDDEV=4, MIN_DIR_CNT=10,
  MIN_DIR_RATIO=0.05).
* ``rescue_mate`` / inside :func:`align_pairs` — mem_matesw: when one
  end aligns and its mate found nothing, run a LOCAL SW
  (ops.sw.local_batch = ksw_align's role) of the mate against the
  2L window implied by each non-failed orientation's [low, high], and
  feed any hit scoring >= min_seed_len * a through the aligner's
  normal region->record machinery.
* ``pair_up`` — mem_sam_pe's flag/mate/TLEN bookkeeping; proper-pair
  iff the observed orientation is non-failed and its distance falls
  in [low, high] (legacy fixed-window fallback when no stats are
  supplied).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..core.record import (BamRecord, FMREVERSE, FMUNMAP, FPAIRED,
                           FPROPER_PAIR, FREAD1, FREAD2,
                           FSUPPLEMENTARY)

FF, FR, RF, RR = 0, 1, 2, 3
DIR_NAMES = ("FF", "FR", "RF", "RR")

MIN_DIR_CNT = 10
MIN_DIR_RATIO = 0.05
OUTLIER_BOUND = 2.0
MAPPING_BOUND = 3.0
MAX_STDDEV = 4.0


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


def _rb_2l(rec: BamRecord, l_pac: int, offs) -> int:
    """A record's leftmost 2L-text coordinate (bwa's alnreg rb):
    forward hits keep the genome coordinate; reverse hits map to the
    revcomp half.  ``offs``: contig-offset array indexed by tid."""
    g0 = int(offs[rec.tid]) + rec.pos
    if not rec.reverse_flag():
        return g0
    g1 = int(offs[rec.tid]) + rec.position_end()
    return 2 * l_pac - g1


def infer_dir(l_pac: int, b1: int, b2: int) -> tuple[int, int]:
    """Orientation + distance of two 2L leftmost coordinates
    (mem_infer_dir semantics): mate 2 is flipped onto mate 1's strand;
    distance is |leftmost - leftmost| on that common strand."""
    r1 = b1 >= l_pac
    r2 = b2 >= l_pac
    p2 = b2 if r1 == r2 else 2 * l_pac - 1 - b2
    dist = p2 - b1 if p2 > b1 else b1 - p2
    d = (0 if r1 == r2 else 1) ^ (0 if p2 > b1 else 3)
    return d, dist


@dataclass
class DirStats:
    failed: bool = True
    low: int = 0
    high: int = 0
    avg: float = 0.0
    std: float = 0.0
    count: int = 0


@dataclass
class InsertSizeStats:
    l_pac: int
    dirs: list[DirStats] = field(default_factory=lambda:
                                 [DirStats() for _ in range(4)])

    def enabled(self):
        return [d for d in range(4) if not self.dirs[d].failed]


def infer_isize_stats(pairs, l_pac: int, offs,
                      min_mapq: int = 20) -> InsertSizeStats:
    """mem_pestat reconstruction over (recs1, recs2) primary pairs.

    Uses pairs whose two primaries are mapped on the same contig with
    mapq >= min_mapq (bwa restricts to unique-ish pairs).  Per
    orientation with >= MIN_DIR_CNT observations: quartiles ->
    outlier-trimmed mean/std -> bounds

        low  = max(1, p25 - MAPPING_BOUND*(p75-p25)),
        high = p75 + MAPPING_BOUND*(p75-p25),
        widened to [avg -+ MAX_STDDEV*std] when narrower,

    and orientations with fewer than MIN_DIR_RATIO of the dominant
    count are failed (bwa's "skipped orientation" rule)."""
    dists: list[list[int]] = [[], [], [], []]
    for recs1, recs2 in pairs:
        p1, p2 = _primary(recs1), _primary(recs2)
        if p1 is None or p2 is None:
            continue
        if not p1.mapped_flag() or not p2.mapped_flag():
            continue
        if p1.tid != p2.tid or p1.mapq < min_mapq or p2.mapq < min_mapq:
            continue
        d, dist = infer_dir(l_pac, _rb_2l(p1, l_pac, offs),
                            _rb_2l(p2, l_pac, offs))
        dists[d].append(dist)
    st = InsertSizeStats(l_pac=l_pac)
    for d in range(4):
        v = sorted(dists[d])
        n = len(v)
        ds = st.dirs[d]
        ds.count = n
        if n < MIN_DIR_CNT:
            continue
        p25 = v[int(0.25 * n + 0.499)]
        p50 = v[int(0.50 * n + 0.499)]
        p75 = v[int(0.75 * n + 0.499)]
        iqr = p75 - p25
        lo_t = p25 - OUTLIER_BOUND * iqr
        hi_t = p75 + OUTLIER_BOUND * iqr
        core = [x for x in v if lo_t <= x <= hi_t]
        ds.avg = float(np.mean(core)) if core else float(p50)
        ds.std = float(np.std(core)) if core else 0.0
        ds.high = int(p75 + MAPPING_BOUND * iqr + 0.499)
        ds.low = max(1, int(p25 - MAPPING_BOUND * iqr + 0.499))
        if ds.high < ds.avg + MAX_STDDEV * ds.std:
            ds.high = int(ds.avg + MAX_STDDEV * ds.std + 0.499)
        if ds.low > ds.avg - MAX_STDDEV * ds.std:
            ds.low = max(1, int(ds.avg - MAX_STDDEV * ds.std + 0.499))
        ds.failed = False
    max_cnt = max(d.count for d in st.dirs)
    for ds in st.dirs:
        if not ds.failed and ds.count < MIN_DIR_RATIO * max_cnt:
            ds.failed = True
    return st


def mate_window(stats: InsertSizeStats, d: int, b_anchor: int,
                l_mate: int) -> tuple[int, int] | None:
    """2L window of the mate's leftmost coordinate under orientation
    ``d`` (inverting :func:`infer_dir` for dist in [low, high]), grown
    by the mate length so the whole alignment fits.  Returns
    (begin, end) in 2L space, clamped to the half it lives on, or
    None when the orientation is failed/out of range."""
    ds = stats.dirs[d]
    if ds.failed:
        return None
    l_pac = stats.l_pac
    L2 = 2 * l_pac
    same = d in (FF, RR)
    if same:
        lo, hi = ((b_anchor + ds.low, b_anchor + ds.high) if d == FF
                  else (b_anchor - ds.high, b_anchor - ds.low))
    else:
        # flipped coords: b2 = 2*l_pac - 1 - (b1 +- dist)
        if d == FR:
            lo = L2 - 1 - b_anchor - ds.high
            hi = L2 - 1 - b_anchor - ds.low
        else:  # RF
            lo = L2 - 1 - b_anchor + ds.low
            hi = L2 - 1 - b_anchor + ds.high
    beg, end = lo, hi + l_mate
    # clamp to the half the window midpoint lives on (an alignment
    # never spans the fwd/rev midpoint)
    mid = (beg + end) // 2
    half_lo, half_hi = (0, l_pac) if mid < l_pac else (l_pac, L2)
    beg = max(beg, half_lo)
    end = min(end, half_hi)
    if end - beg < l_mate // 2:
        return None
    return beg, end


def rescue_candidates(aligner, stats: InsertSizeStats,
                      jobs: list[tuple[int, str, int]]):
    """Batch mem_matesw: ``jobs`` = (job_id, mate_seq, anchor_rb_2l).
    Local-SW every (job, enabled orientation) window in ONE device
    call; returns {job_id: [AlnReg, ...]} for hits scoring >=
    min_seed_len * a (bwa's acceptance in mem_matesw)."""
    import jax.numpy as jnp

    from ..core.seq import encode_nt4
    from ..ops.sw import local_batch
    from .aligner import AlnReg

    opt = aligner.options
    text = aligner.text
    lanes = []           # (job_id, wbeg, wlen)
    for job_id, seq, b_anchor in jobs:
        for d in stats.enabled():
            win = mate_window(stats, d, b_anchor, len(seq))
            if win is None:
                continue
            lanes.append((job_id, seq, win[0], win[1] - win[0]))
    out: dict[int, list] = {}
    if not lanes:
        return out
    Lq = max(len(s) for _, s, _, _ in lanes)
    Lt = max(w for _, _, _, w in lanes)
    if Lt >= 2048:       # local_batch packing cap; bounds this wide
        return out       # only arise from degenerate isize stats
    B = len(lanes)
    q = np.full((B, Lq), 4, np.uint8)
    t = np.full((B, Lt), 4, np.uint8)
    ql = np.zeros(B, np.int32)
    tl = np.zeros(B, np.int32)
    for k, (job_id, seq, wbeg, wlen) in enumerate(lanes):
        q[k, :len(seq)] = encode_nt4(seq)
        ql[k] = len(seq)
        t[k, :wlen] = text[wbeg:wbeg + wlen]
        tl[k] = wlen
    res = local_batch(jnp.asarray(q), jnp.asarray(ql), jnp.asarray(t),
                      jnp.asarray(tl), o_del=opt.o_del, e_del=opt.e_del,
                      o_ins=opt.o_ins, e_ins=opt.e_ins, match=opt.a,
                      mismatch=opt.b)
    score = np.asarray(res["score"])
    qb = np.asarray(res["qb"]); qe = np.asarray(res["qe"])
    tb = np.asarray(res["tb"]); te = np.asarray(res["te"])
    thr = opt.min_seed_len * opt.a
    for k, (job_id, seq, wbeg, wlen) in enumerate(lanes):
        if score[k] < thr:
            continue
        reg = AlnReg(rb=wbeg + int(tb[k]), re=wbeg + int(te[k]),
                     qb=int(qb[k]), qe=int(qe[k]), score=int(score[k]),
                     seedcov=int(score[k]), frac_rep=0.0)
        out.setdefault(job_id, []).append(reg)
    return out


def pair_up(recs1: list[BamRecord], recs2: list[BamRecord],
            stats: InsertSizeStats | None = None, offs=None,
            max_isize: int = 1000) -> None:
    """Set pair flags and mate info across the two ends' record lists
    (in place) — mem_sam_pe's bookkeeping after both ends aligned.

    With ``stats`` (+ ``offs`` contig offsets): proper-pair iff the
    observed orientation is non-failed and its 2L distance falls in
    that orientation's [low, high].  Without stats: the legacy
    FR-within-max_isize heuristic."""
    p1, p2 = _primary(recs1), _primary(recs2)
    for r in recs1:
        r.flag |= FPAIRED | FREAD1
    for r in recs2:
        r.flag |= FPAIRED | FREAD2
    for me, other_primary in ((recs1, p2), (recs2, p1)):
        for r in me:
            if other_primary is None \
                    or not other_primary.mapped_flag():
                r.flag |= FMUNMAP
                r.mtid, r.mpos = -1, -1
                continue
            r.mtid = other_primary.tid
            r.mpos = other_primary.pos
            if other_primary.reverse_flag():
                r.flag |= FMREVERSE
    if p1 is None or p2 is None or p1.tid != p2.tid \
            or not p1.mapped_flag() or not p2.mapped_flag():
        return
    left, right = (p1, p2) if p1.pos <= p2.pos else (p2, p1)
    isize = right.position_end() - left.pos
    left.isize = isize
    right.isize = -isize
    if stats is not None and offs is not None:
        d, dist = infer_dir(stats.l_pac, _rb_2l(p1, stats.l_pac, offs),
                            _rb_2l(p2, stats.l_pac, offs))
        ds = stats.dirs[d]
        proper = (not ds.failed) and ds.low <= dist <= ds.high
    else:
        proper = (not left.reverse_flag() and right.reverse_flag()
                  and 0 < isize <= max_isize)
    if proper:
        for r in (p1, p2):
            r.flag |= FPROPER_PAIR


def align_pairs(aligner, seqs1: list[str], seqs2: list[str],
                names: list[str], hardclip: bool = False,
                keep_sec_frac: float = 0.9, max_secondary: int = 10,
                stats: InsertSizeStats | None = None,
                rescue: bool = True):
    """Paired-end alignment of one batch: SE-align both ends, infer
    the insert-size distribution from the batch, mem_matesw-rescue
    ends that found nothing, and set pair flags/mates/TLEN.

    Returns (results1, results2, stats): per-pair record lists plus
    the stats used (pass them back in for subsequent batches of the
    same library to keep the distribution stable, like bwa's
    chunk-level bookkeeping)."""
    out1 = aligner.align_batch(seqs1, names, hardclip=hardclip,
                               keep_sec_frac=keep_sec_frac,
                               max_secondary=max_secondary)
    out2 = aligner.align_batch(seqs2, names, hardclip=hardclip,
                               keep_sec_frac=keep_sec_frac,
                               max_secondary=max_secondary)
    l_pac = getattr(aligner.index, "l_pac", None)
    offs = getattr(aligner, "_ann_offs", None)
    if l_pac is None or offs is None:
        # sharded aligner: no single 2L space — flags-only pairing
        for recs1, recs2 in zip(out1, out2):
            mark_supplementary(recs1)
            mark_supplementary(recs2)
            pair_up(recs1, recs2)
        return out1, out2, None
    if stats is None:
        stats = infer_isize_stats(zip(out1, out2), l_pac, offs)
    if rescue and stats.enabled():
        # ends with NO alignment whose mate has a confident one
        jobs = []
        meta = []            # (side, pair_index)
        for i in range(len(names)):
            for side, (mine, other, mseq) in enumerate(
                    ((out1[i], out2[i], seqs1[i]),
                     (out2[i], out1[i], seqs2[i]))):
                if _primary(mine) is not None:
                    continue
                po = _primary(other)
                if po is None or not po.mapped_flag() or po.mapq == 0:
                    continue
                jobs.append((len(jobs), mseq,
                             _rb_2l(po, l_pac, offs)))
                meta.append((side, i))
        found = rescue_candidates(aligner, stats, jobs)
        # route rescued regions through the aligner's normal
        # region->record machinery (global DP -> CIGAR/NM/MAPQ)
        for job_id, regs in found.items():
            side, i = meta[job_id]
            seq = seqs1[i] if side == 0 else seqs2[i]
            regs = aligner._dedup_and_mark(regs)
            enc, lens = aligner._encode_batch([seq])
            Bp = enc.shape[0]          # bucketed batch: pad the lists
            hits = aligner._regions_to_hits(
                enc, lens, [names[i]] + [""] * (Bp - 1),
                [seq] + [""] * (Bp - 1), [regs] + [[]] * (Bp - 1))
            recs = aligner._assemble_records(
                seq, names[i], hits[0], hardclip, keep_sec_frac,
                max_secondary)
            if recs:
                if side == 0:
                    out1[i] = recs
                else:
                    out2[i] = recs
    for recs1, recs2 in zip(out1, out2):
        mark_supplementary(recs1)
        mark_supplementary(recs2)
        pair_up(recs1, recs2, stats=stats, offs=offs)
    return out1, out2, stats
