"""Paired-end engine: insert-size inference + mate rescue + proper
flags, pinned against hand-derived oracles.

The reference's own test BAM embodies paired `bwa mem` behaviour
(/root/reference/tests/data/wgsim.sh:32-36); the vendored bwa is
absent, so align/pairing.py documents its reconstruction of
mem_infer_dir / mem_pestat / mem_matesw / mem_sam_pe — each pinned
here by first-principles expectations:

* infer_dir: enumerated strand/order cases vs the flip-to-common-
  strand definition.
* infer_isize_stats: a hand-computed distribution -> exact bounds.
* mate rescue: simulated FR pairs with one end mutated past
  seedability (period-8 mismatches kill every >=19 bp exact seed but
  leave local score ~36 >= min_seed_len*a) MUST be rescued at the
  truth position with proper-pair flags; mutation past alignability
  (period-3) MUST stay unmapped — recall matches the hand-derived
  expectation exactly.
"""

import numpy as np
import pytest

from seqlib_tpu.align import BWAAligner
from seqlib_tpu.align.pairing import (FF, FR, RF, RR, InsertSizeStats,
                                      align_pairs, infer_dir,
                                      infer_isize_stats, mate_window,
                                      pair_up)
from seqlib_tpu.index import FMIndex
from seqlib_tpu.io import FastqReader
from seqlib_tpu.sim import simulate_pairs

DATA = "/root/reference/tests/data"


def test_infer_dir_enumeration():
    L = 1000
    # both forward, 2 right of 1 by 200 -> FF, dist 200
    assert infer_dir(L, 100, 300) == (FF, 200)
    # both forward, 2 left -> RR (reverse-read order), dist 200
    assert infer_dir(L, 300, 100) == (RR, 200)
    # 1 fwd at 100, 2 rev half at b2: flipped p2 = 2L-1-b2
    b2 = 2 * L - 1 - 400          # p2 = 400 > 100 -> FR, dist 300
    assert infer_dir(L, 100, b2) == (FR, 300)
    b2 = 2 * L - 1 - 40           # p2 = 40 <= 100 -> RF, dist 60
    assert infer_dir(L, 100, b2) == (RF, 60)
    # symmetric: both rev -> same-strand cases again
    assert infer_dir(L, 1100, 1300) == (FF, 200)


def test_mate_window_inverts_infer_dir():
    """Every dist in [low, high] must land the mate inside the window
    mate_window predicts, for all four orientations and both anchor
    strands."""
    st = InsertSizeStats(l_pac=10_000)
    for d in range(4):
        st.dirs[d].failed = False
        st.dirs[d].low, st.dirs[d].high = 200, 400
    for d in range(4):
        for b1 in (3000, 17_000):          # fwd-half / rev-half anchor
            win = mate_window(st, d, b1, 100)
            assert win is not None
            for dist in (200, 300, 400):
                # solve for b2 giving (d, dist) from b1
                found = False
                for b2 in range(win[0], win[1]):
                    dd, dv = infer_dir(st.l_pac, b1, b2)
                    if dd == d and dv == dist:
                        found = True
                        break
                assert found, (d, b1, dist, win)


def test_pestat_hand_example():
    """69 FR observations at 300 + 31 spread [250..280] + outliers ->
    hand-computed bounds."""
    l_pac = 100_000
    offs = np.zeros(4, np.int64)

    def rec(pos, rev, mapq=60, L=100):
        from seqlib_tpu.core import BamRecord, Cigar
        r = BamRecord()
        r.tid = 0
        r.pos = pos
        r.mapq = mapq
        r.flag = 0x10 if rev else 0
        r.seq = "A" * L
        r.cigar = Cigar(f"{L}M")
        return r

    pairs = []
    isizes = list(range(250, 281)) + [300] * 66 + [9000, 9000, 9000]
    for k, ins in enumerate(isizes):
        p1 = rec(1000 + 17 * k, False)
        # FR mate: leftmost-to-leftmost 2L dist == ins means the rev
        # mate's flipped coordinate sits ins right of p1.pos
        b2 = 2 * l_pac - 1 - (p1.pos + ins)
        # rev record with 2L rb == b2: genome end = 2*l_pac - b2
        p2 = rec(2 * l_pac - b2 - 100, True)
        pairs.append(([p1], [p2]))
    st = infer_isize_stats(pairs, l_pac, offs)
    v = sorted(isizes)
    n = len(v)
    p25 = v[int(0.25 * n + 0.499)]
    p75 = v[int(0.75 * n + 0.499)]
    iqr = p75 - p25
    core = [x for x in v if p25 - 2.0 * iqr <= x <= p75 + 2.0 * iqr]
    avg, std = float(np.mean(core)), float(np.std(core))
    low = max(1, int(p25 - 3.0 * iqr + 0.499))
    high = int(p75 + 3.0 * iqr + 0.499)
    if high < avg + 4.0 * std:
        high = int(avg + 4.0 * std + 0.499)
    if low > avg - 4.0 * std:
        low = max(1, int(avg - 4.0 * std + 0.499))
    d = st.dirs[FR]
    assert not d.failed
    assert (d.low, d.high) == (low, high)
    assert abs(d.avg - avg) < 1e-9 and abs(d.std - std) < 1e-9
    # the outliers are outside the final bounds; 300 is inside
    assert d.low <= 300 <= d.high < 9000
    # other orientations never observed -> failed
    assert st.enabled() == [FR]


def _mutate_period(seq, period):
    out = list(seq)
    for i in range(0, len(seq), period):
        out[i] = {"A": "C", "C": "G", "G": "T", "T": "A"}[out[i]]
    return "".join(out)


@pytest.fixture(scope="module")
def tiny_aligner():
    seqs = [(s.name, s.seq) for s in FastqReader(f"{DATA}/tiny.fa")]
    return BWAAligner(FMIndex.construct(seqs))


def test_mate_rescue_oracle(tiny_aligner):
    aln = tiny_aligner
    seqs = [(s.name, s.seq) for s in FastqReader(f"{DATA}/tiny.fa")]
    r1, r2 = simulate_pairs(seqs, 64, read_len=100, dist=300,
                            stdev=25, seed=3)
    s1 = [u.seq for u in r1]
    s2 = [u.seq for u in r2]
    names = [u.name for u in r1]
    # hand-derived expectation: period-8 mismatches leave NO >=19 bp
    # exact seed (max run 7) but a local score of
    # ceil(L/8)*(-4) + (L - ceil(L/8)) = 100 - 13*5 = 35 >= 19 ->
    # rescuable; period-3 gives 100 - 34*5 < 0 -> dead
    rescued_idx = list(range(0, 12))
    dead_idx = list(range(12, 16))
    truth_pos = {}
    base2 = aln.align_batch(s2[:16], names[:16])
    for i in rescued_idx + dead_idx:
        prim = [r for r in base2[i] if not r.secondary_flag()]
        assert prim, "fixture read should map cleanly before mutation"
        truth_pos[i] = (prim[i == -1] if False else prim[0].tid,
                        prim[0].pos, prim[0].reverse_flag())
    for i in rescued_idx:
        s2[i] = _mutate_period(s2[i], 8)
    for i in dead_idx:
        s2[i] = _mutate_period(s2[i], 3)

    # sanity: the mutated ends are invisible to the seeded aligner
    mut = aln.align_batch([s2[i] for i in rescued_idx + dead_idx],
                          ["m"] * len(rescued_idx + dead_idx))
    assert all(not recs for recs in mut), \
        "period-8 mutation should defeat seeding entirely"

    out1, out2, st = align_pairs(aln, s1, s2, names)
    assert st is not None and FR in st.enabled()
    n_rescued = 0
    for i in rescued_idx:
        prim = [r for r in out2[i] if not r.secondary_flag()]
        assert prim, f"pair {i}: mate not rescued"
        got = prim[0]
        tid0, pos0, rev0 = truth_pos[i]
        assert got.tid == tid0
        assert abs(got.pos - pos0) <= 20
        assert got.reverse_flag() == rev0
        assert got.proper_pair()
        assert got.flag & 0x80          # read2
        n_rescued += 1
    assert n_rescued == len(rescued_idx)
    for i in dead_idx:
        prim = [r for r in out2[i] if not r.secondary_flag()]
        assert not prim, f"pair {i}: unalignable mate was 'rescued'"
        # ...and its aligned mate carries the mate-unmapped flag
        p1 = [r for r in out1[i] if not r.secondary_flag()]
        assert p1 and (p1[0].flag & 0x8)


def test_proper_pair_uses_inferred_bounds(tiny_aligner):
    aln = tiny_aligner
    seqs = [(s.name, s.seq) for s in FastqReader(f"{DATA}/tiny.fa")]
    r1, r2 = simulate_pairs(seqs, 48, read_len=100, dist=300,
                            stdev=20, seed=9)
    out1, out2, st = align_pairs(aln, [u.seq for u in r1],
                                 [u.seq for u in r2],
                                 [u.name for u in r1])
    ds = st.dirs[FR]
    assert not ds.failed
    n_proper = 0
    for recs1, recs2 in zip(out1, out2):
        p1 = [r for r in recs1 if not r.secondary_flag()]
        p2 = [r for r in recs2 if not r.secondary_flag()]
        if not p1 or not p2:
            continue
        from seqlib_tpu.align.pairing import _rb_2l
        d, dist = infer_dir(st.l_pac,
                            _rb_2l(p1[0], st.l_pac, aln._ann_offs),
                            _rb_2l(p2[0], st.l_pac, aln._ann_offs))
        want = (not st.dirs[d].failed
                and st.dirs[d].low <= dist <= st.dirs[d].high)
        assert p1[0].proper_pair() == want
        n_proper += want
    assert n_proper >= 40
