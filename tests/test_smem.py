"""Differential tests for bidirectional SMEM seeding (ops/fm.py
smem_collect / smem_reseed) against a brute-force oracle.

The oracle enumerates supermaximal exact matches directly on the 2L
text string: for each query start s, the longest e with q[s:e] a
substring of fwd+revcomp(reference); SMEMs are the distinct maxima not
contained in another.  This pins the semantics of bwa's ``bwt_smem1``
(/root/reference vendored bwa, submodule empty — SURVEY.md §0.1).
"""

import numpy as np
import pytest

from seqlib_tpu.core.seq import encode_nt4
from seqlib_tpu.index import FMIndex

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from seqlib_tpu.ops.fm import (DeviceFMIndex, backward_ext,  # noqa: E402
                               bi_extend_back, smem_collect, smem_reseed)

COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def _rc(s):
    return "".join(COMP[c] for c in reversed(s))


def _mk_ref(seed=11, n=3000, repeat=None):
    rng = np.random.default_rng(seed)
    s = "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    if repeat:
        unit, positions = repeat
        lst = list(s)
        for p in positions:
            lst[p:p + len(unit)] = unit
        s = "".join(lst)
    return s


def _brute_smems(text2l: str, q: str, min_len: int):
    """All SMEMs of q in text2l with length >= min_len, as
    {(s, e): n_occurrences}."""
    L = len(q)
    best_e = []
    for s in range(L):
        if q[s] not in "ACGT":
            best_e.append(s)          # empty
            continue
        e = s
        while e < L and q[s:e + 1] in text2l and "N" not in q[s:e + 1]:
            e += 1
        best_e.append(e)
    out = {}
    for s in range(L):
        e = best_e[s]
        if e - s < max(min_len, 1):
            continue
        contained = any(s2 <= s and best_e[s2] >= e
                        for s2 in range(s) if best_e[s2] > s2)
        if not contained and (s == 0 or best_e[s - 1] < e):
            # count overlapping occurrences
            n = start = 0
            while True:
                i = text2l.find(q[s:e], start)
                if i < 0:
                    break
                n += 1
                start = i + 1
            out[(s, e)] = n
    return out


def _device_index(ref: str) -> DeviceFMIndex:
    idx = FMIndex.construct([("c", ref)])
    return DeviceFMIndex.from_host(idx), idx


def _batchify(reads, L=None):
    L = L or max(len(r) for r in reads)
    B = len(reads)
    arr = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int64)
    for i, r in enumerate(reads):
        e = encode_nt4(r)
        arr[i, :e.size] = e
        lens[i] = e.size
    return jnp.asarray(arr), jnp.asarray(lens.astype(np.int32))


def test_bi_interval_invariant():
    """The rc-slot of a bi-interval equals the independently computed
    interval of the reverse complement pattern."""
    ref = _mk_ref(seed=3, n=2000)
    fm, idx = _device_index(ref)
    rng = np.random.default_rng(7)
    n1 = idx.seq_len + 1
    for _ in range(20):
        p = int(rng.integers(0, len(ref) - 25))
        pat = ref[p:p + int(rng.integers(5, 22))]
        # interval of pat by plain backward extension
        l = jnp.zeros((), jnp.int32)
        u = jnp.full((), n1, jnp.int32)
        for c in reversed(encode_nt4(pat)):
            l, u = backward_ext(fm, l, u, jnp.int32(c))
        # interval of rc(pat)
        l2 = jnp.zeros((), jnp.int32)
        u2 = jnp.full((), n1, jnp.int32)
        for c in reversed(encode_nt4(_rc(pat))):
            l2, u2 = backward_ext(fm, l2, u2, jnp.int32(c))
        assert int(u) - int(l) == int(u2) - int(l2)
        # bi-extension of pat[1:] backward by pat[0] must give
        # (interval(pat), interval(rc(pat)), size)
        lt = jnp.zeros((), jnp.int32)
        ut = jnp.full((), n1, jnp.int32)
        for c in reversed(encode_nt4(pat[1:])):
            lt, ut = backward_ext(fm, lt, ut, jnp.int32(c))
        lr = jnp.zeros((), jnp.int32)
        ur = jnp.full((), n1, jnp.int32)
        for c in reversed(encode_nt4(_rc(pat[1:]))):
            lr, ur = backward_ext(fm, lr, ur, jnp.int32(c))
        k4, l4, s4 = bi_extend_back(fm, lt, lr, ut - lt)
        a = int(encode_nt4(pat[0])[0])
        assert int(k4[a]) == int(l)
        assert int(s4[a]) == int(u) - int(l)
        assert int(l4[a]) == int(l2)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_smem_collect_matches_bruteforce(seed):
    ref = _mk_ref(seed=seed, n=2500,
                  repeat=("ACGTACGTGGCCAATTCCGGATCGATCG",
                          [100, 700, 1400, 2100]))
    text2l = ref + _rc(ref)
    fm, _ = _device_index(ref)
    rng = np.random.default_rng(seed + 50)
    reads = []
    for _ in range(12):
        p = int(rng.integers(0, len(ref) - 80))
        r = list(ref[p:p + 80])
        # 2 mutations to split SMEMs
        for _ in range(2):
            i = int(rng.integers(5, 75))
            r[i] = "ACGT"[(("ACGT".index(r[i])) + 1) % 4]
        reads.append("".join(r))
    # one read crossing the planted repeat and one with an N
    reads.append(ref[90:170])
    nread = list(ref[300:380])
    nread[40] = "N"
    reads.append("".join(nread))
    reads_j, lens_j = _batchify(reads)
    out = smem_collect(fm, reads_j, lens_j, max_seeds=32, min_seed_len=10)
    qb = np.asarray(out["qbeg"])
    qe = np.asarray(out["qend"])
    sz = np.asarray(out["intv_sz"])
    n = np.asarray(out["n_seeds"])
    for b, q in enumerate(reads):
        want = _brute_smems(text2l, q, 10)
        got = {(int(qb[b, j]), int(qe[b, j])): int(sz[b, j])
               for j in range(int(n[b]))}
        assert got == want, (b, q, sorted(got), sorted(want))


def test_smem_reseed_bidirectional():
    """A long seed whose repeat core sits mid-seed must re-seed to the
    FULL core (both directions from the midpoint), not just its left
    half."""
    core = "ACGTTGCAGGCCAATTCCGGATCGATGG"       # 28 bp repeat core
    rng = np.random.default_rng(9)
    parts = []
    for _ in range(3):
        parts.append("".join("ACGT"[i] for i in rng.integers(0, 4, 300)))
        parts.append(core)
    parts.append("".join("ACGT"[i] for i in rng.integers(0, 4, 300)))
    ref = "".join(parts)
    text2l = ref + _rc(ref)
    fm, _ = _device_index(ref)
    # the read covers core instance 0 with unique flanks -> one long
    # unique seed; its midpoint sits inside the core
    p = ref.find(core)
    read = ref[p - 20:p + len(core) + 20]
    reads_j, lens_j = _batchify([read])
    qb = jnp.asarray(np.array([0], np.int32))
    qe = jnp.asarray(np.array([len(read)], np.int32))
    occ = jnp.asarray(np.array([1], np.int32))
    act = jnp.asarray(np.array([True]))
    rqb, rqe, ril, rsz = smem_reseed(fm, reads_j, lens_j, qb, qe, occ, act,
                                     min_seed_len=10)
    rqb, rqe, rsz = int(rqb[0]), int(rqe[0]), int(rsz[0])
    # oracle: the longest match through the midpoint occurring >= 2
    # times is exactly the repeat core (3 forward-strand occurrences);
    # the backward-only round-1 reseed could only find its left half
    assert (rqb, rqe) == (20, 20 + len(core)), (rqb, rqe)
    n = start = 0
    while True:
        i = text2l.find(read[rqb:rqe], start)
        if i < 0:
            break
        n += 1
        start = i + 1
    assert rsz == n == 3


def _count_ov(text: str, pat: str) -> int:
    n = i = 0
    while True:
        j = text.find(pat, i)
        if j < 0:
            return n
        n += 1
        i = j + 1


def _brute_pass3(text2l: str, q: str, min_len: int, max_intv: int):
    """bwt_seed_strategy1 oracle: from each start x, extend until the
    occurrence count first drops below max_intv with i - x >= min_len
    (bwa's exact condition: emitted length is >= min_len + 1); emit if
    non-empty; restart at i + 1.  Returns [(qb, qe, n_occ)]."""
    L = len(q)
    out = []
    x = 0
    while x < L:
        if q[x] not in "ACGT":
            x += 1
            continue
        nxt = L
        for i in range(x + 1, L):
            if q[i] not in "ACGT":
                nxt = i + 1
                break
            n = _count_ov(text2l, q[x:i + 1])
            if n < max_intv and i - x >= min_len:
                if n > 0:
                    out.append((x, i + 1, n))
                nxt = i + 1
                break
        x = nxt
    return out


@pytest.mark.parametrize("seed,repeat", [
    (3, None),
    (4, ("ACGTACGTACGTACGTACGTACGT", [100, 700, 1400])),
    (5, ("TTAGGCATTAGGCATTAGGCA", [50, 51 + 400, 52 + 800, 53 + 1200])),
])
def test_seed_strategy_vs_oracle(seed, repeat):
    from seqlib_tpu.ops.fm import seed_strategy_collect
    ref = _mk_ref(seed=seed, n=2500, repeat=repeat)
    text2l = ref + _rc(ref)
    idx = FMIndex.construct([("r", ref)])
    fm = DeviceFMIndex.from_host(idx)
    rng = np.random.default_rng(seed + 100)
    reads = []
    for _ in range(12):
        p = int(rng.integers(0, len(ref) - 130))
        r = list(ref[p:p + 130])
        for m in range(int(rng.integers(0, 4))):
            j = int(rng.integers(0, 130))
            r[j] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(r))
    L = max(len(r) for r in reads)
    enc = np.full((len(reads), L), 4, np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        e = encode_nt4(r)
        enc[i, :len(e)] = e
        lens[i] = len(e)
    got = seed_strategy_collect(fm, jnp.asarray(enc), jnp.asarray(lens),
                                max_seeds=8, min_seed_len=19,
                                max_intv=20)
    qb = np.asarray(got["qbeg"]); qe = np.asarray(got["qend"])
    il = np.asarray(got["intv_l"]); sz = np.asarray(got["intv_sz"])
    ns = np.asarray(got["n_seeds"])
    for b, r in enumerate(reads):
        exp = _brute_pass3(text2l, r, 19, 20)[:8]
        have = [(int(qb[b, j]), int(qe[b, j]), int(sz[b, j]))
                for j in range(int(ns[b]))]
        assert have == exp, (b, have, exp)
        # every emitted interval must locate to true occurrences
        for j in range(int(ns[b])):
            pat = r[qb[b, j]:qe[b, j]]
            assert _count_ov(text2l, pat) == int(sz[b, j])


def test_fused_p3_matches_standalone():
    """smem_collect(p3_seeds=8) must produce (a) the identical SMEM
    seed set as the plain call and (b) the identical pass-3 seed set
    as the standalone seed_strategy_collect machine."""
    from seqlib_tpu.ops.fm import seed_strategy_collect
    ref = _mk_ref(seed=7, n=2500,
                  repeat=("ACGTACGTACGTACGTACGTACGT", [150, 900, 1700]))
    idx = FMIndex.construct([("r", ref)])
    fm = DeviceFMIndex.from_host(idx)
    rng = np.random.default_rng(8)
    reads = []
    for _ in range(16):
        p = int(rng.integers(0, len(ref) - 130))
        r = list(ref[p:p + 130])
        for m in range(int(rng.integers(0, 4))):
            j = int(rng.integers(0, 130))
            r[j] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(r))
    L = max(len(r) for r in reads)
    enc = np.full((len(reads), L), 4, np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        e = encode_nt4(r)
        enc[i, :len(e)] = e
        lens[i] = len(e)
    encj, lensj = jnp.asarray(enc), jnp.asarray(lens)
    plain = smem_collect(fm, encj, lensj)
    fused = smem_collect(fm, encj, lensj, p3_seeds=8)
    solo = seed_strategy_collect(fm, encj, lensj, max_seeds=8)
    for k in ("qbeg", "qend", "intv_l", "intv_sz", "n_seeds"):
        assert np.array_equal(np.asarray(plain[k]), np.asarray(fused[k])), k
    for a, b in (("p3_qbeg", "qbeg"), ("p3_qend", "qend"),
                 ("p3_intv_l", "intv_l"), ("p3_intv_sz", "intv_sz"),
                 ("p3_n", "n_seeds")):
        assert np.array_equal(np.asarray(fused[a]), np.asarray(solo[b])), a
