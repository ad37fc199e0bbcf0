"""Device-op tests (CPU backend): FM rank/extension/seeding/SA-lookup
parity vs the host FMIndex, and SW kernels vs brute-force numpy DP.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from seqlib_tpu.core.seq import encode_nt4
from seqlib_tpu.index import FMIndex
from seqlib_tpu.io.fastq import FastqReader
from seqlib_tpu.ops.fm import (DeviceFMIndex, backward_ext, collect_seeds,
                               rank, sa_lookup)
from seqlib_tpu.ops.sw import (NEG, cigar_from_dirs, extend_batch,
                               global_batch)


@pytest.fixture(scope="module")
def tiny():
    seqs = [(s.name, s.seq)
            for s in FastqReader("/root/reference/tests/data/tiny.fa")]
    idx = FMIndex.construct(seqs)
    fm = DeviceFMIndex.from_host(idx)
    cat = "".join(s for _, s in seqs)
    return idx, fm, cat


def test_rank_parity(tiny):
    idx, fm, _ = tiny
    rng = np.random.default_rng(0)
    ks = rng.integers(0, idx.seq_len + 1, 100)
    for c in range(4):
        dev = np.asarray(rank(fm, jnp.full(100, c, jnp.int32),
                              jnp.asarray(ks, jnp.int32)))
        assert np.array_equal(dev, idx.rank(c, ks))


def test_backward_ext_parity(tiny):
    idx, fm, cat = tiny
    pat = encode_nt4(cat[3000:3040])
    l, u = 0, idx.seq_len + 1
    for c in pat[::-1]:
        ll, uu = backward_ext(fm, jnp.int32(l), jnp.int32(u),
                              jnp.int32(int(c)))
        l, u = int(ll), int(uu)
    assert (l, u) == idx.search(pat)


def test_sa_lookup_parity(tiny):
    idx, fm, cat = tiny
    l, u = idx.search(encode_nt4(cat[3000:3040]))
    ranks = np.arange(l, u)
    dev = list(np.asarray(sa_lookup(fm, jnp.asarray(ranks, jnp.int32))))
    assert dev == [idx.sa_lookup(r) for r in ranks]


def test_collect_seeds_finds_segments(tiny):
    idx, fm, cat = tiny
    rng = np.random.default_rng(1)
    L = 150
    reads, poss = [], []
    while len(reads) < 4:
        p = int(rng.integers(0, len(cat) - L))
        s = cat[p:p + L]
        if "N" in s:
            continue
        arr = list(s)
        arr[70] = "ACGT"[("ACGT".index(arr[70]) + 1) % 4]
        reads.append("".join(arr))
        poss.append(p)
    B = len(reads)
    enc = np.full((B, L), 4, np.uint8)
    for i, s in enumerate(reads):
        enc[i] = encode_nt4(s)
    out = collect_seeds(fm, jnp.asarray(enc),
                        jnp.asarray(np.full(B, L, np.int32)))
    out = {k: np.asarray(v) for k, v in out.items()}
    for i in range(B):
        n = out["n_seeds"][i]
        assert n >= 2
        segs = {(out["qbeg"][i, j], out["qend"][i, j]) for j in range(n)}
        assert (0, 70) in segs
        assert (71, 150) in segs
        # every reported interval must match host search
        for j in range(n):
            qb, qe = out["qbeg"][i, j], out["qend"][i, j]
            hl, hu = idx.search(enc[i][qb:qe])
            assert hu - hl == out["intv_sz"][i, j]
            assert hl == out["intv_l"][i, j]


# -- SW ---------------------------------------------------------------------

def _ref_extend(q, t, h0, od=6, ed=1, oi=6, ei=1, ma=1, mi=4):
    Lq, Lt = len(q), len(t)
    H = np.full((Lq + 1, Lt + 1), NEG, dtype=np.int64)
    E = np.full_like(H, NEG)
    F = np.full_like(H, NEG)
    H[0, 0] = h0
    for j in range(1, Lt + 1):
        v = h0 - od - ed * j
        H[0, j] = v if v >= 0 else NEG
    for i in range(1, Lq + 1):
        H[i, 0] = h0 - oi - ei * i
        for j in range(1, Lt + 1):
            E[i, j] = max(H[i, j - 1] - od - ed, E[i, j - 1] - ed)
            F[i, j] = max(H[i - 1, j] - oi - ei, F[i - 1, j] - ei)
            s = ma if (q[i - 1] == t[j - 1] and q[i - 1] < 4) else -mi
            H[i, j] = max(H[i - 1, j - 1] + s, E[i, j], F[i, j])
    best = H[1:, 1:].max()
    return best, H[Lq].max()


def _ref_global(q, t, od=6, ed=1, oi=6, ei=1, ma=1, mi=4):
    Lq, Lt = len(q), len(t)
    BIG = -10**9
    H = np.full((Lq + 1, Lt + 1), BIG, np.int64)
    E = np.full_like(H, BIG)
    F = np.full_like(H, BIG)
    H[0, 0] = 0
    for j in range(1, Lt + 1):
        H[0, j] = -od - ed * j
    for i in range(1, Lq + 1):
        H[i, 0] = -oi - ei * i
        for j in range(1, Lt + 1):
            E[i, j] = max(H[i, j - 1] - od - ed, E[i, j - 1] - ed)
            F[i, j] = max(H[i - 1, j] - oi - ei, F[i - 1, j] - ei)
            s = ma if (q[i - 1] == t[j - 1] and q[i - 1] < 4) else -mi
            H[i, j] = max(H[i - 1, j - 1] + s, E[i, j], F[i, j])
    return H[Lq, Lt]


@pytest.fixture(scope="module")
def sw_pairs():
    rng = np.random.default_rng(3)
    B, Lq, Lt = 8, 40, 60
    qs = rng.integers(0, 4, (B, Lq)).astype(np.int8)
    ts = np.zeros((B, Lt), np.int8)
    for b in range(B):
        ts[b, :Lq] = qs[b]
        for _ in range(3):
            p = rng.integers(0, Lq)
            ts[b, p] = (ts[b, p] + 1) % 4
        ts[b, Lq:] = rng.integers(0, 4, Lt - Lq)
    return qs, ts


def test_extend_batch_vs_bruteforce(sw_pairs):
    qs, ts = sw_pairs
    B, Lq = qs.shape
    Lt = ts.shape[1]
    out = extend_batch(jnp.asarray(qs), jnp.full(B, Lq, jnp.int32),
                       jnp.asarray(ts), jnp.full(B, Lt, jnp.int32),
                       jnp.full(B, 30, jnp.int32))
    out = {k: np.asarray(v) for k, v in out.items()}
    for b in range(B):
        score, gscore = _ref_extend(qs[b], ts[b], 30)
        assert out["score"][b] == score
        assert out["gscore"][b] == gscore


def test_global_batch_and_traceback(sw_pairs):
    qs, ts = sw_pairs
    B, Lq = qs.shape
    t2 = ts[:, :Lq + 5]
    score, dirs = global_batch(jnp.asarray(qs), jnp.full(B, Lq, jnp.int32),
                               jnp.asarray(t2),
                               jnp.full(B, Lq + 5, jnp.int32))
    score = np.asarray(score)
    dirs = np.asarray(dirs)
    for b in range(B):
        exp = _ref_global(qs[b], t2[b])
        assert score[b] == exp
        cig = cigar_from_dirs(dirs[b], Lq, Lq + 5)
        qc = sum(l for op, l in cig if op in "MI")
        tc = sum(l for op, l in cig if op in "MD")
        assert qc == Lq and tc == Lq + 5
        # CIGAR must reproduce the optimal score
        sc = qi = ti = 0
        for op, ln in cig:
            if op == "M":
                for _ in range(ln):
                    sc += 1 if qs[b][qi] == t2[b][ti] else -4
                    qi += 1
                    ti += 1
            elif op == "I":
                sc -= 6 + ln
                qi += ln
            else:
                sc -= 6 + ln
                ti += ln
        assert sc == exp


def test_extend_variable_lengths(sw_pairs):
    """Padded lanes with shorter qlen/tlen must be handled."""
    qs, ts = sw_pairs
    B, Lq = qs.shape
    Lt = ts.shape[1]
    qlen = np.full(B, Lq, np.int32)
    tlen = np.full(B, Lt, np.int32)
    qlen[0] = 25
    tlen[1] = 30
    out = extend_batch(jnp.asarray(qs), jnp.asarray(qlen),
                       jnp.asarray(ts), jnp.asarray(tlen),
                       jnp.full(B, 30, jnp.int32))
    out = {k: np.asarray(v) for k, v in out.items()}
    s0, g0 = _ref_extend(qs[0][:25], ts[0], 30)
    assert out["score"][0] == s0 and out["gscore"][0] == g0
    s1, g1 = _ref_extend(qs[1], ts[1][:30], 30)
    assert out["score"][1] == s1 and out["gscore"][1] == g1


# -- Pallas kernel (interpret mode on CPU) ----------------------------------

def test_pallas_extend_matches_xla(sw_pairs):
    import jax.numpy as jnp
    from seqlib_tpu.ops.sw_pallas import extend_batch_pallas
    qs, ts = sw_pairs
    B, Lq = qs.shape
    Lt = ts.shape[1]
    ql = np.full(B, Lq, np.int32)
    tl = np.full(B, Lt, np.int32)
    ql[0] = 25
    tl[1] = 30
    h0 = np.full(B, 30, np.int32)
    ref = extend_batch(jnp.asarray(qs), jnp.asarray(ql),
                       jnp.asarray(ts), jnp.asarray(tl), jnp.asarray(h0))
    got = extend_batch_pallas(jnp.asarray(qs), jnp.asarray(ql),
                              jnp.asarray(ts), jnp.asarray(tl),
                              jnp.asarray(h0), interpret=True)
    for k in ref:
        assert np.array_equal(np.asarray(ref[k]), np.asarray(got[k])), k


def test_reseed_scan_finds_repeat_core(tiny):
    """bwa-style re-seeding: a long unique seed hiding a repetitive
    core yields an extra seed with >1 occurrences at alternate loci."""
    import numpy as np
    from seqlib_tpu.align.device_pipeline import seed_and_locate
    from seqlib_tpu.index import FMIndex
    from seqlib_tpu.ops.fm import DeviceFMIndex
    rng = np.random.default_rng(4)

    def rand(n):
        return "".join("ACGT"[i] for i in rng.integers(0, 4, n))

    X = rand(90)
    U = [rand(300) for _ in range(4)]
    ref = U[0] + X + U[1] + X + U[2] + X + U[3]
    idx = FMIndex.construct([("r", ref)])
    fm = DeviceFMIndex.from_host(idx)
    read = ref[280:280 + 130]      # 20bp flank + 90bp repeat + 20bp flank
    enc = np.full((8, 160), 4, np.uint8)
    enc[0, :130] = encode_nt4(read)
    lens = np.zeros(8, np.int32)
    lens[0] = 130
    out = seed_and_locate(fm, jnp.asarray(enc), jnp.asarray(lens))
    out = {k: np.asarray(v) for k, v in out.items()}
    # extra (re-seed) column sits right after the max_seeds SMEM
    # columns (pass-3 tiling columns follow it)
    RS = 16
    qb2, qe2 = out["qbeg"][0, RS], out["qend"][0, RS]
    assert qe2 - qb2 >= 19
    pos2 = out["pos"][0, RS]
    pos2 = pos2[pos2 >= 0]
    assert pos2.size >= 2          # primary + at least one alt locus
    # one occurrence at the primary locus, one elsewhere
    assert (np.abs(pos2 - (280 + qb2)) <= 1).any()
    assert (np.abs(pos2 - (280 + qb2)) > 100).any()


def test_chain_device_matches_host():
    """Device chaining (chain_device) reproduces the host reference
    chainer (align.chain.chain_batch) on randomized seed sets: same
    kept chains per read (anchor tuple + weight), including drop_ratio
    filtering, top-C capping, and midpoint-crossing exclusion."""
    import numpy as np
    from seqlib_tpu.align.chain import chain_batch
    from seqlib_tpu.align.device_pipeline import chain_device
    rng = np.random.default_rng(7)
    B, S, K = 16, 9, 8
    l_pac = 5000
    for trial in range(6):
        qb = rng.integers(0, 100, (B, S)).astype(np.int32)
        qe = qb + rng.integers(19, 60, (B, S)).astype(np.int32)
        pos = rng.integers(-1, 2 * l_pac - 80, (B, S, K)).astype(np.int32)
        # sprinkle clustered colinear occurrences so real chains form
        for b in range(B):
            base = int(rng.integers(0, l_pac - 500))
            for s in range(S // 2):
                pos[b, s, 0] = base + int(qb[b, s])
                pos[b, s, 1] = base + int(qb[b, s]) + int(
                    rng.integers(0, 30))
        drop = [0.5, 0.4][trial % 2]
        dev = {k: np.asarray(v) for k, v in chain_device(
            jnp.asarray(qb), jnp.asarray(qe), jnp.asarray(pos),
            l_pac, band=100, max_chain_gap=10000, drop_ratio=drop,
            max_chains=4).items()}
        qb3 = np.broadcast_to(qb[:, :, None], pos.shape)
        qe3 = np.broadcast_to(qe[:, :, None], pos.shape)
        sl3 = qe3 - qb3
        valid = (pos >= 0) & ~((pos < l_pac) & (pos + sl3 > l_pac))
        ridx, sidx, kidx = np.nonzero(valid)
        host = chain_batch(
            ridx.astype(np.int64), qb3[ridx, sidx, kidx].astype(np.int64),
            qe3[ridx, sidx, kidx].astype(np.int64),
            pos[ridx, sidx, kidx].astype(np.int64),
            l_pac, band=100, max_chain_gap=10000, drop_ratio=drop,
            max_chains=4)
        for b in range(B):
            h = {(int(host["anchor_q"][m]), int(host["anchor_len"][m]),
                  int(host["anchor_r"][m]), int(host["weight"][m]))
                 for m in np.flatnonzero(host["read"] == b)}
            d = {(int(dev["anchor_q"][b, c]), int(dev["anchor_len"][b, c]),
                  int(dev["anchor_r"][b, c]), int(dev["weight"][b, c]))
                 for c in np.flatnonzero(dev["keep"][b])}
            assert d == h, f"trial {trial} read {b}: {d} != {h}"


def test_extend_zdrop_stops_dead_extension():
    """ksw_extend's row-loop break (enabled when zdrop > 0): once a row
    has no positive cell (m == 0) the extension gives up — a lucky
    re-match far past a long divergence desert must NOT be glued on,
    even if the unrestricted DP could revive through zero-score cells.
    Construction: 40 bp match, 50 bp desert (every base mismatching),
    150 bp match; the revived global path scores 88 but bwa breaks
    inside the desert."""
    import numpy as np
    rng = np.random.default_rng(11)
    tgt = rng.integers(0, 4, (1, 240)).astype(np.uint8)
    q = tgt.copy()
    d = rng.integers(0, 4, 50)
    q[0, 40:90] = (tgt[0, 40:90] + 1 + (d % 3)) % 4   # all-mismatch desert
    ql = jnp.full(1, 240, jnp.int32)
    tl = jnp.full(1, 240, jnp.int32)
    h0 = jnp.full(1, 10, jnp.int32)
    free = extend_batch(jnp.asarray(q), ql, jnp.asarray(tgt), tl, h0,
                        zdrop=0)
    z = extend_batch(jnp.asarray(q), ql, jnp.asarray(tgt), tl, h0,
                     zdrop=100)
    # with the break: local best = the first 40 matches; without it,
    # the unrestricted DP revives through zero-score desert cells and
    # glues the 150 bp tail on
    assert int(z["score"][0]) == 10 + 40
    assert int(z["qle"][0]) == 40 and int(z["tle"][0]) == 40
    assert int(free["score"][0]) > 10 + 40
    assert int(z["gscore"][0]) <= 0 < int(free["gscore"][0])


def test_extend_zdrop_zero_disables():
    import numpy as np
    rng = np.random.default_rng(3)
    q = rng.integers(0, 4, (4, 32)).astype(np.uint8)
    t = q.copy()
    out0 = extend_batch(jnp.asarray(q), jnp.full(4, 32, jnp.int32),
                        jnp.asarray(t), jnp.full(4, 32, jnp.int32),
                        jnp.ones(4, jnp.int32))
    outz = extend_batch(jnp.asarray(q), jnp.full(4, 32, jnp.int32),
                        jnp.asarray(t), jnp.full(4, 32, jnp.int32),
                        jnp.ones(4, jnp.int32), zdrop=100)
    for k in ("score", "qle", "tle", "gscore", "gtle"):
        assert (np.asarray(out0[k]) == np.asarray(outz[k])).all()


def test_pallas_extend_zdrop_parity(sw_pairs):
    """v2 kernel matches extend_batch's zdrop lane freezing exactly."""
    import jax.numpy as jnp
    from seqlib_tpu.ops.sw_pallas import extend_batch_pallas
    rng = np.random.default_rng(5)
    B, Lq, Lt = 96, 120, 140
    qs = rng.integers(0, 4, (B, Lq)).astype(np.int8)
    ts = rng.integers(0, 4, (B, Lt)).astype(np.int8)
    for i in range(0, B, 2):
        ts[i, :Lq] = qs[i]
        ts[i, 40:90] = (ts[i, 40:90] + 1) % 4     # mid-desert
    ql = np.full(B, Lq, np.int32)
    tl = np.full(B, Lt, np.int32)
    h0 = np.full(B, 12, np.int32)
    ref = extend_batch(jnp.asarray(qs), jnp.asarray(ql), jnp.asarray(ts),
                       jnp.asarray(tl), jnp.asarray(h0), zdrop=100)
    got = extend_batch_pallas(jnp.asarray(qs), jnp.asarray(ql),
                              jnp.asarray(ts), jnp.asarray(tl),
                              jnp.asarray(h0), zdrop=100, interpret=True)
    for k in ref:
        r, g = np.asarray(ref[k]), np.asarray(got[k])
        if k == "gscore":   # NEG sentinels compare as "both dead"
            dead = (r < -16000) & (g < -16000)
            assert ((r == g) | dead).all()
        else:
            assert np.array_equal(r, g), k
