"""hi/lo (int34) device rank arithmetic (docs/SHARDED_INDEX.md §1,
VERDICT r3 item 7).

Three layers of evidence:
1. the (hi, lo) scalar algebra against numpy int64 on values well
   beyond 2^31;
2. rank/bi-extension parity against the int32 device path on a real
   small index (bit-for-bit);
3. rank queries whose VALUES genuinely exceed 2^31 via the
   biased-checkpoint hook (rank'(c,k) = rank(c,k) + bias[c]), checked
   against the host int64 index — this is the arithmetic a >1 Gbp
   shard performs, exercised without building a 2 Gbp text in CI.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from seqlib_tpu.index import FMIndex
from seqlib_tpu.ops import fm as fm32
from seqlib_tpu.ops.fm_hilo import (DeviceFMIndexHiLo, backward_ext_hilo,
                                    bi_extend_back_hilo, device_index_for,
                                    hl_add, hl_add_small, hl_join, hl_lt,
                                    hl_le, hl_norm, hl_shift_right,
                                    hl_split, hl_sub, rank4_hilo,
                                    rank_hilo)

RNG = np.random.default_rng(17)


def test_hilo_scalar_algebra_vs_int64():
    a = RNG.integers(0, 1 << 34, 4096).astype(np.int64)
    b = RNG.integers(0, 1 << 34, 4096).astype(np.int64)
    s = RNG.integers(0, 1 << 30, 4096).astype(np.int64)
    ah, al = hl_split(a)
    bh, bl = hl_split(b)
    assert (hl_join(ah, al) == a).all()
    # add / add_small / sub / compares / shift
    rh, rl = hl_add(jnp.asarray(ah), jnp.asarray(al),
                    jnp.asarray(bh), jnp.asarray(bl))
    assert (hl_join(np.asarray(rh), np.asarray(rl)) == a + b).all()
    rh, rl = hl_add_small(jnp.asarray(ah), jnp.asarray(al),
                          jnp.asarray(s.astype(np.int32)))
    assert (hl_join(np.asarray(rh), np.asarray(rl)) == a + s).all()
    rh, rl = hl_sub(jnp.asarray(ah), jnp.asarray(al),
                    jnp.asarray(bh), jnp.asarray(bl))
    assert (hl_join(np.asarray(rh), np.asarray(rl)) == a - b).all()
    assert (np.asarray(hl_lt(jnp.asarray(ah), jnp.asarray(al),
                             jnp.asarray(bh), jnp.asarray(bl)))
            == (a < b)).all()
    assert (np.asarray(hl_le(jnp.asarray(ah), jnp.asarray(al),
                             jnp.asarray(bh), jnp.asarray(bl)))
            == (a <= b)).all()
    blk = np.asarray(hl_shift_right(jnp.asarray(ah), jnp.asarray(al), 7))
    assert (blk.astype(np.int64) == (a >> 7)).all()


@pytest.fixture(scope="module")
def small_index():
    g = "".join("ACGT"[c] for c in RNG.integers(0, 4, 20011))
    return FMIndex.construct([("hx", g)])


def _probe_ks(n, lim):
    ks = np.concatenate([
        np.arange(0, min(300, lim)),
        RNG.integers(0, lim, n),
        np.array([lim - 1, lim]),
    ]).astype(np.int64)
    return np.clip(ks, 0, lim)


def test_rank_parity_vs_int32_path(small_index):
    """Unbiased hi/lo rank must be bit-for-bit the int32 device rank."""
    idx = small_index
    d32 = fm32.DeviceFMIndex.from_host(idx)
    dhl = DeviceFMIndexHiLo.from_host(idx)
    ks = _probe_ks(2000, idx.seq_len)
    for c in range(4):
        want = np.asarray(fm32.rank(
            d32, jnp.full(ks.size, c, jnp.int32),
            jnp.asarray(ks.astype(np.int32))))
        hi, lo = hl_split(ks)
        gh, gl = rank_hilo(dhl, jnp.full(ks.size, c, jnp.int32),
                           jnp.asarray(hi), jnp.asarray(lo))
        got = hl_join(np.asarray(gh), np.asarray(gl))
        assert (got == want).all(), f"rank mismatch c={c}"
    # rank4 too
    hi, lo = hl_split(ks)
    gh, gl = rank4_hilo(dhl, jnp.asarray(hi), jnp.asarray(lo))
    want4 = np.asarray(fm32.rank4(d32, jnp.asarray(ks.astype(np.int32))))
    assert (hl_join(np.asarray(gh), np.asarray(gl)) == want4).all()


def test_rank_beyond_int32_vs_host_int64(small_index):
    """Biased checkpoints push rank values past 2^31; ground truth is
    the host int64 rank + bias."""
    idx = small_index
    bias = np.array([3 << 30, (1 << 32) + 5, 1 << 31, (1 << 33) + 7],
                    np.int64)
    dhl = DeviceFMIndexHiLo.from_host(idx, count_bias=bias)
    ks = _probe_ks(1000, idx.seq_len)
    d32 = fm32.DeviceFMIndex.from_host(idx)
    for c in range(4):
        base = np.asarray(fm32.rank(
            d32, jnp.full(ks.size, c, jnp.int32),
            jnp.asarray(ks.astype(np.int32)))).astype(np.int64)
        want = base + bias[c]
        assert (want >= (1 << 31)).any(), "bias failed to exceed int32"
        hi, lo = hl_split(ks)
        gh, gl = rank_hilo(dhl, jnp.full(ks.size, c, jnp.int32),
                           jnp.asarray(hi), jnp.asarray(lo))
        got = hl_join(np.asarray(gh), np.asarray(gl))
        assert (got == want).all(), f"biased rank mismatch c={c}"


def test_backward_ext_parity(small_index):
    idx = small_index
    d32 = fm32.DeviceFMIndex.from_host(idx)
    dhl = DeviceFMIndexHiLo.from_host(idx)
    n1 = idx.seq_len + 1
    l = RNG.integers(0, n1 - 1, 512).astype(np.int64)
    u = np.minimum(l + RNG.integers(1, 200, 512), n1).astype(np.int64)
    c = RNG.integers(0, 4, 512).astype(np.int32)
    wl, wu = fm32.backward_ext(d32, jnp.asarray(l.astype(np.int32)),
                               jnp.asarray(u.astype(np.int32)),
                               jnp.asarray(c))
    lh, ll = hl_split(l)
    uh, ul = hl_split(u)
    glh, gll, guh, gul = backward_ext_hilo(
        dhl, jnp.asarray(lh), jnp.asarray(ll), jnp.asarray(uh),
        jnp.asarray(ul), jnp.asarray(c))
    assert (hl_join(np.asarray(glh), np.asarray(gll))
            == np.asarray(wl).astype(np.int64)).all()
    assert (hl_join(np.asarray(guh), np.asarray(gul))
            == np.asarray(wu).astype(np.int64)).all()


def test_bi_extend_back_parity(small_index):
    idx = small_index
    d32 = fm32.DeviceFMIndex.from_host(idx)
    dhl = DeviceFMIndexHiLo.from_host(idx)
    n1 = idx.seq_len + 1
    k = RNG.integers(0, n1 - 1, 512).astype(np.int64)
    s = np.minimum(RNG.integers(1, 100, 512),
                   n1 - k).astype(np.int64)
    lv = RNG.integers(0, n1, 512).astype(np.int64)
    wk, wl, ws = fm32.bi_extend_back(
        d32, jnp.asarray(k.astype(np.int32)),
        jnp.asarray(lv.astype(np.int32)),
        jnp.asarray(s.astype(np.int32)))
    kh, kl = hl_split(k)
    lh, ll = hl_split(lv)
    sh, sl = hl_split(s)
    (gkh, gkl), (glh, gll), (gsh, gsl) = bi_extend_back_hilo(
        dhl, jnp.asarray(kh), jnp.asarray(kl), jnp.asarray(lh),
        jnp.asarray(ll), jnp.asarray(sh), jnp.asarray(sl))
    assert (hl_join(np.asarray(gkh), np.asarray(gkl))
            == np.asarray(wk).astype(np.int64)).all()
    assert (hl_join(np.asarray(glh), np.asarray(gll))
            == np.asarray(wl).astype(np.int64)).all()
    assert (hl_join(np.asarray(gsh), np.asarray(gsl))
            == np.asarray(ws).astype(np.int64)).all()


def test_transparent_factory(small_index):
    assert isinstance(device_index_for(small_index),
                      fm32.DeviceFMIndex)

    class _Big:
        """Duck-typed stand-in asserting only the SELECTION logic; a
        real >2^31 build is a bench_wg-scale (non-CI) operation."""
        seq_len = 2**31 + 128

    class _BigIdx(_Big):
        bwt_words = np.zeros((2, 8), np.uint32)
        cp_counts = np.zeros((3, 4), np.int64)
        sa_samples = np.zeros(2, np.int64)
        sa_full = None
        sa_intv = 32
        L2 = np.zeros(5, np.int64)
        primary = 1
        l_pac = 2**30 + 64

    big = device_index_for(_BigIdx())
    assert isinstance(big, DeviceFMIndexHiLo)
