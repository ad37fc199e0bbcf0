"""Wide (hi/lo int34) SMEM machine + SA walk parity vs the int32 path.

The wide machine (ops/fm_wide.py) is the single-shard device path for
>2^31 texts; its rank algebra is pinned beyond 2^31 by
tests/test_fm_hilo.py.  Here the MACHINE (control flow, emission
rules, SA walk) is pinned: on any sub-2^31 index it must produce
bit-identical seeds/positions to the production int32 machine, which
is itself pinned by the brute-force oracle in tests/test_smem.py.
"""

import numpy as np
import pytest

from seqlib_tpu.core.seq import encode_nt4
from seqlib_tpu.index import FMIndex

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from seqlib_tpu.ops.fm import (DeviceFMIndex, sa_lookup,  # noqa: E402
                               smem_collect, smem_reseed)
from seqlib_tpu.ops.fm_hilo import (DeviceFMIndexHiLo,  # noqa: E402
                                    hl_join, hl_split)
from seqlib_tpu.ops.fm_wide import (sa_lookup_wide,  # noqa: E402
                                    smem_collect_wide, smem_reseed_wide)


def _mk_ref(seed, n, repeat=None):
    rng = np.random.default_rng(seed)
    s = "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    if repeat:
        unit, positions = repeat
        lst = list(s)
        for p in positions:
            lst[p:p + len(unit)] = unit
        s = "".join(lst)
    return s


def _reads_from(ref, rng, n_reads, L, mut=0.02):
    reads = []
    for _ in range(n_reads):
        p = int(rng.integers(0, len(ref) - L))
        s = list(ref[p:p + L])
        for j in range(L):
            if rng.random() < mut:
                s[j] = "ACGT"[int(rng.integers(0, 4))]
        if rng.random() < 0.3:   # occasional N
            s[int(rng.integers(0, L))] = "N"
        reads.append("".join(s))
    return reads


def _batchify(reads):
    L = max(len(r) for r in reads)
    enc = np.full((len(reads), L), 4, np.uint8)
    for i, r in enumerate(reads):
        enc[i, :len(r)] = encode_nt4(r)
    lens = np.array([len(r) for r in reads], np.int32)
    return jnp.asarray(enc), jnp.asarray(lens)


@pytest.fixture(scope="module", params=[3, 7])
def corpus(request):
    seed = request.param
    ref = _mk_ref(seed, 4000,
                  repeat=("ACGTACGTAC", [100, 900, 2200])
                  if seed == 7 else None)
    idx = FMIndex.construct([("r", ref)])
    rng = np.random.default_rng(seed + 1)
    reads = _reads_from(ref, rng, 48, 101)
    return idx, _batchify(reads)


def _both(idx):
    return DeviceFMIndex.from_host(idx), DeviceFMIndexHiLo.from_host(idx)


def test_collect_parity(corpus):
    idx, (reads, lens) = corpus
    fm32, fmw = _both(idx)
    a = smem_collect(fm32, reads, lens, max_seeds=16, min_seed_len=19)
    b = smem_collect_wide(fmw, reads, lens, max_seeds=16,
                          min_seed_len=19)
    np.testing.assert_array_equal(a["n_seeds"], b["n_seeds"])
    np.testing.assert_array_equal(a["qbeg"], b["qbeg"])
    np.testing.assert_array_equal(a["qend"], b["qend"])
    np.testing.assert_array_equal(a["intv_sz"], b["intv_sz"])
    np.testing.assert_array_equal(a["n_dropped"], b["n_dropped"])
    il_wide = hl_join(np.asarray(b["il_hi"]), np.asarray(b["il_lo"]))
    np.testing.assert_array_equal(np.asarray(a["intv_l"], np.int64),
                                  il_wide)


def test_collect_parity_with_p3(corpus):
    idx, (reads, lens) = corpus
    fm32, fmw = _both(idx)
    a = smem_collect(fm32, reads, lens, p3_seeds=8, p3_max_intv=20)
    b = smem_collect_wide(fmw, reads, lens, p3_seeds=8, p3_max_intv=20)
    for k in ("n_seeds", "qbeg", "qend", "intv_sz",
              "p3_n", "p3_qbeg", "p3_qend", "p3_intv_sz"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)
    np.testing.assert_array_equal(
        np.asarray(a["intv_l"], np.int64),
        hl_join(np.asarray(b["il_hi"]), np.asarray(b["il_lo"])))
    np.testing.assert_array_equal(
        np.asarray(a["p3_intv_l"], np.int64),
        hl_join(np.asarray(b["p3_il_hi"]), np.asarray(b["p3_il_lo"])))


def test_reseed_parity(corpus):
    idx, (reads, lens) = corpus
    fm32, fmw = _both(idx)
    a = smem_collect(fm32, reads, lens)
    # re-seed the longest seed of every read that has one
    B = reads.shape[0]
    bidx = np.arange(B)
    n = np.asarray(a["n_seeds"])
    slen = np.asarray(a["qend"]) - np.asarray(a["qbeg"])
    valid = np.arange(slen.shape[1])[None, :] < n[:, None]
    pick = np.argmax(np.where(valid, slen, -1), axis=1)
    act = valid[bidx, pick]
    qb = jnp.asarray(np.asarray(a["qbeg"])[bidx, pick])
    qe = jnp.asarray(np.asarray(a["qend"])[bidx, pick])
    occ = jnp.asarray(np.asarray(a["intv_sz"])[bidx, pick])
    r32 = smem_reseed(fm32, reads, lens, qb, qe, occ, jnp.asarray(act))
    rw = smem_reseed_wide(fmw, reads, lens, qb, qe, occ,
                          jnp.asarray(act))
    np.testing.assert_array_equal(np.asarray(r32[0]), np.asarray(rw[0]))
    np.testing.assert_array_equal(np.asarray(r32[1]), np.asarray(rw[1]))
    np.testing.assert_array_equal(
        np.asarray(r32[2], np.int64),
        hl_join(np.asarray(rw[2]), np.asarray(rw[3])))
    np.testing.assert_array_equal(np.asarray(r32[3]), np.asarray(rw[4]))


@pytest.mark.parametrize("from_disk", [False, True])
def test_sa_lookup_parity(tmp_path, corpus, from_disk):
    """Full-SA gather path (in-memory) and LF-walk path (disk reload,
    sampled SA interval 32) both match the int32 walk and the host."""
    idx, _ = corpus
    if from_disk:
        idx.write(str(tmp_path / "w"))
        idx = FMIndex.load(str(tmp_path / "w"))
    fm32, fmw = _both(idx)
    rng = np.random.default_rng(5)
    ranks = rng.integers(0, idx.seq_len + 1, 257).astype(np.int64)
    ranks[0] = 0
    ranks[1] = idx.seq_len
    ranks[2] = -1                     # invalid lane convention
    p32 = np.asarray(sa_lookup(fm32, jnp.asarray(ranks.astype(np.int32))))
    hi, lo = hl_split(ranks)
    hi[2] = -1
    ph, pl = sa_lookup_wide(fmw, jnp.asarray(hi), jnp.asarray(lo))
    pw = hl_join(np.asarray(ph), np.asarray(pl))
    pw[np.asarray(ph) < 0] = -1
    np.testing.assert_array_equal(p32.astype(np.int64), pw)
