"""Device k-mer pipeline (pack/canonical/count/lookup) parity with the
host BFC tables across k sizes (single- and double-word keys)."""

import numpy as np
import pytest

import jax.numpy as jnp

from seqlib_tpu.assembly.bfc import KmerTable, canonical_kmers
from seqlib_tpu.ops.kmer import (canonical_kmers_device,
                                 count_kmers_device, lookup_kmers_device)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    B, L = 24, 72
    reads = rng.integers(0, 4, (B, L)).astype(np.uint8)
    reads[3, 10] = 4  # N
    lens = np.full(B, L, np.int32)
    lens[5] = 40
    return reads, lens


@pytest.mark.parametrize("k", [15, 17, 25, 31])
def test_device_kmer_parity(batch, k):
    reads, lens = batch
    B, L = reads.shape
    chi, clo, valid = canonical_kmers_device(
        jnp.asarray(reads), jnp.asarray(lens), k)
    chi_n, clo_n, valid_n = map(np.asarray, (chi, clo, valid))
    dev64 = (chi_n.astype(np.uint64) << 32) \
        | (clo_n.astype(np.uint64) & 0xFFFFFFFF)
    for b in (0, 3, 5):
        hk = canonical_kmers(reads[b][:lens[b]], k)
        hvalid = hk != np.uint64(0xFFFFFFFFFFFFFFFF)
        n = lens[b] - k + 1
        assert np.array_equal(valid_n[b][:n], hvalid)
        assert np.array_equal(dev64[b][:n][hvalid], hk[hvalid])

    kh, kl, counts, nuniq = count_kmers_device(chi, clo, valid)
    allhost = np.concatenate(
        [canonical_kmers(reads[b][:lens[b]], k) for b in range(B)])
    ht = KmerTable(allhost)
    assert int(nuniq) == ht.keys.size

    got = np.asarray(lookup_kmers_device(kh, kl, counts, chi, clo))
    for b in (0, 3):
        n = lens[b] - k + 1
        hk = canonical_kmers(reads[b][:lens[b]], k)
        expect = ht.lookup(hk)
        hvalid = hk != np.uint64(0xFFFFFFFFFFFFFFFF)
        assert np.array_equal(got[b][:n][hvalid], expect[hvalid])
