"""Wide stage-1 pipeline parity vs the int32 pipeline.

On any sub-2^31 index the wide path (hi/lo positions + packed 2-bit
text gathers) must produce bit-identical chains/extensions to the
production int32 path; >2^31 behaviour is exercised at scale by
bench_wg.py (the rank algebra itself is pinned beyond 2^31 by
tests/test_fm_hilo.py).
"""

import numpy as np
import pytest

from seqlib_tpu.core.seq import encode_nt4
from seqlib_tpu.index import FMIndex
from seqlib_tpu.index.pack import both_strands

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from seqlib_tpu.align.device_pipeline import (  # noqa: E402
    seed_and_locate, seed_chain_extend_packed, unpack_stage1)
from seqlib_tpu.align.device_pipeline_wide import (  # noqa: E402
    pack_text_2bit, seed_and_locate_wide, seed_chain_extend_packed_wide,
    unpack_stage1_wide)
from seqlib_tpu.ops.fm import DeviceFMIndex  # noqa: E402
from seqlib_tpu.ops.fm_hilo import DeviceFMIndexHiLo, hl_join  # noqa: E402


def _mk_ref(seed, n):
    rng = np.random.default_rng(seed)
    s = "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    # plant a duplicated segment so multi-chain / XA paths engage
    return s[:n // 2] + s[1000:1400] + s[n // 2:]


@pytest.fixture(scope="module")
def setup():
    ref = _mk_ref(5, 6000)
    idx = FMIndex.construct([("r", ref)])
    rng = np.random.default_rng(6)
    L = 101
    reads = []
    for _ in range(64):
        p = int(rng.integers(0, len(ref) - L))
        s = list(ref[p:p + L])
        for j in range(L):
            if rng.random() < 0.03:
                s[j] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(s))
    enc = np.stack([encode_nt4(r) for r in reads])
    lens = np.full(len(reads), L, np.int32)
    return idx, jnp.asarray(enc), jnp.asarray(lens)


def test_pack_text_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 1003).astype(np.uint8)
    w = pack_text_2bit(codes)
    got = np.empty(1003, np.uint8)
    for i in range(1003):
        got[i] = (w[i // 16] >> (2 * (15 - i % 16))) & 3
    np.testing.assert_array_equal(got, codes)


def test_seed_and_locate_parity(setup):
    idx, reads, lens = setup
    a = seed_and_locate(DeviceFMIndex.from_host(idx), reads, lens)
    b = seed_and_locate_wide(DeviceFMIndexHiLo.from_host(idx),
                             reads, lens)
    for k in ("qbeg", "qend", "rep_cov", "occ_clip", "seeds_full"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)
    pos32 = np.asarray(a["pos"], np.int64)
    posw = hl_join(np.asarray(b["pos_h"]), np.asarray(b["pos_l"]))
    posw[np.asarray(b["pos_h"]) < 0] = -1
    np.testing.assert_array_equal(pos32, posw)


def test_fused_stage1_parity(setup):
    idx, reads, lens = setup
    text = both_strands(idx.ref.codes)
    a = unpack_stage1(np.asarray(seed_chain_extend_packed(
        DeviceFMIndex.from_host(idx), jnp.asarray(text), reads, lens,
        l_pac=idx.l_pac)), 7)
    b = unpack_stage1_wide(np.asarray(seed_chain_extend_packed_wide(
        DeviceFMIndexHiLo.from_host(idx),
        jnp.asarray(pack_text_2bit(text)), reads, lens,
        l_pac=idx.l_pac)), 7)
    assert set(a) == set(b)
    for k in sorted(a):
        np.testing.assert_array_equal(
            np.asarray(a[k]).astype(np.int64),
            np.asarray(b[k]).astype(np.int64), err_msg=k)
