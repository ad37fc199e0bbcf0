"""Cross-check of the two SMEM machine implementations.

The Pallas single-kernel-per-step machine (ops/fm_pallas.py) must be
bit-identical to the XLA machine (ops/fm._smem_machine) — both claim
bwa bwt_smem1 semantics and both feed the production seeder.  Runs
only where Mosaic compiles (TPU); the XLA machine itself is pinned to
the brute-force oracle in test_smem.py on every backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqlib_tpu.index import FMIndex
from seqlib_tpu.io import FastqReader
from seqlib_tpu.ops import fm as FM

DATA = "/root/reference/tests/data"


def _cross_check(n_reads: int, interpret: bool):
    from seqlib_tpu.ops.fm_pallas import smem_machine_pallas
    seqs = [(s.name, s.seq) for s in FastqReader(f"{DATA}/tiny.fa")]
    idx = FMIndex.construct(seqs)
    fm = FM.DeviceFMIndex.from_host(idx)
    reads = [r.seq
             for r in FastqReader(f"{DATA}/sim1_bcr.fq")][:n_reads]
    L = max(len(s) for s in reads)
    enc = np.full((len(reads), L), 4, np.uint8)
    lens = np.zeros(len(reads), np.int32)
    from seqlib_tpu.core.seq import encode_nt4
    for i, s in enumerate(reads):
        e = encode_nt4(s)
        enc[i, :len(e)] = e
        lens[i] = len(e)
    encj, lensj = jnp.asarray(enc), jnp.asarray(lens)
    B = len(reads)
    kw = dict(x0=jnp.zeros(B, jnp.int32),
              min_intv=jnp.ones(B, jnp.int32),
              active=lensj > 0, max_seeds=16, min_seed_len=19, C=8,
              max_rounds=L, step_cap=4 * L + 16)
    a = FM._smem_machine(fm, encj, lensj, **kw)
    b = smem_machine_pallas(fm, encj, lensj, interpret=interpret,
                            **kw)
    for k in a:
        assert np.array_equal(np.asarray(a[k]), np.asarray(b[k])), k


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="Mosaic-compiled run needs a TPU backend")
def test_pallas_machine_matches_xla_machine():
    _cross_check(512, interpret=False)


def test_pallas_machine_matches_xla_machine_interpret():
    """Same bit-identity cross-check through the Pallas INTERPRETER —
    runs on the CPU mesh, so CI sees the kernel's semantics without
    hardware (VERDICT r3 item 9: this was the suite's only skip)."""
    _cross_check(96, interpret=True)
