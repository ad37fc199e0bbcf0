"""Profile the seeding/extension stages on the real TPU.

Measures compile time + per-batch runtime of: collect_seeds,
smem_collect, seed_and_locate, seed_chain_extend, align_full, and the
host-side _hits_from_full — to locate the round-2 regression
(BENCH_r02: 7.1k reads/s, warmup 418 s).
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np
import jax
import jax.numpy as jnp

from seqlib_tpu.io.fastq import FastqReader
from seqlib_tpu.index import FMIndex
from seqlib_tpu.align import BWAAligner

data = "/root/reference/tests/data"
seqs = [(s.name, s.seq) for s in FastqReader(f"{data}/tiny.fa")]
idx = FMIndex.construct(seqs)
aln = BWAAligner(idx)
reads = list(FastqReader(f"{data}/sim1_bcr.fq"))

B = 2048
import itertools
rs = list(itertools.islice(itertools.cycle(reads), B))
enc, lens = aln._encode_batch([r.seq for r in rs])
enc_j = jnp.asarray(enc)
lens_j = jnp.asarray(lens.astype(np.int32))

from seqlib_tpu.ops.fm import collect_seeds, smem_collect
from seqlib_tpu.align.device_pipeline import seed_and_locate


def bench(name, fn, n=5):
    t0 = time.time()
    r = fn()
    flat = jax.tree_util.tree_leaves(r)
    np.asarray(flat[0])
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        r = fn()
    flat = jax.tree_util.tree_leaves(r)
    for x in flat:
        np.asarray(x)
    dt = (time.time() - t0) / n
    print(f"{name:30s} compile+1st {tc:7.2f}s   per-batch {dt*1000:8.2f} ms"
          f"  ({B/dt:8.0f} reads/s)")
    return dt


bench("collect_seeds", lambda: collect_seeds(aln.fm, enc_j, lens_j))
bench("smem_collect", lambda: smem_collect(aln.fm, enc_j, lens_j))
bench("seed_and_locate", lambda: seed_and_locate(aln.fm, enc_j, lens_j))
bench("seed_chain_extend(packed)",
      lambda: aln._dispatch_stage1(
          jnp.asarray(np.concatenate(
              [enc, lens.astype("<u4").view(np.uint8).reshape(-1, 4)],
              axis=1)[:, :enc.shape[1]]), lens_j)
      if False else aln._dispatch_stage1(enc_j, lens_j))
bench("align_full", lambda: aln._dispatch_full(enc, lens))

# host side
res = aln._dispatch_full(enc, lens)
res = [np.asarray(x) for x in res]
t0 = time.time()
for _ in range(3):
    hits = aln._hits_from_full(enc, lens, res)
dt = (time.time() - t0) / 3
print(f"{'host _hits_from_full':30s} {'':14s} per-batch {dt*1000:8.2f} ms")
t0 = time.time()
for _ in range(3):
    for b in range(B):
        aln._assemble_records(rs[b].seq, rs[b].name, hits[b], False, 0.9, 10)
dt = (time.time() - t0) / 3
print(f"{'host _assemble_records':30s} {'':14s} per-batch {dt*1000:8.2f} ms")
