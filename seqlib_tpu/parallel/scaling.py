"""Scaling-efficiency measurement over mesh sizes.

Runs the PRODUCTION data-parallel aligner stage — the same
shard_map-wrapped fused seed+chain+extend program BWAAligner uses when
constructed with a mesh (aligner._build_sharded_stages) — at mesh
sizes 1..n_devices and reports reads/s + parallel efficiency: the
scaling-efficiency report required by BASELINE.md config 5.

Round-1 history: this file used to time the standalone greedy
collect_seeds kernel; VERDICT r3 item 8 flagged the resulting
docs/SCALING_REPORT.md table as stale because the production aligner
had long moved to the fused SMEM pipeline.  Run as a module for a
fresh report:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m seqlib_tpu.parallel.scaling
"""

from __future__ import annotations

import time

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def measure_scaling(index, reads: np.ndarray, lens: np.ndarray,
                    sizes=None, iters: int = 3):
    """index: host FMIndex; reads [B, L] nt4 codes (B divisible by
    every mesh size).  Returns list of dicts:
    {n_devices, reads_per_s, efficiency}."""
    from ..align.aligner import BWAAligner
    devs = jax.devices()
    sizes = sizes or [s for s in (1, 2, 4, 8) if s <= len(devs)]
    out = []
    base = None
    lens32 = lens.astype(np.int32)
    for n in sizes:
        mesh = Mesh(np.array(devs[:n]), ("dp",))
        aln = BWAAligner(index, mesh=mesh)
        rj = jax.device_put(reads, NamedSharding(mesh, P("dp", None)))
        lj = jax.device_put(lens32, NamedSharding(mesh, P("dp")))
        jax.block_until_ready(aln._sh_fused(rj, lj))   # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(aln._sh_fused(rj, lj))
        dt = (time.perf_counter() - t0) / iters
        rps = reads.shape[0] / dt
        if base is None:
            base = rps
        out.append(dict(n_devices=n, reads_per_s=round(rps, 1),
                        efficiency=round(rps / (base * n), 3)))
    return out


def _main():
    import itertools
    import os
    if os.environ.get("JAX_PLATFORMS"):
        # the axon sitecustomize force-sets jax_platforms; honor the
        # caller's env choice for hermetic CPU-mesh runs
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from ..align.aligner import BWAAligner
    from ..index import FMIndex
    from ..io import FastqReader

    data = "/root/reference/tests/data"
    seqs = [(s.name, s.seq) for s in FastqReader(f"{data}/tiny.fa")]
    idx = FMIndex.construct(seqs)
    reads = [r.seq for r in FastqReader(f"{data}/sim1_bcr.fq")]
    B = 2048
    sel = list(itertools.islice(itertools.cycle(reads), B))
    aln = BWAAligner(idx)
    enc, lens = aln._encode_batch(sel)
    for row in measure_scaling(idx, enc, lens):
        print(row)


if __name__ == "__main__":
    _main()
