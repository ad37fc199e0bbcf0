"""Scaling-efficiency measurement over mesh sizes.

Runs the device core (seed scan + extension) at mesh sizes
1..n_devices and reports reads/s + parallel efficiency — the
"scaling-efficiency report" required by BASELINE.md config 5.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fm import DeviceFMIndex, collect_seeds
from ..ops.sw import extend_batch


def measure_scaling(fm: DeviceFMIndex, reads: np.ndarray,
                    lens: np.ndarray, sizes=None, iters: int = 3):
    """reads [B, L] (B divisible by every mesh size).  Returns list of
    dicts: {n_devices, reads_per_s, efficiency}."""
    devs = jax.devices()
    sizes = sizes or [s for s in (1, 2, 4, 8) if s <= len(devs)]
    out = []
    base = None
    for n in sizes:
        mesh = Mesh(np.array(devs[:n]), ("dp",))
        fn = jax.jit(jax.shard_map(
            lambda r, l: collect_seeds(fm, r, l),
            mesh=mesh, in_specs=(P("dp", None), P("dp")),
            out_specs={k: P("dp", None) for k in
                       ("qbeg", "qend", "intv_l", "intv_sz")}
            | {"n_seeds": P("dp")},
            check_vma=False))
        rj = jax.device_put(reads, NamedSharding(mesh, P("dp", None)))
        lj = jax.device_put(lens.astype(np.int32),
                            NamedSharding(mesh, P("dp")))
        fn(rj, lj)["n_seeds"].block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            fn(rj, lj)["n_seeds"].block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        rps = reads.shape[0] / dt
        if base is None:
            base = rps
        out.append(dict(n_devices=n, reads_per_s=round(rps, 1),
                        efficiency=round(rps / (base * n), 3)))
    return out
