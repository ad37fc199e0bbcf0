"""Device-mesh orchestration: data-parallel alignment over jax.sharding.

The reference is single-process (SURVEY.md §2.2); this module is the
TPU-native scale-out layer it never had: a 1-D/2-D mesh where read
batches are sharded across the ``dp`` axis, the FM-index is replicated
per device (or host), and per-shard statistics merge with ``psum``
collectives over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fm import DeviceFMIndex, collect_seeds
from ..ops.sw import extend_batch


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def sharded_align_step(fm: DeviceFMIndex, mesh: Mesh,
                       max_seeds: int = 16, min_seed_len: int = 19):
    """Build a pjit-ed data-parallel seed+extend step.

    Returns fn(reads [B, L], lens [B]) -> dict of per-read outputs plus
    a psum-reduced stats vector.  B must divide by mesh size.
    """
    def step(fm, reads, lens):
        seeds = collect_seeds(fm, reads, lens, max_seeds=max_seeds,
                              min_seed_len=min_seed_len)
        # quick anchor extension: extend the longest seed's full read
        # against itself region — placeholder for stats; main pipeline
        # drives extension through BWAAligner.
        n_total = jax.lax.psum(jnp.sum(seeds["n_seeds"]), "dp")
        cov = jax.lax.psum(
            jnp.sum(seeds["qend"] - seeds["qbeg"]), "dp")
        return seeds, jnp.stack([n_total, cov])

    fn = jax.jit(jax.shard_map(
        functools.partial(step, fm),
        mesh=mesh,
        in_specs=(P("dp", None), P("dp")),
        out_specs=({k: P("dp", None) for k in
                    ("qbeg", "qend", "intv_l", "intv_sz")}
                   | {"n_seeds": P("dp")},
                   P()),
        check_vma=False,
    ))
    return fn
