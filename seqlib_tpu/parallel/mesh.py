"""Device-mesh orchestration: data-parallel alignment over jax.sharding.

The reference is single-process (SURVEY.md §2.2); this module is the
TPU-native scale-out layer it never had: a 1-D mesh where read batches
are sharded across the ``dp`` axis, the FM-index replicated per device
(or per host for multi-host pods), and per-shard statistics merged with
``psum``/``all_gather`` collectives over ICI.

Multi-host model (BASELINE.md configs 4-5): one process per host, each
host feeds its local devices through ``ShardedAligner`` with
``jax.make_array_from_process_local_data``; the merged SAM stream is
written per-host and concatenated (records are independent), while
scaling stats ride the same psum path.
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


def sharded_seed_step(fm: DeviceFMIndex, mesh: Mesh,
                      max_seeds: int = 16, min_seed_len: int = 19):
    """pjit-ed data-parallel seed scan + psum'd stats.

    Returns fn(reads [B, L], lens [B]) -> (seeds dict, stats[2]) with B
    divisible by the mesh size.  The FM-index rides in as replicated
    captured state.
    """
    def step(reads, lens):
        seeds = collect_seeds(fm, reads, lens, max_seeds=max_seeds,
                              min_seed_len=min_seed_len)
        n_total = jax.lax.psum(jnp.sum(seeds["n_seeds"]), "dp")
        cov = jax.lax.psum(jnp.sum(seeds["qend"] - seeds["qbeg"]), "dp")
        return seeds, jnp.stack([n_total, cov])

    seed_specs = {k: P("dp", None) for k in
                  ("qbeg", "qend", "intv_l", "intv_sz")}
    seed_specs["n_seeds"] = P("dp")
    return jax.jit(jax.shard_map(
        step, mesh=mesh,
        in_specs=(P("dp", None), P("dp")),
        out_specs=(seed_specs, P()),
        check_vma=False,
    ))


def sharded_extend_step(mesh: Mesh, **sw_kwargs):
    """pjit-ed data-parallel batched extension (the DP hot kernel)."""
    def step(q, ql, t, tl, h0):
        out = extend_batch(q, ql, t, tl, h0, **sw_kwargs)
        total = jax.lax.psum(jnp.sum(out["score"]), "dp")
        return out, total

    out_specs = ({k: P("dp") for k in
                  ("score", "qle", "tle", "gscore", "gtle")}, P())
    return jax.jit(jax.shard_map(
        step, mesh=mesh,
        in_specs=(P("dp", None), P("dp"), P("dp", None), P("dp"), P("dp")),
        out_specs=out_specs,
        check_vma=False,
    ))


def shard_batch(mesh: Mesh, arrays: dict[str, np.ndarray]):
    """device_put a host batch with dp sharding on dim 0."""
    out = {}
    for k, v in arrays.items():
        spec = P("dp", *([None] * (v.ndim - 1)))
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out
