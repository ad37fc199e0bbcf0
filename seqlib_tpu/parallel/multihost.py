"""Multi-host orchestration (BASELINE.md configs 4-5).

Design: single-controller-per-host JAX. Each host process
1. calls :func:`init_multihost` (jax.distributed),
2. builds/loads the SAME FMIndex (replicated per host — HBM-resident),
3. reads its shard of the input (``host_shard`` round-robins
   FASTQ/BAM batches by process index),
4. aligns through ``BWAAligner(mesh=local_mesh)`` over its local
   devices,
5. writes a per-host BAM part (records are independent; parts
   concatenate trivially or merge-sort by coordinate),
6. merges counters with :func:`allreduce_stats` over DCN.

There is nothing to synchronize inside a batch — reads/s scales
linearly except for input I/O skew; scaling efficiency is reported by
:mod:`seqlib_tpu.parallel.scaling`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed (no-op for single process).

    Returns (process_id, num_processes).
    """
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return jax.process_index(), jax.process_count()


def host_shard(items, process_id: int | None = None,
               num_processes: int | None = None):
    """This host's round-robin shard of an input list/iterator."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    for i, x in enumerate(items):
        if i % n == pid:
            yield x


def allreduce_stats(values: dict[str, float]) -> dict[str, float]:
    """Sum small host-level counters across processes (DCN psum).

    Each device carries its process's value divided by the local device
    count, sharded over a global mesh, so the psum yields exactly the
    per-process sum (a replicated psum would multiply by device count).
    """
    if jax.process_count() == 1:
        return dict(values)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    keys = sorted(values)
    nk = len(keys)
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    local = np.tile(
        np.asarray([float(values[k]) / n_local for k in keys],
                   dtype=np.float64), (n_local, 1))
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("all",))
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("all", None)), local, (n_global, nk))
    summed = jax.jit(jax.shard_map(
        lambda x: jax.lax.psum(x, "all"),
        mesh=mesh, in_specs=P("all", None),
        out_specs=P(), check_vma=False))(garr)
    res = np.asarray(jax.device_get(
        summed.addressable_data(0))).reshape(-1)[:nk]
    return {k: float(v) for k, v in zip(keys, res)}


def part_path(output: str, process_id: int | None = None) -> str:
    """Per-host output part name: out.bam -> out.part0003.bam."""
    pid = jax.process_index() if process_id is None else process_id
    if "." in output.split("/")[-1]:
        stem, ext = output.rsplit(".", 1)
        return f"{stem}.part{pid:04d}.{ext}"
    return f"{output}.part{pid:04d}"
