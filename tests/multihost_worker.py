"""Worker for the 2-process multi-host test (run via subprocess).

Each process: init jax.distributed, build the same tiny index, align
its host shard of reads on a LOCAL device mesh, write a part file,
then allreduce record counts over the global (cross-process) mesh.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coord, pid, nproc, outdir = sys.argv[1:5]
    pid, nproc = int(pid), int(nproc)
    from seqlib_tpu.parallel.multihost import (allreduce_stats, host_shard,
                                               init_multihost, part_path)
    init_multihost(coord, nproc, pid)
    assert jax.process_count() == nproc

    import numpy as np
    from jax.sharding import Mesh
    from seqlib_tpu.align import BWAAligner
    from seqlib_tpu.index import FMIndex
    from seqlib_tpu.io import BamWriter, FastqReader

    seqs = [(s.name, s.seq)
            for s in FastqReader("/root/reference/tests/data/tiny.fa")]
    idx = FMIndex.construct(seqs)      # replicated per host
    local_mesh = Mesh(np.array(jax.local_devices()), ("dp",))
    aln = BWAAligner(idx, mesh=local_mesh)

    reads = list(FastqReader("/root/reference/tests/data/sim1_bcr.fq"))[:64]
    mine = list(host_shard(reads, pid, nproc))
    results = aln.align_batch([r.seq for r in mine],
                              [r.name for r in mine])
    n_records = sum(len(rs) for rs in results)

    out = part_path(os.path.join(outdir, "out.bam"), pid)
    w = BamWriter()
    w.open(out)
    w.set_header(idx.header_from_index())
    for rs in results:
        for r in rs:
            w.write_record(r)
    w.close()

    stats = allreduce_stats({"records": float(n_records),
                             "reads": float(len(mine))})
    print(f"RESULT pid={pid} local_records={n_records} "
          f"total_records={stats['records']:.0f} "
          f"total_reads={stats['reads']:.0f}", flush=True)


if __name__ == "__main__":
    main()
