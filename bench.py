"""Benchmark: end-to-end single-chip alignment throughput.

Runs on the real TPU (default JAX platform).  Workload = BASELINE.md
config 1 scaled up: in-memory FM-index of tiny.fa (355 kbp, the
reference's own test genome), align wgsim-simulated 150 bp reads
(tests/data/sim1_bcr.fq) through the full pipeline — device seed scan,
SA lookup, affine extension, banded global alignment for CIGARs, host
record assembly.

Prints ONE JSON line:  {"metric", "value", "unit", "vs_baseline"}.
Baseline = bwa-mem single CPU core on 150 bp reads (~5,000 reads/s,
README-class hardware; see BASELINE.md).  Supplementary numbers
(SW cell rate, seed rate) go to stderr.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))

import numpy as np

BWA_MEM_READS_PER_SEC_BASELINE = 5000.0


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from seqlib_tpu.io.fastq import FastqReader
    from seqlib_tpu.index import FMIndex
    from seqlib_tpu.align import BWAAligner
    from seqlib_tpu.ops.sw import extend_batch

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # One-time platform/tunnel bring-up (NOT compile time): a trivial
    # op pays the axon session setup (~6 min cold, ~0 warm).  Timed
    # separately so the pipeline "warmup" below reports real compile.
    t0 = time.time()
    import jax.numpy as _jnp
    np.asarray(_jnp.ones(8) + 1)
    print(f"platform init (trivial op): {time.time()-t0:.1f}s",
          file=sys.stderr)

    data = "/root/reference/tests/data"
    t0 = time.time()
    seqs = [(s.name, s.seq) for s in FastqReader(f"{data}/tiny.fa")]
    idx = FMIndex.construct(seqs)
    print(f"index construct: {time.time()-t0:.2f}s", file=sys.stderr)

    aln = BWAAligner(idx)
    reads = list(FastqReader(f"{data}/sim1_bcr.fq"))
    names = [r.name for r in reads]
    rseqs = [r.seq for r in reads]

    B = 4096  # measured optimum (r3): device-bound align_full peaks
    # near 30k reads/s at B=4096 while host finish work still overlaps;
    # B=8192 gains device rate but loses pipeline overlap
    # warmup/compile
    t0 = time.time()
    aln.align_batch(rseqs[:B], names[:B])
    print(f"warmup (compile): {time.time()-t0:.1f}s", file=sys.stderr)

    n_bench = 65536                  # reference fastq cycled 8x
    import itertools

    def run_e2e():
        """Production fastq->BAM path: fused device dispatch + native
        C++ record emission (align_stream_bam).  Returns (reads/s,
        mapped, bam bytes)."""
        stream = itertools.islice(itertools.cycle(reads), n_bench)
        t0 = time.time()
        total = 0
        mapped = 0
        nbytes = 0
        for _, payload, counts in aln.align_stream_bam(
                stream, batch_size=B, workers=4):
            total += counts.size
            mapped += int((counts > 0).sum())
            nbytes += len(payload)
        dt = time.time() - t0
        return n_bench / dt, mapped, nbytes

    reads_per_s, mapped, nbytes = run_e2e()
    print(f"e2e: {n_bench} reads in {n_bench/reads_per_s:.2f}s -> "
          f"{reads_per_s:.0f} reads/s ({mapped}/{n_bench} mapped, "
          f"{nbytes/1e6:.1f} MB BAM records emitted)", file=sys.stderr)

    # host-load robustness (VERDICT r3 #2): rerun under deliberate
    # full-core CPU contention; the native emission path must hold
    # within ~20% because record assembly no longer rides Python.
    import subprocess
    spinners = [subprocess.Popen(
        [sys.executable, "-c",
         "while True:\n sum(i*i for i in range(10**6))"])
        for _ in range(os.cpu_count() or 4)]
    try:
        loaded_rps, _, _ = run_e2e()
    finally:
        for p in spinners:
            p.kill()
        for p in spinners:
            p.wait()
    delta = (reads_per_s - loaded_rps) / reads_per_s * 100.0
    print(f"e2e under full host load: {loaded_rps:.0f} reads/s "
          f"(delta {delta:+.1f}% vs unloaded)", file=sys.stderr)

    # supplementary: raw SW extension cell rate on chip
    rng = np.random.default_rng(0)
    Bs, Lq, Lt = 1024, 150, 250
    q = jnp.asarray(rng.integers(0, 4, (Bs, Lq)).astype(np.int8))
    t = jnp.asarray(rng.integers(0, 4, (Bs, Lt)).astype(np.int8))
    ql = jnp.full(Bs, Lq, jnp.int32)
    tl = jnp.full(Bs, Lt, jnp.int32)
    h0 = jnp.full(Bs, 30, jnp.int32)
    # NOTE: block_until_ready does not truly block through the axon
    # tunnel — every timing below forces a VALUE fetch instead.
    int(jnp.sum(extend_batch(q, ql, t, tl, h0)["score"]))  # compile
    t0 = time.time()
    iters = 20
    acc = None
    for _ in range(iters):  # async dispatch; single value-sync at end
        s = extend_batch(q, ql, t, tl, h0)["score"]
        acc = s if acc is None else acc + s
    int(jnp.sum(acc))
    dt = time.time() - t0
    gcups = Bs * Lq * Lt * iters / dt / 1e9
    print(f"sw extension (dispatch-bound): {gcups:.2f} Gcells/s",
          file=sys.stderr)

    # true on-device rate: K dependent iterations fused in ONE program
    # (h0 chains through each call), so link latency is paid once;
    # measured for both the XLA kernel and the production Pallas one
    K = 32

    def rate(fn, label):
        @jax.jit
        def chained(q, ql, t, tl, h0):
            def body(_, h):
                return fn(q, ql, t, tl, h, zdrop=100)["score"] % 1000
            return jnp.sum(jax.lax.fori_loop(0, K, body, h0))
        int(chained(q, ql, t, tl, h0))  # compile
        t0 = time.time()
        int(chained(q, ql, t, tl, h0))
        dt = time.time() - t0
        gc = Bs * Lq * Lt * K / dt / 1e9
        print(f"sw extension (on-device, {label}): {gc:.2f} Gcells/s",
              file=sys.stderr)
        return gc

    rate(extend_batch, "xla")
    if jax.default_backend() != "cpu":
        from seqlib_tpu.ops.sw_pallas import (extend_batch_pallas,
                                              extend_batch_pallas_banded)
        # rectangle kernel: continuity metric (guarded in check.sh)
        gcups_dev = rate(extend_batch_pallas, "pallas, production")
        # banded kernel at bwa's band (the r5 production semantics):
        # rect-equivalent throughput, i.e. same numerator so the
        # numbers compare directly — it computes 1.49x fewer cells
        rate(lambda *a, **k: extend_batch_pallas_banded(*a, band=100,
                                                        **k),
             "pallas, banded w=100, rect-equivalent")
    else:
        gcups_dev = gcups

    print(json.dumps({
        "metric": "reads_aligned_per_sec_per_chip",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BWA_MEM_READS_PER_SEC_BASELINE,
                             3),
    }))


if __name__ == "__main__":
    main()
