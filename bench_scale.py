"""Chromosome-scale benchmark at BASELINE config-2 SPEC scale.

Config 2: "index chr20 (63 Mbp), align 1M 101 bp reads, full SAM with
secondaries".  No real chr20 is reachable (zero-egress environment),
so the chromosome is synthetic at the spec size; everything else
follows the spec: 63 Mbp index (cached in .wg_cache/), 1,000,000
simulated 101 bp reads, and FULL SAM TEXT emission including
secondary records through the production native path
(align_stream_bam(sam=True)).  Reports reads/s + accuracy + cap
telemetry per 1M reads + HBM as one JSON line.

Not run by the driver (bench.py is the recorded metric); run
manually:  python bench_scale.py
Smoke:     BENCH_MBP=8 BENCH_READS=16384 python bench_scale.py
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

MBP = int(os.environ.get("BENCH_MBP", "63"))
N_READS = int(os.environ.get("BENCH_READS", "1000000"))
READ_LEN = int(os.environ.get("BENCH_READ_LEN", "101"))
CACHE = os.environ.get("BENCH_SCALE_DIR",
                       os.path.join(_REPO, ".wg_cache"))


def genome_str():
    rng = np.random.default_rng(42)
    g = rng.integers(0, 4, MBP * 1_000_000).astype(np.uint8)
    return np.frombuffer(b"ACGT", dtype=np.uint8)[g].tobytes().decode()


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    from seqlib_tpu.align import BWAAligner
    from seqlib_tpu.index import FMIndex
    from seqlib_tpu.sim import simulate_pairs

    os.makedirs(CACHE, exist_ok=True)
    prefix = os.path.join(CACHE, f"chr{MBP}m")
    t0 = time.time()
    if os.path.exists(prefix + ".bwt"):
        idx = FMIndex.load(prefix)
        gs = None
        t_index = 0.0
        print(f"index: cached ({time.time()-t0:.0f}s load, "
              f"seq_len={idx.seq_len:,})", file=sys.stderr)
    else:
        gs = genome_str()
        idx = FMIndex.construct([("chrS", gs)])
        idx.write(prefix)
        t_index = time.time() - t0
        print(f"index: built in {t_index:.1f}s "
              f"(seq_len={idx.seq_len:,})", file=sys.stderr)
    if gs is None:
        gs = genome_str()

    print(f"simulating {N_READS:,} x {READ_LEN} bp reads...",
          file=sys.stderr)
    r1, _ = simulate_pairs([("chrS", gs)], N_READS,
                           read_len=READ_LEN, error_rate=0.002, seed=5)
    del gs
    aln = BWAAligner(idx)
    B = 4096
    t0 = time.time()
    aln.align_batch([u.seq for u in r1[:B]], [u.name for u in r1[:B]])
    print(f"warmup: {time.time()-t0:.1f}s", file=sys.stderr)

    hbm = 0
    try:
        for d in jax.live_arrays():
            hbm += d.nbytes
    except Exception:
        pass

    # full SAM with secondaries through the native emission path
    sam_bytes = 0
    n_records = 0
    ok = 0
    done = 0
    t0 = time.time()
    for chunk, payload, counts in aln.align_stream_bam(
            iter(r1), batch_size=B, workers=4, sam=True):
        sam_bytes += len(payload)
        n_records += int(counts.sum())
        done += len(chunk)
    # positional truth is checked on a sample below (parsing 1M SAM
    # lines here would benchmark the parser, not the aligner)
    dt = time.time() - t0
    rps = N_READS / dt

    # positional accuracy on a 32k sample (object API)
    sample = r1[:32768]
    res = [recs for _, recs in aln.align_stream(iter(sample),
                                                batch_size=B)]
    for u, recs in zip(sample, res):
        parts = u.name.split("_")
        beg, end = int(parts[1]), int(parts[2])
        prim = [r for r in recs if not r.secondary_flag()]
        if prim and (abs(prim[0].pos - (beg - 1)) <= 25
                     or abs(prim[0].pos - (end - READ_LEN)) <= 25):
            ok += 1
    per_m = {k: round(v / (N_READS + len(sample)) * 1e6, 1)
             for k, v in aln.stats.items()}
    print(f"cap telemetry (per 1M reads): {per_m}", file=sys.stderr)
    print(json.dumps({
        "metric": "chr_scale_reads_per_sec",
        "value": round(rps, 1),
        "unit": "reads/s",
        "genome_mbp": MBP,
        "n_reads": N_READS,
        "read_len": READ_LEN,
        "sam_bytes": sam_bytes,
        "n_records": n_records,
        "index_build_s": round(t_index, 1),
        "hbm_bytes": int(hbm),
        "accuracy_32k_sample": round(ok / len(sample), 4),
        "caps_per_1m_reads": per_m,
    }))


if __name__ == "__main__":
    main()
