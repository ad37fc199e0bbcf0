"""Chromosome-scale benchmark (BASELINE.md config 2 analog).

Indexes a 32 Mbp synthetic chromosome (hg19 chr20-class size is 63 Mbp;
32 Mbp keeps SA-IS under a minute on the 2-vCPU host — scale with
BENCH_MBP), aligns simulated 150 bp reads through the full pipeline on
the TPU, reports reads/s + accuracy.  Not run by the driver (bench.py
is the recorded metric); run manually: python bench_scale.py
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


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from seqlib_tpu.index import FMIndex
    from seqlib_tpu.align import BWAAligner
    from seqlib_tpu.sim import simulate_pairs

    mbp = int(os.environ.get("BENCH_MBP", "32"))
    n_reads = int(os.environ.get("BENCH_READS", "16384"))
    rng = np.random.default_rng(42)
    print(f"building {mbp} Mbp synthetic chromosome...", file=sys.stderr)
    genome = rng.integers(0, 4, mbp * 1_000_000).astype(np.uint8)
    genome_str = np.frombuffer(b"ACGT", dtype=np.uint8)[genome] \
        .tobytes().decode()

    t0 = time.time()
    idx = FMIndex.construct([("chrS", genome_str)])
    t_index = time.time() - t0
    print(f"index: {t_index:.1f}s (seq_len={idx.seq_len:,})",
          file=sys.stderr)

    r1, _ = simulate_pairs([("chrS", genome_str)], n_reads,
                           read_len=150, error_rate=0.002, seed=5)
    aln = BWAAligner(idx)
    B = 4096
    t0 = time.time()
    aln.align_batch([u.seq for u in r1[:B]], [u.name for u in r1[:B]])
    print(f"warmup: {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    results = [recs for _, recs in aln.align_stream(iter(r1), batch_size=B)]
    dt = time.time() - t0
    rps = len(r1) / dt

    ok = 0
    for u, recs in zip(r1, results):
        parts = u.name.split("_")
        beg, end = int(parts[1]), int(parts[2])
        prim = [r for r in recs if not r.secondary_flag()]
        if prim and (abs(prim[0].pos - (beg - 1)) <= 25
                     or abs(prim[0].pos - (end - 150)) <= 25):
            ok += 1
    # cap-audit telemetry (VERDICT r3 item 6): fixed-shape cap-hit
    # rates per MILLION reads at chromosome scale; the CI-pinned
    # bounds live in tests/test_cap_audit.py
    per_m = {k: round(v / len(r1) * 1e6, 1)
             for k, v in aln.stats.items()}
    print(f"cap telemetry (per 1M reads): {per_m}", file=sys.stderr)
    print(json.dumps({
        "metric": "chr_scale_reads_per_sec",
        "value": round(rps, 1),
        "unit": "reads/s",
        "genome_mbp": mbp,
        "index_build_s": round(t_index, 1),
        "accuracy": round(ok / len(r1), 4),
        "caps_per_1m_reads": per_m,
    }))


if __name__ == "__main__":
    main()
