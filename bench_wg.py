"""Whole-genome-scale benchmark (BASELINE.md config 4 analog).

Builds a >1 Gbp synthetic reference and streams simulated 150 bp
reads through the aligner on the TPU, reporting reads/s + accuracy +
HBM footprint as one JSON line.  Two layouts:

* ``BENCH_WG_LAYOUT=wide`` (default): ONE index holding every contig
  — the 2L text exceeds 2^31, so the aligner auto-selects the hi/lo
  (int34) device path (ops/fm_wide.py) and the whole genome runs as a
  single fused program on one chip.  This is docs/SHARDED_INDEX.md
  milestone 3: no serial-shard tax.
* ``BENCH_WG_LAYOUT=sharded``: the round-2..4 layout — N sub-2^31
  int32 shards through ShardedBWAAligner (serially on one chip; one
  shard per device on a mesh).  Kept for comparison and for meshes
  where shards map one-per-device.

Shard construction is parallelized across worker PROCESSES (SA-IS is
the bottleneck: ~1 s/Mbp single-threaded); each worker regenerates
its contig(s) from a seed so no sequence bytes cross the process
boundary, builds the FMIndex, and writes it in bwa's 64-bit on-disk
format under BENCH_WG_DIR.  Built indexes are cached: re-runs skip
straight to alignment.

Not run by the driver (bench.py is the recorded metric); run manually:
    python bench_wg.py                # 4 x 280 Mbp contigs, one index
    BENCH_WG_LAYOUT=sharded python bench_wg.py       # legacy 4-shard
    BENCH_WG_SHARDS=2 BENCH_WG_MBP=64 python bench_wg.py   # smoke

Reference capability being exercised: BWAIndex holds one bwaidx_t of
any size (/root/reference/src/BWAIndex.cpp:28-33); the wide layout is
the literal equivalent — one index, any size — on TPU.
"""

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".jax_cache"))

import numpy as np

N_SHARDS = int(os.environ.get("BENCH_WG_SHARDS", "4"))
SHARD_MBP = int(os.environ.get("BENCH_WG_MBP", "280"))
N_READS = int(os.environ.get("BENCH_WG_READS", "32768"))
N_WORKERS = int(os.environ.get("BENCH_WG_WORKERS", "2"))
LAYOUT = os.environ.get("BENCH_WG_LAYOUT", "wide")
WG_DIR = os.environ.get("BENCH_WG_DIR", os.path.join(_REPO, ".wg_cache"))
SEED0 = 100


def shard_contig(k: int) -> str:
    """Deterministic synthetic contig for shard k (workers and the
    parent regenerate it independently — nothing is pickled)."""
    rng = np.random.default_rng(SEED0 + k)
    codes = rng.integers(0, 4, SHARD_MBP * 1_000_000).astype(np.uint8)
    return np.frombuffer(b"ACGT", dtype=np.uint8)[codes].tobytes().decode()


def shard_prefix(k: int) -> str:
    return os.path.join(WG_DIR, f"wg{SHARD_MBP}m.shard{k}")


def wide_prefix() -> str:
    return os.path.join(WG_DIR, f"wg{SHARD_MBP}m.wide{N_SHARDS}")


def build_shard(k: int) -> None:
    from seqlib_tpu.index import FMIndex
    t0 = time.time()
    idx = FMIndex.construct([(f"chrW{k}", shard_contig(k))])
    idx.write(shard_prefix(k))
    print(f"[worker] shard {k}: {SHARD_MBP} Mbp built+written in "
          f"{time.time()-t0:.0f}s", file=sys.stderr)


def build_wide() -> None:
    """ONE index over every contig (2L > 2^31: the wide path)."""
    from seqlib_tpu.index import FMIndex
    t0 = time.time()
    idx = FMIndex.construct(
        [(f"chrW{k}", shard_contig(k)) for k in range(N_SHARDS)])
    idx.write(wide_prefix())
    print(f"[worker] wide index: {N_SHARDS * SHARD_MBP} Mbp "
          f"(2L = {idx.seq_len/1e9:.2f}G) built+written in "
          f"{time.time()-t0:.0f}s", file=sys.stderr)


def ensure_shards() -> float:
    """Build missing indexes with worker subprocesses; returns wall
    seconds spent building (0.0 if fully cached)."""
    os.makedirs(WG_DIR, exist_ok=True)
    env = dict(os.environ, JAX_PLATFORMS="cpu")  # workers never touch TPU
    if LAYOUT == "wide":
        if os.path.exists(wide_prefix() + ".bwt"):
            return 0.0
        t0 = time.time()
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--build-wide"],
            env=env)
        p.wait()
        if p.returncode != 0:
            raise RuntimeError("wide index build failed")
        return time.time() - t0
    missing = [k for k in range(N_SHARDS)
               if not os.path.exists(shard_prefix(k) + ".bwt")]
    if not missing:
        return 0.0
    t0 = time.time()
    pending = list(missing)
    running: list[tuple[int, subprocess.Popen]] = []
    failed = []
    while pending or running:
        while pending and len(running) < N_WORKERS:
            k = pending.pop(0)
            p = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--build-shard", str(k)], env=env)
            running.append((k, p))
        k, p = running[0]
        p.wait()
        running.pop(0)
        if p.returncode != 0:
            failed.append(k)
    if failed:
        raise RuntimeError(f"shard build failed for {failed}")
    return time.time() - t0


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from seqlib_tpu.index import FMIndex
    from seqlib_tpu.index.sharded import ShardedFMIndex
    from seqlib_tpu.align.sharded import ShardedBWAAligner
    from seqlib_tpu.sim import simulate_pairs

    t_build = ensure_shards()
    t0 = time.time()
    if LAYOUT == "wide":
        wide_idx = FMIndex.load(wide_prefix())
        g_bp = wide_idx.l_pac
        n_shards_eff = 1
    else:
        shards = [FMIndex.load(shard_prefix(k)) for k in range(N_SHARDS)]
        sidx = ShardedFMIndex(shards, list(range(N_SHARDS)))
        g_bp = sum(s.l_pac for s in shards)
        n_shards_eff = N_SHARDS
    t_load = time.time() - t0
    print(f"index: layout={LAYOUT}, {n_shards_eff} device program(s), "
          f"{g_bp/1e9:.2f} Gbp total, build {t_build:.0f}s, "
          f"load {t_load:.0f}s", file=sys.stderr)

    # reads simulated from shard 0 and the last shard (covers the
    # global-rid remap and cross-shard dedup paths)
    per = N_READS // 2
    r_all = []
    for k in (0, N_SHARDS - 1):
        seq = shard_contig(k)
        r1, _ = simulate_pairs([(f"chrW{k}", seq)], per, read_len=150,
                               error_rate=0.002, seed=7 + k)
        r_all.extend(r1[:per])
        del seq
    rng = np.random.default_rng(3)
    rng.shuffle(r_all)

    if LAYOUT == "wide":
        from seqlib_tpu.align import BWAAligner
        aln = BWAAligner(wide_idx)
        # (smoke runs below 2^31 legitimately stay on the int32 path)
        assert aln.wide or wide_idx.seq_len < 2**31
    else:
        aln = ShardedBWAAligner(sidx)
    B = 4096
    t0 = time.time()
    aln.align_batch([u.seq for u in r_all[:B]], [u.name for u in r_all[:B]])
    print(f"warmup (compile): {time.time()-t0:.1f}s", file=sys.stderr)

    hbm = 0
    try:
        for d in jax.live_arrays():
            hbm += d.nbytes
    except Exception:
        pass

    t0 = time.time()
    results = [recs for _, recs
               in aln.align_stream(iter(r_all), batch_size=B)]
    dt = time.time() - t0
    rps = len(r_all) / dt

    ok = 0
    for u, recs in zip(r_all, results):
        parts = u.name.split("_")
        chrom = parts[0]
        beg, end = int(parts[1]), int(parts[2])
        want_rid = int(chrom[4:])
        prim = [r for r in recs if not r.secondary_flag()]
        if prim and prim[0].tid == want_rid and (
                abs(prim[0].pos - (beg - 1)) <= 25
                or abs(prim[0].pos - (end - 150)) <= 25):
            ok += 1
    # cap-audit telemetry at whole-genome scale (VERDICT r3 item 6)
    per_m = {k: round(v / len(r_all) * 1e6, 1)
             for k, v in aln.stats.items()}
    print(f"cap telemetry (per 1M reads): {per_m}", file=sys.stderr)
    print(json.dumps({
        "metric": "wg_scale_reads_per_sec",
        "value": round(rps, 1),
        "unit": "reads/s",
        "layout": LAYOUT,
        "genome_gbp": round(g_bp / 1e9, 3),
        "n_shards": n_shards_eff,
        "index_build_s": round(t_build, 1),
        "hbm_bytes": int(hbm),
        "accuracy": round(ok / len(r_all), 4),
        "n_reads": len(r_all),
        "caps_per_1m_reads": per_m,
    }))


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--build-shard":
        build_shard(int(sys.argv[2]))
    elif len(sys.argv) == 2 and sys.argv[1] == "--build-wide":
        build_wide()
    else:
        main()
