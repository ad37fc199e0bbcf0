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
  # perf-regression guard: fail if the headline metric drops >20% below
  # the best number EVER recorded — driver rounds (BENCH_r*.json) OR
  # builder measurements (BUILDER_BEST below).  VERDICT r3 flagged the
  # old guard for comparing only against BENCH_r*.json, which let the
  # 17.2k -> 9.8k mid-round regression pass unseen.
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
if prev and cur < 0.8 * prev:
    sys.exit(f"PERF REGRESSION: bench {cur:.0f} < 80% of best {prev:.0f}"
             " (driver-recorded or builder-measured)")
print(f"perf guard ok: {cur:.0f} vs best {prev:.0f}")
EOF
fi
echo "ALL CHECKS PASSED"
