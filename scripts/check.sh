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
  # the last recorded round result
  python - <<'EOF'
import glob, json, re, sys
lines = [l for l in open("/tmp/bench_out.txt") if l.startswith('{"metric"')]
if not lines:
    sys.exit("bench emitted no JSON line")
cur = json.loads(lines[-1])["value"]
prev = 0.0
for f in sorted(glob.glob("BENCH_r*.json")):
    try:
        d = json.load(open(f))
        v = d.get("parsed", d).get("value", 0.0)
        prev = max(prev, float(v))
    except Exception:
        pass
if prev and cur < 0.8 * prev:
    sys.exit(f"PERF REGRESSION: bench {cur:.0f} < 80% of recorded {prev:.0f}")
print(f"perf guard ok: {cur:.0f} vs recorded best {prev:.0f}")
EOF
fi
echo "ALL CHECKS PASSED"
