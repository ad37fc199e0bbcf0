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
  timeout 900 python bench.py
fi
echo "ALL CHECKS PASSED"
