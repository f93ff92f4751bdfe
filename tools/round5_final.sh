#!/bin/bash
# Round-5 wrap-up: CPU validations + artifacts. Run AFTER round5a+round5b DONE
# (nothing here may contend with a TPU training stage for the 2 vCPUs).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

echo "=== full test suite (8 virtual CPU devices) ==="
timeout 3000 python -m pytest tests/ -x -q 2>&1 | tail -3

echo "=== learning curves ==="
timeout 600 python tools/plot_curves.py 2>/dev/null || true

echo "=== headline bench on the real chip ==="
timeout 1800 python bench.py > results/bench_headline_r5.json \
  2> results/bench_headline_r5.err
cat results/bench_headline_r5.json

echo "=== mfu detail bench (scanned-actor timing fix) ==="
timeout 1800 python benchmarks/bench_mfu.py --bf16 \
  > results/bench_mfu_r5.json 2> results/bench_mfu_r5.err
cat results/bench_mfu_r5.json

echo "=== multichip dry-run ==="
JAX_PLATFORMS=cpu timeout 1800 python -c \
  "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"

echo "ROUND5FINAL DONE"
