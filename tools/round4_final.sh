#!/bin/bash
# Round-4 wrap-up: CPU validations + artifacts that must not run while a
# TPU training stage owns the chip/host. Run AFTER round4a+round4b DONE.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

echo "=== full test suite (8 virtual CPU devices) ==="
timeout 2400 python -m pytest tests/ -x -q 2>&1 | tail -3

echo "=== weak-scaling artifact (regenerated with caveat field) ==="
JAX_PLATFORMS=cpu timeout 2400 python benchmarks/bench_multichip.py \
  > results/bench_multichip_r4.json 2> results/bench_multichip_r4.err
tail -1 results/bench_multichip_r4.json

echo "=== learning curves ==="
timeout 600 python tools/plot_curves.py 2>/dev/null || true

echo "=== headline bench on the real chip (with MFU section) ==="
timeout 1800 python bench.py > results/bench_headline_r4.json \
  2> results/bench_headline_r4.err
cat results/bench_headline_r4.json

echo "=== mfu detail bench ==="
timeout 1800 python benchmarks/bench_mfu.py --bf16 \
  > results/bench_mfu_r4.json 2> results/bench_mfu_r4.err
cat results/bench_mfu_r4.json

echo "=== generation bench (advisor-fixed pairing) ==="
timeout 1800 python benchmarks/bench_generation.py \
  > results/bench_generation_r4.json 2> results/bench_generation_r4.err
tail -1 results/bench_generation_r4.json

echo "ROUND4FINAL DONE"
