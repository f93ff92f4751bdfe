#!/bin/bash
# Round-3 TPU queue D — conv-torso throughput experiments (VERDICT #3):
#   (1) decomposition of the flagship recipe with the im2col torso,
#       f32 and bf16 (XLA-conv numbers already in
#       results/bench_decomp_conv_{f32,bf16}.json);
#   (2) if im2col helps, the quality check arm runs in a later queue —
#       first the measurement;
#   (3) re-run the generation bench (its first run died on a sys.path bug).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

for _ in $(seq 1 960); do
  grep -q "ROUND3C DONE" results/round3c.out 2>/dev/null && break
  sleep 15
done

echo "=== decomp conv im2col f32 ==="
timeout 1800 python benchmarks/bench_actor_decomp.py \
  --model conv --dueling --joint --impl im2col --num-envs 2048 --updates 4 \
  > results/bench_decomp_im2col_f32.json 2> results/bench_decomp_im2col_f32.err
echo "rc=$?"; cat results/bench_decomp_im2col_f32.json

echo "=== decomp conv im2col bf16 ==="
timeout 1800 python benchmarks/bench_actor_decomp.py \
  --model conv --dueling --joint --impl im2col --bf16 --num-envs 2048 --updates 4 \
  > results/bench_decomp_im2col_bf16.json 2> results/bench_decomp_im2col_bf16.err
echo "rc=$?"; cat results/bench_decomp_im2col_bf16.json

echo "=== generation bench rerun ==="
timeout 1800 python benchmarks/bench_generation.py \
  > results/bench_generation_r3.json 2> results/bench_generation_r3.err
echo "gen rc=$?"; cat results/bench_generation_r3.json

echo "ROUND3D DONE"
