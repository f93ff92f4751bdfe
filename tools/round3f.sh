#!/bin/bash
# Round-3 TPU queue F — the last throughput lever for VERDICT #3: replace
# 4 sequential batch-128 learner updates with 1 batch-512 update (same
# sample throughput, 4x-wider matmuls, 1/4 the optimizer dispatches).
# Quality check at matched sample budget vs the 91.9% ws_scratch control
# and the 93.9% bf16 arm.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

for _ in $(seq 1 960); do
  grep -q "ROUND3E DONE" results/round3e.out 2>/dev/null && break
  sleep 15
done

echo "=== L5M25 u1 batch512 bf16 arm ==="
timeout 3000 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  --model conv --dueling --joint --updates 1 --batch 512 --bf16 \
  --num-envs 2048 --bank 4096 --device-bank --device-refresh 1 \
  --steps 100000 --eval-episodes 4096 \
  --log-file results/train_r3_b512_L5M25.jsonl \
  > results/train_r3_b512_L5M25.log 2>&1
echo "rc=$?"
grep -o '{"train_bank".*' results/train_r3_b512_L5M25.log | tail -1

echo "=== decomp u1 batch512 (bf16) ==="
timeout 1800 python benchmarks/bench_actor_decomp.py \
  --model conv --dueling --joint --bf16 --num-envs 2048 --updates 1 \
  --batch 512 \
  > results/bench_decomp_b512.json 2> results/bench_decomp_b512.err
echo "rc=$?"; cat results/bench_decomp_b512.json

echo "ROUND3F DONE"
