#!/bin/bash
# Round-3 TPU queue B — runs that need the round-3 code (beam prover,
# mixed-family holdouts, bf16):
#   (1-3) retrain L=2/M=20, L=3/M=20, L=10/M=30 with --device-forward 0.25,
#         now backed by the BEAM prover (round 2's greedy prover trained on
#         a greedy-winnable subset; VERDICT #2 target: forward-family
#         held-out >= 80%). L=10's holdout is now mixed-family via the
#         device-forward fallback.
#   (4)   bf16 throughput arm: flagship recipe at L=5/M=25, matched to the
#         round-2 ws_scratch control (91.9% train-bank, f32).
#   (5)   actor decomposition for the flagship recipe, f32 vs bf16
#         (VERDICT #3 measurement).
#   (6)   generation bench incl. the new device-forward beam throughput.
#   (7)   headline bench on the warm cache (VERDICT #5: compile seconds).
# Waits for round3a to free the chip. Serial: one TPU chip.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

for _ in $(seq 1 480); do
  grep -q "ROUND3A DONE" results/round3a.out 2>/dev/null && break
  sleep 15
done

run() {
  local L=$1 M=$2 steps=$3 tag=$4; shift 4
  echo "=== L=$L M=$M steps=$steps ($tag) extra=[$*] ==="
  timeout 3000 python -m tetris_piclim_tpu.cli train -L "$L" -M "$M" \
    --model conv --dueling --joint --updates 4 --num-envs 2048 \
    --bank 4096 --device-bank --device-refresh 1 \
    --steps "$steps" --eval-episodes 8192 --eval-holdout --holdout-bank 2048 \
    --checkpoint "results/ckpt_r3_$tag" \
    --log-file "results/train_r3_$tag.jsonl" "$@" \
    > "results/train_r3_$tag.log" 2>&1
  echo "rc=$? for $tag"
  grep -o '{"train_bank".*' "results/train_r3_$tag.log" | tail -1
}

run 2 20 300000 L2M20df --device-forward 0.25
run 3 20 300000 L3M20df --device-forward 0.25
run 10 30 500000 L10M30df --device-forward 0.25

echo "=== (4) bf16 flagship arm (L5M25, 100k, matched to ws_scratch) ==="
timeout 3000 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  --model conv --dueling --joint --updates 4 --num-envs 2048 \
  --bank 4096 --device-bank --device-refresh 1 \
  --steps 100000 --eval-episodes 4096 --bf16 \
  --log-file results/train_r3_bf16_L5M25.jsonl \
  > results/train_r3_bf16_L5M25.log 2>&1
echo "bf16 rc=$?"
grep -o '{"train_bank".*' results/train_r3_bf16_L5M25.log | tail -1

echo "=== (5) actor decomposition: flagship recipe f32 vs bf16 ==="
timeout 1800 python benchmarks/bench_actor_decomp.py \
  --model conv --dueling --joint --num-envs 2048 --updates 4 \
  > results/bench_decomp_conv_f32.json 2> results/bench_decomp_conv_f32.err
echo "decomp f32 rc=$?"; cat results/bench_decomp_conv_f32.json
timeout 1800 python benchmarks/bench_actor_decomp.py \
  --model conv --dueling --joint --bf16 --num-envs 2048 --updates 4 \
  > results/bench_decomp_conv_bf16.json 2> results/bench_decomp_conv_bf16.err
echo "decomp bf16 rc=$?"; cat results/bench_decomp_conv_bf16.json

echo "=== (6) generation bench (incl. beam prove throughput) ==="
timeout 1800 python benchmarks/bench_generation.py \
  > results/bench_generation_r3.json 2> results/bench_generation_r3.err
echo "gen rc=$?"; cat results/bench_generation_r3.json

echo "=== (7) headline bench (warm cache) ==="
timeout 900 python bench.py > results/bench_headline_r3.json 2> results/bench_headline_r3.err
echo "bench rc=$?"; cat results/bench_headline_r3.json; cat results/bench_headline_r3.err | tail -1

echo "ROUND3B DONE"
