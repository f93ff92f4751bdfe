#!/bin/bash
# Round-3 TPU queue E — the L=10 forward-family ladder: apply the round-3
# warm-start + exploration-reset finding (94.3% beats 91.9% scratch at
# L=5) to the L=10 wall. Stage 1 trains L=5/M=25 WITH device-forward rows
# (checkpoint), stage 2 fine-tunes L=10/M=30 from it with a slow ε
# re-decay, matched eval to the scratch L10M30df run (53.5% holdout,
# 21.3% forward).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

for _ in $(seq 1 960); do
  grep -q "ROUND3D DONE" results/round3d.out 2>/dev/null && break
  sleep 15
done

echo "=== stage 1: L5M25 df 100k (checkpoint) ==="
timeout 3000 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  --model conv --dueling --joint --updates 4 --num-envs 2048 \
  --bank 4096 --device-bank --device-refresh 1 --device-forward 0.25 \
  --steps 100000 --eval-episodes 4096 \
  --checkpoint results/ckpt_r3_L5df \
  --log-file results/train_r3_L5df.jsonl \
  > results/train_r3_L5df.log 2>&1
echo "rc=$? stage1"
grep -o '{"train_bank".*' results/train_r3_L5df.log | tail -1

echo "=== stage 2: L10M30 df warm-start + eps re-decay, 500k ==="
timeout 4200 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  --model conv --dueling --joint --updates 4 --num-envs 2048 \
  --bank 4096 --device-bank --device-refresh 1 --device-forward 0.25 \
  --steps 500000 --eval-episodes 8192 --eval-holdout --holdout-bank 2048 \
  --warm-start results/ckpt_r3_L5df --eps-decay 20000 \
  --checkpoint results/ckpt_r3_L10ws \
  --checkpoint-every 100000 \
  --log-file results/train_r3_L10ws.jsonl \
  > results/train_r3_L10ws.log 2>&1
echo "rc=$? stage2"
grep -o '{"train_bank".*' results/train_r3_L10ws.log | tail -1

echo "ROUND3E DONE"
