#!/bin/bash
# Round-3 TPU queue G — extend the 0.5-share default to L=3: the L=2
# resolution showed beam rows need a 0.5 share/500k budget to pay off
# (96.4% forward); this arm checks the same recipe lifts L=3 beyond its
# 88.5% (0.25/300k) forward number.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

for _ in $(seq 1 960); do
  grep -q "ROUND3F DONE" results/round3f.out 2>/dev/null && break
  sleep 15
done

echo "=== L3M20 df=0.5 500k ==="
timeout 3600 python -m tetris_piclim_tpu.cli train -L 3 -M 20 \
  --model conv --dueling --joint --updates 4 --num-envs 2048 \
  --bank 4096 --device-bank --device-refresh 1 --device-forward 0.5 \
  --steps 500000 --eval-episodes 8192 --eval-holdout --holdout-bank 2048 \
  --checkpoint results/ckpt_r3_L3df50 --checkpoint-every 100000 \
  --log-file results/train_r3_L3df50.jsonl \
  > results/train_r3_L3df50.log 2>&1
echo "rc=$?"
grep -o '{"train_bank".*' results/train_r3_L3df50.log | tail -1

echo "ROUND3G DONE"
