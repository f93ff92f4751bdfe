#!/bin/bash
# Round-2 retraining: every headline task with an infinite training
# distribution (per-chunk device bank regeneration + two-producer host
# refresh) and final train-bank vs HELD-OUT evaluation.
set -u
cd "$(dirname "$0")/.."

run() {
  local L=$1 M=$2 steps=$3 tag=$4
  echo "=== L=$L M=$M steps=$steps ($tag) ==="
  timeout 4000 python -m tetris_piclim_tpu.cli train -L "$L" -M "$M" \
    --model conv --dueling --joint --updates 4 --num-envs 2048 \
    --bank 4096 --device-bank --device-refresh 1 --refresh-bank \
    --steps "$steps" --eval-episodes 8192 --eval-holdout --holdout-bank 2048 \
    --checkpoint "results/ckpt_r2_$tag" \
    --log-file "results/train_r2_$tag.jsonl" \
    > "results/train_r2_$tag.log" 2>&1
  echo "rc=$? for $tag"
  grep -o '{"train_bank".*' "results/train_r2_$tag.log" | tail -1
}

run 3 20 500000 L3M20
run 5 25 500000 L5M25
run 10 30 500000 L10M30
run 2 20 300000 L2M20
echo "ALL DONE"
