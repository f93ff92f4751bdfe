#!/bin/bash
# Final round-2 queue: the two held-out table rows still TBD (L10M30,
# L2M20), then the device-forward cross-family-transfer experiment at a
# reduced budget if wall-clock remains. Serial: one TPU chip.
set -u
cd "$(dirname "$0")/.."

run() {
  local L=$1 M=$2 steps=$3 tag=$4; shift 4
  echo "=== L=$L M=$M steps=$steps ($tag) extra=[$*] ==="
  timeout 1800 python -m tetris_piclim_tpu.cli train -L "$L" -M "$M" \
    --model conv --dueling --joint --updates 4 --num-envs 2048 \
    --bank 4096 --device-bank --device-refresh 1 \
    --steps "$steps" --eval-episodes 8192 --eval-holdout --holdout-bank 2048 \
    --checkpoint "results/ckpt_r2_$tag" \
    --log-file "results/train_r2_$tag.jsonl" "$@" \
    > "results/train_r2_$tag.log" 2>&1
  echo "rc=$? for $tag"
  grep -o '{"train_bank".*' "results/train_r2_$tag.log" | tail -1
}

run 10 30 500000 L10M30 --refresh-bank
run 2 20 300000 L2M20 --refresh-bank
run 3 20 300000 L3M20df --device-forward 0.25

echo "FINISH R2 DONE"
