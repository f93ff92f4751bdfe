#!/bin/bash
# Round-5 TPU queue A — verdict items:
#  W1/W2/W3: #1a the decisive L=10 capacity test — wide torso
#    (--channels 64,128) trained at resume-scale budget (500k scratch with
#    the height curriculum + two +500k resumes = 1.5M steps, matching the
#    narrow ladder's stage-A..Z schedule). The r4 probe stopped at 120k;
#    the narrow flatten appears at ~2M, so only this matched ladder decides.
#  V1/V2/V3: #2 close the one-recipe claim — matched-500k --adapt-rule v2
#    on the three tasks it hasn't run at 500k (L=5 done in r4: 92.2%).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

FLAGS="--model conv --dueling --joint --updates 4 --num-envs 2048 --bank 4096 --device-bank --device-refresh 1"
EVAL="--eval-episodes 8192 --eval-holdout --holdout-bank 2048"
WIDE="--channels 64,128"

run_tag() {
  grep -o '{"train_bank".*' "results/train_r5_${1}.log" | tail -1
}

echo "=== stage W1: L10 WIDE scratch 500k, height 8:4 ==="
timeout 5400 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS $WIDE --device-forward 0.25 --device-height 8:4 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L10wide --checkpoint-every 100000 \
  --log-file results/train_r5_L10wide.jsonl \
  > results/train_r5_L10wide.log 2>&1
echo "rc=$? stageW1"; run_tag L10wide

echo "=== stage V1: L2 adapt-rule v2 500k ==="
timeout 3600 python -m tetris_piclim_tpu.cli train -L 2 -M 20 \
  $FLAGS --device-forward 0.5 --adaptive-share --adapt-every 20 \
  --adapt-rule v2 --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L2adv2 --checkpoint-every 100000 \
  --log-file results/train_r5_L2adv2.jsonl \
  > results/train_r5_L2adv2.log 2>&1
echo "rc=$? stageV1"; run_tag L2adv2

echo "=== stage W2: L10 WIDE resume +500k, height 4 ==="
timeout 5400 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS $WIDE --device-forward 0.25 --device-height 4 \
  --steps 500000 $EVAL \
  --resume results/ckpt_r5_L10wide/final \
  --checkpoint results/ckpt_r5_L10wide2 --checkpoint-every 100000 \
  --log-file results/train_r5_L10wide2.jsonl \
  > results/train_r5_L10wide2.log 2>&1
echo "rc=$? stageW2"; run_tag L10wide2

echo "=== stage V2: L3 adapt-rule v2 500k (the r4 cell was 300k — not evidence) ==="
timeout 3600 python -m tetris_piclim_tpu.cli train -L 3 -M 20 \
  $FLAGS --device-forward 0.5 --adaptive-share --adapt-every 20 \
  --adapt-rule v2 --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L3adv2 --checkpoint-every 100000 \
  --log-file results/train_r5_L3adv2.jsonl \
  > results/train_r5_L3adv2.log 2>&1
echo "rc=$? stageV2"; run_tag L3adv2

echo "=== stage W3: L10 WIDE resume2 +500k, height 4 (1.5M total) ==="
timeout 5400 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS $WIDE --device-forward 0.25 --device-height 4 \
  --steps 500000 $EVAL \
  --resume results/ckpt_r5_L10wide2/final \
  --checkpoint results/ckpt_r5_L10wide3 --checkpoint-every 100000 \
  --log-file results/train_r5_L10wide3.jsonl \
  > results/train_r5_L10wide3.log 2>&1
echo "rc=$? stageW3"; run_tag L10wide3

echo "=== stage V3: L10 adapt-rule v2 500k ==="
timeout 4500 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --device-forward 0.5 --adaptive-share --adapt-every 20 \
  --adapt-rule v2 --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L10adv2 --checkpoint-every 100000 \
  --log-file results/train_r5_L10adv2.jsonl \
  > results/train_r5_L10adv2.log 2>&1
echo "rc=$? stageV3"; run_tag L10adv2

echo "ROUND5A DONE"
