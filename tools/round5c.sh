#!/bin/bash
# Round-5 TPU queue C — restart after the VM snapshot-restore wiped every
# results/ckpt_* directory (gitignored, so only git-tracked state survived)
# and killed queues A (mid-W2) and B (never started).
#
# Redesign forced by the checkpoint loss:
#  * D1 (demo-augmented +500k RESUME of the 2.3M narrow ladder) is
#    impossible — the ladder checkpoint is gone. Replaced by D1': a
#    demo-augmented L=10 SCRATCH 500k with the same height 8:4 curriculum
#    as W1/G1, so the demo lever is measured at matched budget/height
#    against the committed scratch baselines (narrow-h4 53.5, wide-h84
#    51.2) and the G1 narrow-h84 cell below.
#  * W2/W3 (wide ladder resumes) are impossible without re-running W1
#    (~1h each). Capacity evidence becomes the matched-500k scratch pair:
#    wide-h84 51.2 (committed) vs narrow-h84 (G1).
#  * V2/V3/G1/C1/E2 are scratch runs — unchanged from queues A/B.
#
# Stage order = verdict priority: demo hypothesis (#1b), one-recipe rows
# (#2), curriculum/capacity 2x2 (#8/#1a), double-DQN evidence (#6), the
# no-tradeoff perf arm (#3). Each stage is deadline-guarded so the wrap-up
# (tests + bench on the real chip) always gets its window.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

TRAIN_END=$(( $(date +%s) + ${TRAIN_BUDGET_S:-17100} ))

FLAGS="--model conv --dueling --joint --updates 4 --num-envs 2048 --bank 4096 --device-bank --device-refresh 1"
EVAL="--eval-episodes 8192 --eval-holdout --holdout-bank 2048"

run_tag() {
  grep -o '{"train_bank".*' "results/train_r5_${1}.log" | tail -1
}

fits() {  # fits <est_seconds> <name>
  local left=$(( TRAIN_END - $(date +%s) ))
  if [ "$left" -lt "$1" ]; then
    echo "SKIP ${2}: ${left}s left < ${1}s estimate"
    return 1
  fi
  return 0
}

if fits 3900 stageD1; then
echo "=== stage D1': L10 demo-augmented scratch 500k, height 8:4 ==="
timeout 5400 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --device-forward 0.25 --device-height 8:4 \
  --demo-every 10 --demo-ratio 0.25 --demo-rows 1024 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L10demo --checkpoint-every 100000 \
  --log-file results/train_r5_L10demo.jsonl \
  > results/train_r5_L10demo.log 2>&1
echo "rc=$? stageD1"; run_tag L10demo
fi

if fits 3300 stageV2; then
echo "=== stage V2: L3 adapt-rule v2 500k ==="
timeout 4500 python -m tetris_piclim_tpu.cli train -L 3 -M 20 \
  $FLAGS --device-forward 0.5 --adaptive-share --adapt-every 20 \
  --adapt-rule v2 --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L3adv2 --checkpoint-every 100000 \
  --log-file results/train_r5_L3adv2.jsonl \
  > results/train_r5_L3adv2.log 2>&1
echo "rc=$? stageV2"; run_tag L3adv2
fi

if fits 3900 stageV3; then
echo "=== stage V3: L10 adapt-rule v2 500k ==="
timeout 5400 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --device-forward 0.5 --adaptive-share --adapt-every 20 \
  --adapt-rule v2 --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L10adv2 --checkpoint-every 100000 \
  --log-file results/train_r5_L10adv2.jsonl \
  > results/train_r5_L10adv2.log 2>&1
echo "rc=$? stageV3"; run_tag L10adv2
fi

if fits 3900 stageG1; then
echo "=== stage G1: L10 narrow scratch 500k, height 8:4 (isolation 2x2) ==="
timeout 5400 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --device-forward 0.25 --device-height 8:4 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L10h84 --checkpoint-every 100000 \
  --log-file results/train_r5_L10h84.jsonl \
  > results/train_r5_L10h84.log 2>&1
echo "rc=$? stageG1"; run_tag L10h84
fi

if fits 3300 stageC1; then
echo "=== stage C1: L5 no-double-DQN at the stage-C recipe (500k) ==="
timeout 4500 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  $FLAGS --device-forward 0.25 --no-double \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L5nodouble --checkpoint-every 100000 \
  --log-file results/train_r5_L5nodouble.jsonl \
  > results/train_r5_L5nodouble.log 2>&1
echo "rc=$? stageC1"; run_tag L5nodouble
fi

if fits 3300 stageE2; then
echo "=== stage E2: L5 bf16-moments + batch-512 lr 2e-4, updates 1 (500k) ==="
timeout 4500 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  --model conv --dueling --joint --updates 1 --batch 512 --lr 2e-4 \
  --opt-bf16 --num-envs 2048 --bank 4096 --device-bank --device-refresh 1 \
  --device-forward 0.25 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L5fast --checkpoint-every 100000 \
  --log-file results/train_r5_L5fast.jsonl \
  > results/train_r5_L5fast.log 2>&1
echo "rc=$? stageE2"; run_tag L5fast
fi

echo "ROUND5C DONE"
