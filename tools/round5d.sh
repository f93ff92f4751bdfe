#!/bin/bash
# Round-5 TPU queue D — follow-on after the D1' demo-divergence diagnosis.
# Waits for the still-running V2 python (launched by queue C before its
# controller was stopped), then runs the remaining verdict stages:
#  D2: the FIXED demo-augmented L=10 scratch 500k (Monte-Carlo demo
#      targets + DQfD margin 0.8) — D1' with TD-bootstrapped demo targets
#      diverged (loss 1e4, 0% win; kept as the negative artifact).
#  V3: adapt-rule v2 at L=10 500k (last one-recipe row).
#  G1: narrow L=10 scratch 500k height 8:4 (curriculum/capacity 2x2).
#  C1: L5 no-double ablation.  E2: bf16-moments + LR-retuned batch-512.
# Then the chip wrap-up benches (headline + MFU) regardless.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

WAIT_PID="${WAIT_PID:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID (stage V2) to finish..."
  while [ -d "/proc/$WAIT_PID" ]; do sleep 20; done
  echo "V2 done:"; grep -o '{"train_bank".*' results/train_r5_L3adv2.log | tail -1
fi

TRAIN_END=$(( $(date +%s) + ${TRAIN_BUDGET_S:-12600} ))

FLAGS="--model conv --dueling --joint --updates 4 --num-envs 2048 --bank 4096 --device-bank --device-refresh 1"
EVAL="--eval-episodes 8192 --eval-holdout --holdout-bank 2048"

run_tag() {
  grep -o '{"train_bank".*' "results/train_r5_${1}.log" | tail -1
}

fits() {
  local left=$(( TRAIN_END - $(date +%s) ))
  if [ "$left" -lt "$1" ]; then
    echo "SKIP ${2}: ${left}s left < ${1}s estimate"
    return 1
  fi
  return 0
}

if fits 2700 stageD2; then
echo "=== stage D2: L10 demo scratch 500k (MC targets + margin 0.8), height 8:4 ==="
timeout 5400 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --device-forward 0.25 --device-height 8:4 \
  --demo-every 10 --demo-ratio 0.25 --demo-rows 1024 --demo-margin 0.8 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L10demo2 --checkpoint-every 100000 \
  --log-file results/train_r5_L10demo2.jsonl \
  > results/train_r5_L10demo2.log 2>&1
echo "rc=$? stageD2"; run_tag L10demo2
fi

if fits 3600 stageV3; then
echo "=== stage V3: L10 adapt-rule v2 500k ==="
timeout 5400 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --device-forward 0.5 --adaptive-share --adapt-every 20 \
  --adapt-rule v2 --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L10adv2 --checkpoint-every 100000 \
  --log-file results/train_r5_L10adv2.jsonl \
  > results/train_r5_L10adv2.log 2>&1
echo "rc=$? stageV3"; run_tag L10adv2
fi

if fits 2700 stageG1; then
echo "=== stage G1: L10 narrow scratch 500k, height 8:4 (isolation 2x2) ==="
timeout 5400 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --device-forward 0.25 --device-height 8:4 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L10h84 --checkpoint-every 100000 \
  --log-file results/train_r5_L10h84.jsonl \
  > results/train_r5_L10h84.log 2>&1
echo "rc=$? stageG1"; run_tag L10h84
fi

if fits 2700 stageC1; then
echo "=== stage C1: L5 no-double-DQN at the stage-C recipe (500k) ==="
timeout 4500 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  $FLAGS --device-forward 0.25 --no-double \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L5nodouble --checkpoint-every 100000 \
  --log-file results/train_r5_L5nodouble.jsonl \
  > results/train_r5_L5nodouble.log 2>&1
echo "rc=$? stageC1"; run_tag L5nodouble
fi

if fits 2700 stageE2; then
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

echo "=== chip wrap-up: headline bench ==="
timeout 1800 python bench.py > results/bench_headline_r5.json \
  2> results/bench_headline_r5.err
cat results/bench_headline_r5.json

echo "=== chip wrap-up: mfu detail bench ==="
timeout 1800 python benchmarks/bench_mfu.py --bf16 \
  > results/bench_mfu_r5.json 2> results/bench_mfu_r5.err
cat results/bench_mfu_r5.json

echo "ROUND5D DONE"
