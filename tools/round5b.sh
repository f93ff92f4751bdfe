#!/bin/bash
# Round-5 TPU queue B (runs after round5a) — verdict items:
#  D1: #1b demonstration-augmented resume of the 2.3M-step L=10 flagship —
#      the budget ladder flattened at +1.2 pts/500k; if proven winning
#      trajectories (the beam prover's recorded solutions) break the
#      flatten, forward-family holdout should move well beyond that.
#  C1: #6 the double-DQN ablation (only shipped algorithmic default with
#      no attached evidence) at the matched L=5 stage-C cell.
#  E1: #3a bf16 AdamW moment state at the matched L=5 cell — the
#      no-tradeoff lever the round-4 trace indicts (58MB/update).
#  F1: #3b LR-retuned batch-512 (sqrt rule: 1e-4 * sqrt(4) = 2e-4),
#      updates 1 => same samples/step as batch-128 x 4.
#  G1: #8 height-curriculum isolation: narrow L=10 scratch 500k with the
#      8:4 anneal vs the r3 fixed-4 scratch (53.5% holdout, same seed).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

for _ in $(seq 1 2000); do
  grep -q "ROUND5A DONE" results/round5a.out 2>/dev/null && break
  sleep 15
done

FLAGS="--model conv --dueling --joint --updates 4 --num-envs 2048 --bank 4096 --device-bank --device-refresh 1"
EVAL="--eval-episodes 8192 --eval-holdout --holdout-bank 2048"

run_tag() {
  grep -o '{"train_bank".*' "results/train_r5_${1}.log" | tail -1
}

echo "=== stage D1: L10 demo-augmented resume of r4 cont3 (+500k) ==="
timeout 5400 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --device-forward 0.25 --device-height 4 \
  --demo-every 10 --demo-ratio 0.25 --demo-rows 1024 \
  --steps 500000 $EVAL \
  --resume results/ckpt_r4_L10cont3/final \
  --checkpoint results/ckpt_r5_L10demo --checkpoint-every 100000 \
  --log-file results/train_r5_L10demo.jsonl \
  > results/train_r5_L10demo.log 2>&1
echo "rc=$? stageD1"; run_tag L10demo

echo "=== stage C1: L5 no-double-DQN at the stage-C recipe (500k) ==="
timeout 4200 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  $FLAGS --device-forward 0.25 --no-double \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L5nodouble --checkpoint-every 100000 \
  --log-file results/train_r5_L5nodouble.jsonl \
  > results/train_r5_L5nodouble.log 2>&1
echo "rc=$? stageC1"; run_tag L5nodouble

echo "=== stage E1: L5 bf16 AdamW state at the stage-C recipe (500k) ==="
timeout 4200 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  $FLAGS --device-forward 0.25 --opt-bf16 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L5optbf16 --checkpoint-every 100000 \
  --log-file results/train_r5_L5optbf16.jsonl \
  > results/train_r5_L5optbf16.log 2>&1
echo "rc=$? stageE1"; run_tag L5optbf16

echo "=== stage F1: L5 batch-512 LR-retuned (sqrt rule 2e-4), updates 1 ==="
timeout 4200 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  --model conv --dueling --joint --updates 1 --batch 512 --lr 2e-4 \
  --num-envs 2048 --bank 4096 --device-bank --device-refresh 1 \
  --device-forward 0.25 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L5b512lr --checkpoint-every 100000 \
  --log-file results/train_r5_L5b512lr.jsonl \
  > results/train_r5_L5b512lr.log 2>&1
echo "rc=$? stageF1"; run_tag L5b512lr

echo "=== stage G1: L10 narrow scratch 500k, height 8:4 (curriculum isolation) ==="
timeout 4500 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --device-forward 0.25 --device-height 8:4 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L10h84 --checkpoint-every 100000 \
  --log-file results/train_r5_L10h84.jsonl \
  > results/train_r5_L10h84.log 2>&1
echo "rc=$? stageG1"; run_tag L10h84

echo "ROUND5B DONE"
