#!/bin/bash
# Round-5 TPU queue B (runs after round5a) — verdict items:
#  D1: #1b demonstration-augmented resume of the 2.3M-step L=10 flagship —
#      the budget ladder flattened at +1.2 pts/500k; if proven winning
#      trajectories (the beam prover's recorded solutions) carry signal the
#      budget alone cannot, forward-family holdout should move well beyond
#      that trend line.
#  G1: #8 height-curriculum isolation: narrow L=10 scratch 500k with the
#      8:4 anneal. Completes a 2x2 with r3's narrow/h4 scratch (53.5%) and
#      round-5a's wide/h8:4 scratch: isolates BOTH the curriculum's
#      standalone value and the capacity effect at matched height.
#  C1: #6 the double-DQN ablation (only shipped algorithmic default with
#      no attached evidence) at the matched L=5 stage-C cell.
#  E2: #3 the combined no-tradeoff learner-HBM attack: bf16 AdamW moments
#      + LR-retuned batch-512 (sqrt rule 2e-4) at updates 1 (same
#      samples/step as batch-128 x 4, quarter the dispatches). Targets
#      flagship >=2.5M env-steps/s at matched L=5 holdout (93.3 +- 1).
#  F1: #3b the isolated LR-retuned batch-512 arm (f32 moments) — the
#      decomposition row; deadline-guarded, wrap-up has priority.
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

echo "=== stage G1: L10 narrow scratch 500k, height 8:4 (isolation 2x2) ==="
timeout 4500 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --device-forward 0.25 --device-height 8:4 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L10h84 --checkpoint-every 100000 \
  --log-file results/train_r5_L10h84.jsonl \
  > results/train_r5_L10h84.log 2>&1
echo "rc=$? stageG1"; run_tag L10h84

echo "=== stage C1: L5 no-double-DQN at the stage-C recipe (500k) ==="
timeout 4200 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  $FLAGS --device-forward 0.25 --no-double \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L5nodouble --checkpoint-every 100000 \
  --log-file results/train_r5_L5nodouble.jsonl \
  > results/train_r5_L5nodouble.log 2>&1
echo "rc=$? stageC1"; run_tag L5nodouble

echo "=== stage E2: L5 bf16-moments + batch-512 lr 2e-4, updates 1 (500k) ==="
timeout 4200 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  --model conv --dueling --joint --updates 1 --batch 512 --lr 2e-4 \
  --opt-bf16 --num-envs 2048 --bank 4096 --device-bank --device-refresh 1 \
  --device-forward 0.25 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L5fast --checkpoint-every 100000 \
  --log-file results/train_r5_L5fast.jsonl \
  > results/train_r5_L5fast.log 2>&1
echo "rc=$? stageE2"; run_tag L5fast

if [ "$(date -u +%s)" -gt "$(date -u -d 'today 02:10' +%s 2>/dev/null || echo 0)" ] \
   && [ "$(date -u +%H)" -lt 12 ]; then
  echo "SKIP stage F1: past deadline"
else
echo "=== stage F1: L5 batch-512 lr 2e-4, f32 moments (decomposition row) ==="
timeout 4200 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  --model conv --dueling --joint --updates 1 --batch 512 --lr 2e-4 \
  --num-envs 2048 --bank 4096 --device-bank --device-refresh 1 \
  --device-forward 0.25 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L5b512lr --checkpoint-every 100000 \
  --log-file results/train_r5_L5b512lr.jsonl \
  > results/train_r5_L5b512lr.log 2>&1
echo "rc=$? stageF1"; run_tag L5b512lr
fi

echo "ROUND5B DONE"
