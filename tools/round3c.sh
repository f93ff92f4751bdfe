#!/bin/bash
# Round-3 TPU queue C — L=2 forward-family attribution. The L2M20df beam arm
# landed at 34.2% forward-family holdout (vs 57.0% for round-2's host-row
# training and 88.5-92.3% for L=3 df arms). Three hypotheses, one arm each:
#   (1) share/budget: trivial carve episodes swamp the forward transitions
#       at L=2 -> raise the forward share to 0.5 and the budget to 500k.
#   (2) beam-vs-greedy rows: train on greedy (width-1) device rows at the
#       same 0.25/300k budget -> if this recovers toward 57%, the beam's
#       extra (planning-heavy) rows are the regression.
# Waits for round3b. Serial: one TPU chip.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

for _ in $(seq 1 720); do
  grep -q "ROUND3B DONE" results/round3b.out 2>/dev/null && break
  sleep 15
done

# L10M30df recovery: the queue-B run hit a ~12-min tunnel stall and raced
# its timeout. If its inline final eval is missing, recover it from the
# checkpoint (saved before eval); if even the checkpoint is missing, retrain
# with a stall-tolerant timeout.
if ! grep -q '"holdout"' results/train_r3_L10M30df.log 2>/dev/null; then
  if [ -d results/ckpt_r3_L10M30df ]; then
    echo "=== L10M30df eval recovery from checkpoint ==="
    timeout 3600 python -m tetris_piclim_tpu.cli eval -L 10 -M 30 \
      --model conv --dueling --joint --checkpoint results/ckpt_r3_L10M30df \
      --episodes 8192 --eval-holdout --holdout-bank 2048 \
      --bank 4096 --device-bank --device-forward 0.25 \
      > results/eval_r3_L10M30df.json 2> results/eval_r3_L10M30df.err
    echo "L10 eval rc=$?"; cat results/eval_r3_L10M30df.json
  else
    echo "=== L10M30df retrain (stall-tolerant) ==="
    timeout 4200 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
      --model conv --dueling --joint --updates 4 --num-envs 2048 \
      --bank 4096 --device-bank --device-refresh 1 \
      --steps 500000 --eval-episodes 8192 --eval-holdout --holdout-bank 2048 \
      --device-forward 0.25 --checkpoint results/ckpt_r3_L10M30df \
      --checkpoint-every 100000 \
      --log-file results/train_r3_L10M30df.jsonl \
      > results/train_r3_L10M30df.log 2>&1
    echo "rc=$? for L10M30df retrain"
    grep -o '{"train_bank".*' results/train_r3_L10M30df.log | tail -1
  fi
fi

run() {
  local tag=$1; shift
  echo "=== L2M20 $tag extra=[$*] ==="
  timeout 3000 python -m tetris_piclim_tpu.cli train -L 2 -M 20 \
    --model conv --dueling --joint --updates 4 --num-envs 2048 \
    --bank 4096 --device-bank --device-refresh 1 \
    --eval-episodes 8192 --eval-holdout --holdout-bank 2048 \
    --log-file "results/train_r3_$tag.jsonl" "$@" \
    > "results/train_r3_$tag.log" 2>&1
  echo "rc=$? for $tag"
  grep -o '{"train_bank".*' "results/train_r3_$tag.log" | tail -1
}

run L2df50 --steps 500000 --device-forward 0.5 \
  --checkpoint results/ckpt_r3_L2df50
run L2df25bw1 --steps 300000 --device-forward 0.25 --device-beam 1 \
  --checkpoint results/ckpt_r3_L2df25bw1

echo "ROUND3C DONE"
