#!/bin/bash
# Round-3 TPU queue A — the runs that need no new research code, ordered by
# VERDICT r2 priority:
#   (1) VERDICT #1: recover the L=3/M=20 --device-forward holdout eval that
#       timed out in round 2 (rc=124), with training-matched bank flags
#       (ADVICE r2 item 1: --bank 4096 --device-forward 0.25) and a real
#       timeout.
#   (2) the no-device-forward comparison arm at the same recipe/budget, so
#       the df-vs-no-df held-out comparison exists.
#   (3) VERDICT #7: one PER ablation arm — identical flags/budget/seed to
#       round 2's ws_scratch_L5M25 control (91.9% train-bank) plus --per.
# Serial: one TPU chip.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

echo "=== (1) L3M20df holdout eval (recovery) ==="
timeout 3600 python -m tetris_piclim_tpu.cli eval -L 3 -M 20 \
  --model conv --dueling --joint --checkpoint results/ckpt_r2_L3M20df \
  --episodes 8192 --eval-holdout --holdout-bank 2048 \
  --bank 4096 --device-bank --device-forward 0.25 \
  > results/eval_r3_L3M20df.json 2> results/eval_r3_L3M20df.err
echo "df eval rc=$?"
cat results/eval_r3_L3M20df.json

echo "=== (2) L3M20 no-df arm (train 300k, matched) ==="
timeout 3000 python -m tetris_piclim_tpu.cli train -L 3 -M 20 \
  --model conv --dueling --joint --updates 4 --num-envs 2048 \
  --bank 4096 --device-bank --device-refresh 1 \
  --steps 300000 --eval-episodes 8192 --eval-holdout --holdout-bank 2048 \
  --checkpoint results/ckpt_r3_L3M20nodf \
  --log-file results/train_r3_L3M20nodf.jsonl \
  > results/train_r3_L3M20nodf.log 2>&1
echo "nodf train rc=$?"
grep -o '{"train_bank".*' results/train_r3_L3M20nodf.log | tail -1

if ! grep -q '"holdout"' results/train_r3_L3M20nodf.log; then
  echo "=== (2b) nodf eval recovery from checkpoint ==="
  timeout 3600 python -m tetris_piclim_tpu.cli eval -L 3 -M 20 \
    --model conv --dueling --joint --checkpoint results/ckpt_r3_L3M20nodf \
    --episodes 8192 --eval-holdout --holdout-bank 2048 \
    --bank 4096 --device-bank \
    > results/eval_r3_L3M20nodf.json 2> results/eval_r3_L3M20nodf.err
  echo "nodf eval rc=$?"
  cat results/eval_r3_L3M20nodf.json
fi

echo "=== (3) PER ablation arm (L5M25, 100k, matched to ws_scratch) ==="
timeout 3000 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  --model conv --dueling --joint --updates 4 --num-envs 2048 \
  --bank 4096 --device-bank --device-refresh 1 \
  --steps 100000 --eval-episodes 4096 --per \
  --log-file results/train_r3_per_L5M25.jsonl \
  > results/train_r3_per_L5M25.log 2>&1
echo "per rc=$?"
grep -o '{"train_bank".*' results/train_r3_per_L5M25.log | tail -1

echo "ROUND3A DONE"
