#!/bin/bash
# After the resume_r2 queue: (1) per-family holdout breakdowns for the two
# retraining runs that predate the cli eval breakdown support; (2) the
# device-forward experiment — same L3M20 recipe but with 25% of the
# per-chunk device bank regenerated as PROVEN on-device forward-family
# configs (gen/jax_forward.py), to quantify the cross-family transfer gain.
set -u
cd "$(dirname "$0")/.."

for tag in "3 20 L3M20"; do
  set -- $tag
  echo "=== eval families L=$1 M=$2 ($3) ==="
  timeout 2000 python -m tetris_piclim_tpu.cli eval -L "$1" -M "$2" \
    --model conv --dueling --joint --checkpoint "results/ckpt_r2_$3" \
    --episodes 8192 --eval-holdout --holdout-bank 2048 --bank 256 \
    > "results/eval_r2_${3}_families.json" 2> "results/eval_r2_${3}_families.err"
  echo "rc=$? for $3"
done

echo "=== L=3 M=20 steps=500000 (L3M20df, --device-forward 0.25) ==="
timeout 4000 python -m tetris_piclim_tpu.cli train -L 3 -M 20 \
  --model conv --dueling --joint --updates 4 --num-envs 2048 \
  --bank 4096 --device-bank --device-refresh 1 --device-forward 0.25 \
  --steps 500000 --eval-episodes 8192 --eval-holdout --holdout-bank 2048 \
  --checkpoint "results/ckpt_r2_L3M20df" \
  --log-file "results/train_r2_L3M20df.jsonl" \
  > "results/train_r2_L3M20df.log" 2>&1
echo "rc=$? for L3M20df"
grep -o '{"train_bank".*' "results/train_r2_L3M20df.log" | tail -1

echo "FOLLOWUP DONE"
