#!/bin/bash
# Round-4 TPU queue B — learner-attack experiment (VERDICT r3 #3): the
# profile says the learner is memory-bound on the 12817x128 flatten
# Dense + AdamW state; --bottleneck 16 cuts that traffic 4x. E1 measures
# whether the smaller head matches the flagship win rate at the same
# budget as stage C (L=5, share 0.25, 500k); E2 adds bf16 for the
# throughput row.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

for _ in $(seq 1 2000); do
  grep -q "ROUND4A DONE" results/round4a.out 2>/dev/null && break
  sleep 15
done

FLAGS="--model conv --dueling --joint --updates 4 --num-envs 2048 --bank 4096 --device-bank --device-refresh 1"
EVAL="--eval-episodes 8192 --eval-holdout --holdout-bank 2048"

echo "=== stage B2r: L3 adaptive share 500k (rerun after pool-clamp fix) ==="
timeout 4200 python -m tetris_piclim_tpu.cli train -L 3 -M 20 \
  $FLAGS --device-forward 0.5 --adaptive-share --adapt-every 20 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r4_L3ad --checkpoint-every 100000 \
  --log-file results/train_r4_L3ad.jsonl \
  > results/train_r4_L3ad.log 2>&1
echo "rc=$? stageB2r"
grep -o '{"train_bank".*' results/train_r4_L3ad.log | tail -1

echo "=== stage E1: L5 bottleneck-16 at the stage-C recipe ==="
timeout 4200 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  $FLAGS --device-forward 0.25 --bottleneck 16 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r4_L5bn16 --checkpoint-every 100000 \
  --log-file results/train_r4_L5bn16.jsonl \
  > results/train_r4_L5bn16.log 2>&1
echo "rc=$? stageE1"
grep -o '{"train_bank".*' results/train_r4_L5bn16.log | tail -1

if [ "$(date -u +%s)" -gt "$(date -u -d 'today 16:40' +%s)" ]; then
  echo "SKIP stage Z2: past deadline"
else
echo "=== stage Z2: L10 third resume +500k, height 4 ==="
timeout 4500 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --device-forward 0.25 --device-height 4 \
  --steps 500000 $EVAL \
  --resume results/ckpt_r4_L10cont2/final \
  --checkpoint results/ckpt_r4_L10cont3 --checkpoint-every 100000 \
  --log-file results/train_r4_L10cont3.jsonl \
  > results/train_r4_L10cont3.log 2>&1
echo "rc=$? stageZ2"
grep -o '{"train_bank".*' results/train_r4_L10cont3.log | tail -1

fi


if [ "$(date -u +%s)" -gt "$(date -u -d 'today 16:55' +%s)" ]; then
  echo "SKIP stage E2: past deadline"
else
echo "=== stage E2: L5 bottleneck-16 + bf16 (throughput row) ==="
timeout 4200 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  $FLAGS --device-forward 0.25 --bottleneck 16 --bf16 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r4_L5bn16bf --checkpoint-every 100000 \
  --log-file results/train_r4_L5bn16bf.jsonl \
  > results/train_r4_L5bn16bf.log 2>&1
echo "rc=$? stageE2"
grep -o '{"train_bank".*' results/train_r4_L5bn16bf.log | tail -1

fi

echo "ROUND4B DONE"
