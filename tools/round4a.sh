#!/bin/bash
# Round-4 TPU queue A — verdict items:
#  P: #3 profile trace of the flagship training chunk (also pays the one-time
#     recompile of the prove program with TRACED initial_height_max)
#  A: #1 climb the L=10/M=30 forward wall — resume the surviving round-3
#     checkpoint (step 800k, holdout 62.6%, forward 35.1%) +500k steps with
#     the graduated initial_height_max curriculum 8->4
#  B1/B2/B3/B4: #2 adaptive forward share — ONE default recipe across all
#     four tasks (probe-bank controller, initial share 0.5)
#  C: #4 the L=5/M=25 device-forward row at the matched 500k budget
#  Z: #1 second +500k resume of stage A's checkpoint (height fixed 4)
#  D: #7 PER at L=10/M=30 with held-out eval
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

FLAGS="--model conv --dueling --joint --updates 4 --num-envs 2048 --bank 4096 --device-bank --device-refresh 1"
EVAL="--eval-episodes 8192 --eval-holdout --holdout-bank 2048"

run_tag() {
  local tag=$1; shift
  grep -o '{"train_bank".*' "results/train_r4_${tag}.log" | tail -1
}

echo "=== stage P: flagship profile trace (5k steps) ==="
timeout 2700 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  $FLAGS --device-forward 0.25 --steps 5000 --log-every 1000 \
  --eval-episodes 256 --profile-dir results/trace_r4_flagship \
  > results/train_r4_profile.log 2>&1
echo "rc=$? stageP"

echo "=== stage A: L10 resume +500k, height curriculum 8:4 ==="
timeout 5400 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --device-forward 0.25 --device-height 8:4 \
  --steps 500000 $EVAL \
  --resume results/ckpt_r3_L10cont/final \
  --checkpoint results/ckpt_r4_L10cont --checkpoint-every 100000 \
  --log-file results/train_r4_L10cont.jsonl \
  > results/train_r4_L10cont.log 2>&1
echo "rc=$? stageA"; run_tag L10cont

echo "=== stage B1: L2 adaptive share 500k ==="
timeout 4200 python -m tetris_piclim_tpu.cli train -L 2 -M 20 \
  $FLAGS --device-forward 0.5 --adaptive-share --adapt-every 20 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r4_L2ad --checkpoint-every 100000 \
  --log-file results/train_r4_L2ad.jsonl \
  > results/train_r4_L2ad.log 2>&1
echo "rc=$? stageB1"; run_tag L2ad

echo "=== stage B2: L3 adaptive share 500k ==="
timeout 4200 python -m tetris_piclim_tpu.cli train -L 3 -M 20 \
  $FLAGS --device-forward 0.5 --adaptive-share --adapt-every 20 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r4_L3ad --checkpoint-every 100000 \
  --log-file results/train_r4_L3ad.jsonl \
  > results/train_r4_L3ad.log 2>&1
echo "rc=$? stageB2"; run_tag L3ad

echo "=== stage C: L5 device-forward 0.25 at the matched 500k budget ==="
timeout 4200 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  $FLAGS --device-forward 0.25 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r4_L5df500 --checkpoint-every 100000 \
  --log-file results/train_r4_L5df500.jsonl \
  > results/train_r4_L5df500.log 2>&1
echo "rc=$? stageC"; run_tag L5df500

echo "=== stage Z: L10 second resume +500k, height 4 ==="
timeout 5400 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --device-forward 0.25 --device-height 4 \
  --steps 500000 $EVAL \
  --resume results/ckpt_r4_L10cont/final \
  --checkpoint results/ckpt_r4_L10cont2 --checkpoint-every 100000 \
  --log-file results/train_r4_L10cont2.jsonl \
  > results/train_r4_L10cont2.log 2>&1
echo "rc=$? stageZ"; run_tag L10cont2

echo "=== stage B3: L5 adaptive share 500k ==="
timeout 4200 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  $FLAGS --device-forward 0.5 --adaptive-share --adapt-every 20 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r4_L5ad --checkpoint-every 100000 \
  --log-file results/train_r4_L5ad.jsonl \
  > results/train_r4_L5ad.log 2>&1
echo "rc=$? stageB3"; run_tag L5ad

echo "=== stage D: L10 PER 500k (verdict #7) ==="
timeout 4200 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --device-forward 0.25 --per \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r4_L10per --checkpoint-every 100000 \
  --log-file results/train_r4_L10per.jsonl \
  > results/train_r4_L10per.log 2>&1
echo "rc=$? stageD"; run_tag L10per

echo "=== stage B4: L10 adaptive share 500k ==="
timeout 4200 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --device-forward 0.5 --adaptive-share --adapt-every 20 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r4_L10ad --checkpoint-every 100000 \
  --log-file results/train_r4_L10ad.jsonl \
  > results/train_r4_L10ad.log 2>&1
echo "rc=$? stageB4"; run_tag L10ad

echo "ROUND4A DONE"
