#!/bin/bash
# Round-5 bonus queue E — runs after ROUND5D DONE with whatever wall time
# remains. Each cell fills a hole the main queues left:
#  B1: demos at the CANONICAL height 4 (G1 showed the 8:4 curriculum is
#      negative standalone; demo-h4 is the natural best-cell candidate
#      and the cleanest demo read vs narrow-h4 53.5/21.3).
#  B2: wide torso at height 4 — the missing capacity cell (wide-h84 vs
#      narrow-h84 showed +2.5; wide-h4 vs narrow-h4 is the canonical
#      comparison).
#  B3: bf16-moments-only decomposition (b128 u4 + --opt-bf16) — isolates
#      storage precision from the negative batch-512 structure result.
# Partial logs from a driver kill are harmless; full cells get appended
# to the RESULTS grid.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

FLAGS="--model conv --dueling --joint --updates 4 --num-envs 2048 --bank 4096 --device-bank --device-refresh 1"
EVAL="--eval-episodes 8192 --eval-holdout --holdout-bank 2048"

run_tag() {
  grep -o '{"train_bank".*' "results/train_r5_${1}.log" | tail -1
}

echo "=== stage B1: L10 demo scratch 500k (MC + margin 0.8), height 4 ==="
timeout 5400 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --device-forward 0.25 --device-height 4 \
  --demo-every 10 --demo-ratio 0.25 --demo-rows 1024 --demo-margin 0.8 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L10demoh4 --checkpoint-every 100000 \
  --log-file results/train_r5_L10demoh4.jsonl \
  > results/train_r5_L10demoh4.log 2>&1
echo "rc=$? stageB1"; run_tag L10demoh4

echo "=== stage B2: L10 WIDE scratch 500k, height 4 (missing capacity cell) ==="
timeout 5400 python -m tetris_piclim_tpu.cli train -L 10 -M 30 \
  $FLAGS --channels 64,128 --device-forward 0.25 --device-height 4 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L10wideh4 --checkpoint-every 100000 \
  --log-file results/train_r5_L10wideh4.jsonl \
  > results/train_r5_L10wideh4.log 2>&1
echo "rc=$? stageB2"; run_tag L10wideh4

echo "=== stage B3: L5 bf16-moments only (b128 u4, lr 1e-4) decomposition ==="
timeout 4500 python -m tetris_piclim_tpu.cli train -L 5 -M 25 \
  $FLAGS --device-forward 0.25 --opt-bf16 \
  --steps 500000 $EVAL \
  --checkpoint results/ckpt_r5_L5bf16opt --checkpoint-every 100000 \
  --log-file results/train_r5_L5bf16opt.jsonl \
  > results/train_r5_L5bf16opt.log 2>&1
echo "rc=$? stageB3"; run_tag L5bf16opt

echo "ROUND5E DONE"
