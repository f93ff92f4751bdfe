#!/bin/bash
# Resume of tools/train_r2_all.sh: the L5M25 run was killed at 494k/500k
# steps (no final eval), and L10M30 / L2M20 never started. Reruns those
# three, then the warm-start exploration-reset experiment (VERDICT #9),
# then the actor-throughput decomposition bench (VERDICT #4). Serial: one
# TPU chip.
set -u
cd "$(dirname "$0")/.."

run() {
  local L=$1 M=$2 steps=$3 tag=$4
  echo "=== L=$L M=$M steps=$steps ($tag) ==="
  timeout 4000 python -m tetris_piclim_tpu.cli train -L "$L" -M "$M" \
    --model conv --dueling --joint --updates 4 --num-envs 2048 \
    --bank 4096 --device-bank --device-refresh 1 --refresh-bank \
    --steps "$steps" --eval-episodes 8192 --eval-holdout --holdout-bank 2048 \
    --checkpoint "results/ckpt_r2_$tag" \
    --log-file "results/train_r2_$tag.jsonl" \
    > "results/train_r2_$tag.log" 2>&1
  echo "rc=$? for $tag"
  grep -o '{"train_bank".*' "results/train_r2_$tag.log" | tail -1
}

run 5 25 500000 L5M25
run 10 30 500000 L10M30
run 2 20 300000 L2M20

bash tools/warmstart_experiment.sh > results/warmstart_all.out 2>&1
echo "warmstart rc=$?"

timeout 1200 python benchmarks/bench_actor_decomp.py \
  > results/bench_actor_decomp.json 2> results/bench_actor_decomp.err
echo "decomp rc=$?"

echo "RESUME ALL DONE"
