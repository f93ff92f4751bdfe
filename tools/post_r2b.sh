#!/bin/bash
# Post-queue chain v2 (replaces post_r2.sh): after tools/finish_r2.sh frees
# the chip — (0) recover the L3M20df final eval from its checkpoint if the
# run's timeout cut the eval off, (1) actor-throughput decomposition bench
# (VERDICT #4), (2) headline bench smoke, (3) warm-start exploration-reset
# experiment (VERDICT #9), (4) figure refresh.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

for _ in $(seq 1 240); do
  grep -q "FINISH R2 DONE" results/finish_r2.out 2>/dev/null && break
  sleep 15
done

if ! grep -q "final_eval" results/train_r2_L3M20df.jsonl 2>/dev/null \
    && [ -d results/ckpt_r2_L3M20df ]; then
  echo "=== recovering L3M20df eval from checkpoint ==="
  timeout 2000 python -m tetris_piclim_tpu.cli eval -L 3 -M 20 \
    --model conv --dueling --joint --checkpoint results/ckpt_r2_L3M20df \
    --episodes 8192 --eval-holdout --holdout-bank 2048 --bank 2048 \
    > results/eval_r2_L3M20df.json 2> results/eval_r2_L3M20df.err
  echo "df eval rc=$?"
  cat results/eval_r2_L3M20df.json
fi

timeout 1500 python benchmarks/bench_actor_decomp.py \
  > results/bench_actor_decomp.json 2> results/bench_actor_decomp.err
echo "decomp rc=$?"
cat results/bench_actor_decomp.json 2>/dev/null

timeout 900 python bench.py > results/bench_headline_r2.json 2> results/bench_headline_r2.err
echo "bench rc=$?"
cat results/bench_headline_r2.json 2>/dev/null

bash tools/warmstart_experiment.sh > results/warmstart_all.out 2>&1
echo "warmstart rc=$?"
tail -12 results/warmstart_all.out

python tools/plot_curves.py r2 || true
echo "POST R2B DONE"
