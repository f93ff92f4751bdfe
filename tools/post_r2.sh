#!/bin/bash
# Runs after tools/finish_r2.sh completes: (1) the actor-throughput
# decomposition bench (VERDICT #4 written measurement), (2) the warm-start
# exploration-reset experiment (VERDICT #9), (3) regenerate the round-2
# curves figure. Waits for the finish queue to release the chip.
set -u
cd "$(dirname "$0")/.."

for _ in $(seq 1 240); do
  grep -q "FINISH R2 DONE" results/finish_r2.out 2>/dev/null && break
  sleep 15
done
grep -q "FINISH R2 DONE" results/finish_r2.out || echo "WARN: finish queue not done; proceeding anyway"

timeout 1200 python benchmarks/bench_actor_decomp.py \
  > results/bench_actor_decomp.json 2> results/bench_actor_decomp.err
echo "decomp rc=$?"
cat results/bench_actor_decomp.json

bash tools/warmstart_experiment.sh > results/warmstart_all.out 2>&1
echo "warmstart rc=$?"
tail -20 results/warmstart_all.out

python tools/plot_curves.py r2 || true
echo "POST R2 DONE"
