#!/bin/bash
# VERDICT #9: curriculum warm-start with an exploration reset.
# Round-1 found NEGATIVE transfer (3.9% vs 14.0% from scratch) and blamed
# eps=0.05 pinning the fine-tune to the transferred policy's shortcuts.
# Design: stage-1 L=3/M=25 -> warm-start L=5/M=25 with (a) the default
# eps schedule (decays to 0.05 within ~5k steps) and (b) a slow exploration
# re-schedule (--eps-decay 20000), vs (c) a from-scratch control, all at a
# matched 100k-step budget under the round-2 regime (device refresh, joint
# recipe, held-out-honest banks).
set -u
cd "$(dirname "$0")/.."

# Persist compiled executables across the 4 runs below — every process
# otherwise re-pays the ~25-90s remote-tunnel compile for the SAME programs.
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

COMMON="--model conv --dueling --joint --updates 4 --num-envs 2048 \
  --bank 4096 --device-bank --device-refresh 1 \
  --eval-episodes 4096"

run() {
  local tag=$1; shift
  echo "=== $tag ==="
  timeout 3000 python -m tetris_piclim_tpu.cli train $COMMON "$@" \
    > "results/ws_$tag.log" 2>&1
  echo "rc=$? $tag"
  grep -o '{"train_bank".*' "results/ws_$tag.log" | tail -1
}

run stage1_L3M25 -L 3 -M 25 --steps 50000 --checkpoint results/ckpt_ws_L3M25
run scratch_L5M25 -L 5 -M 25 --steps 100000
run ws_default_eps_L5M25 -L 5 -M 25 --steps 100000 \
  --warm-start results/ckpt_ws_L3M25
run ws_eps_reset_L5M25 -L 5 -M 25 --steps 100000 \
  --warm-start results/ckpt_ws_L3M25 --eps-decay 20000
echo "WS DONE"
