"""Headline benchmark: batched env-step throughput per chip.

Measures lockstep random-policy stepping of N vmapped Tetris-piclim envs
with device-bank auto-reset — the hot loop of any training run — on one
chip. Prints ONE JSON line. Baseline: the reference's single-core pure
``move()`` throughput, ~49,000 steps/s (BASELINE.md, measured).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tetris_piclim_tpu.gen.bank import ConfigBank
from tetris_piclim_tpu.ops import bitboard
from tetris_piclim_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

BASELINE_STEPS_PER_S = 49_000.0  # reference move()/s, 1 CPU core (BASELINE.md)

NUM_ENVS = 8192
SCAN_STEPS = 1024
BANK = 256
L, M = 2, 20
REPEATS = 5


def build():
    bank = ConfigBank(L, M, capacity=BANK, seed=0).fill()
    bank_cols = bitboard.pack_board(bank.boards)
    idx = jnp.arange(NUM_ENVS) % BANK
    states = bitboard.make_state_batch(
        bank_cols[idx], bank.pieces[idx], L, M
    )

    @jax.jit
    def rollout(states, bank_cols, bank_pieces, key):
        def body(carry, _):
            states, key = carry
            k1, k2, k3, key = jax.random.split(key, 4)
            rots = jax.random.randint(k1, (NUM_ENVS,), 0, 4)
            locs = jax.random.randint(k2, (NUM_ENVS,), 0, 10)
            states, res = bitboard.step_autoreset_batch(
                states, rots, locs, bank_cols, bank_pieces, k3
            )
            return (states, key), None

        (states, key), _ = jax.lax.scan(body, (states, key), None, length=SCAN_STEPS)
        return states

    return bank, bank_cols, states, rollout


def try_pallas(bank, bank_cols, states):
    """Fused Pallas rollout (fastest path); returns best seconds per
    SCAN_STEPS x NUM_ENVS steps, or None if unavailable."""
    from tetris_piclim_tpu.ops import pallas_rollout

    fused = jax.jit(
        pallas_rollout.rollout_fused, static_argnames=("n_steps", "tile")
    )
    ns, eps, _ = fused(
        states, bank_cols, bank.pieces, jnp.int32(0), n_steps=SCAN_STEPS
    )
    jax.block_until_ready(ns.cols)
    if int(eps) <= 0:  # sanity: episodes must have completed
        return None
    times = []
    for i in range(REPEATS):
        t0 = time.time()
        ns, eps, _ = fused(
            states, bank_cols, bank.pieces, jnp.int32(i + 1), n_steps=SCAN_STEPS
        )
        jax.block_until_ready(ns.cols)
        times.append(time.time() - t0)
    return times


def main() -> None:
    t0 = time.time()
    bank, bank_cols, states, rollout = build()
    build_s = time.time() - t0

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    path = "pallas_fused"
    if os.environ.get("BENCH_FORCE_SCAN"):
        times = None
    else:
        try:
            times = try_pallas(bank, bank_cols, states)
        except Exception as e:
            print(f"# pallas path unavailable: {e!r:.200}", file=sys.stderr)
            times = None
    compile_s = time.time() - t0

    if times is None:
        path = "xla_scan"
        t0 = time.time()
        states = rollout(states, bank_cols, bank.pieces, key)
        jax.block_until_ready(states.cols)
        compile_s = time.time() - t0
        times = []
        for _ in range(REPEATS):
            t0 = time.time()
            states = rollout(states, bank_cols, bank.pieces, key)
            jax.block_until_ready(states.cols)
            times.append(time.time() - t0)

    best = min(times)
    steps_per_s = NUM_ENVS * SCAN_STEPS / best
    result = {
        "metric": "env_steps_per_sec_per_chip",
        "value": round(steps_per_s, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 2),
    }
    # MFU of the flagship TRAINING recipe alongside the headline (VERDICT r3
    # #3): chunk throughput + model-FLOPs utilization from XLA's cost model
    # (benchmarks/bench_mfu.py). Guarded: the headline number must survive
    # even if the training-chunk compile path wedges.
    if not os.environ.get("BENCH_NO_MFU"):
        try:
            sys.path.insert(
                0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "benchmarks"),
            )
            from bench_mfu import measure as mfu_measure

            mm = mfu_measure(num_envs=2048, scan=512, updates=4, bf16=True)
            result["train_env_steps_per_s"] = mm["chunk_env_steps_per_s"]
            result["train_mfu"] = mm["chunk_mfu"]
            result["train_learner_share"] = mm["learner_share_of_chunk"]
        except Exception as e:  # noqa: BLE001
            print(f"# mfu section unavailable: {e!r:.200}", file=sys.stderr)
    print(json.dumps(result))
    print(
        f"# path={path} envs={NUM_ENVS} scan={SCAN_STEPS} repeats={times} "
        f"bank_build={build_s:.1f}s compile={compile_s:.1f}s "
        f"backend={jax.default_backend()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
