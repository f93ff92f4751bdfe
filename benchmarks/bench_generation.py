"""Generation benchmarks — the analogues of the reference's perf harnesses.

* games/s of the carving generator (reference soak loop, game/main.py:59-71):
  host parity carver AND the on-device JAX carver.
* winnable games/s of the forward generate+prove pipeline (reference
  tetris_algo_main/main.py timing prints).

Prints one JSON line per benchmark.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from tetris_piclim_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def bench_host_carver(L=10, M=30, n=100) -> dict:
    from tetris_piclim_tpu.gen.carver import CarvingGenerator

    rng = random.Random(0)
    t0 = time.time()
    for _ in range(n):
        CarvingGenerator(L, M, rng=rng).generate()
    dt = time.time() - t0
    return {
        "bench": "host_carver_games_per_s", "L": L, "M": M,
        "value": round(n / dt, 1),
        "reference_1core": 21.0,  # BASELINE.md, L=10 M=30
    }


def bench_device_carver(L=10, M=30, n=4096) -> dict:
    from tetris_piclim_tpu.gen.jax_carver import generate_batch_device

    f = jax.jit(generate_batch_device, static_argnames=("n", "L", "M"))
    b = f(jax.random.PRNGKey(0), n=n, L=L, M=M)
    jax.block_until_ready(b.boards)
    times = []
    for i in range(3):
        t0 = time.time()
        b = f(jax.random.PRNGKey(i + 1), n=n, L=L, M=M)
        jax.block_until_ready(b.boards)
        times.append(time.time() - t0)
    return {
        "bench": "device_carver_games_per_s", "L": L, "M": M,
        "value": round(n / min(times), 1),
        "converged": int((b.n_moves > 0).sum()),
        "reference_1core": 21.0,
    }


def bench_forward_pipeline(L=2, M=20) -> dict:
    """Thread pool vs spawn-context process pool on the SAME seed range —
    the greedy DFS prover is recursive Python over tiny arrays (GIL-bound),
    so this measures whether the reference's process-pool design
    (main.py:31) beats threads on this box. Reports both + the winner."""
    from tetris_piclim_tpu.gen.pipeline import generate_batch

    out = {"bench": "forward_pipeline_winnable_per_s", "L": L, "M": M,
           "reference_2core": 19.4}  # BASELINE.md
    for ex in ("thread", "process"):
        t0 = time.time()
        games = generate_batch(L, M, seed_start=0, seed_end=100, executor=ex)
        dt = time.time() - t0
        out[ex] = round(len(games) / dt, 2)
        out[f"{ex}_batch_s"] = round(dt, 2)
        out["winnable"] = len(games)
    out["value"] = max(out["thread"], out["process"])
    out["winner"] = "thread" if out["thread"] >= out["process"] else "process"
    return out


def bench_device_forward(L=10, M=30, n=1024) -> dict:
    """Proven forward-family configs/s from the device generate+prove path,
    per beam width — the knob that trades prove cost for DFS-coverage (the
    reference's host pipeline proves ~19 games/s at L=2 and ~0 at L=10)."""
    from tetris_piclim_tpu.gen.jax_forward import generate_batch_device_jit

    out = {"bench": "device_forward_winnable_per_s", "L": L, "M": M, "n": n}
    for bw in (1, 4, 8):
        f = lambda k: generate_batch_device_jit(k, n=n, L=L, M=M, beam_width=bw)
        b = f(jax.random.PRNGKey(0))
        jax.block_until_ready(b.winnable)
        # each timed iteration uses a different PRNG key, so wins and time
        # must be kept as PAIRS — report the best consistent (wins_i/time_i)
        # rate and the mean yield across iterations
        pairs = []
        for i in range(3):
            t0 = time.time()
            b = f(jax.random.PRNGKey(i + 1))
            jax.block_until_ready(b.winnable)
            pairs.append((int(b.winnable.sum()), time.time() - t0))
        out[f"bw{bw}_winnable_per_s"] = round(
            max(w / t for w, t in pairs), 1
        )
        out[f"bw{bw}_yield"] = round(
            sum(w for w, _ in pairs) / (len(pairs) * n), 3
        )
        out[f"bw{bw}_batch_ms"] = round(min(t for _, t in pairs) * 1e3, 1)
    out["value"] = out["bw8_winnable_per_s"]
    return out


if __name__ == "__main__":
    for fn in (bench_host_carver, bench_device_carver,
               bench_forward_pipeline, bench_device_forward):
        print(json.dumps(fn()))
