"""Weak-scaling efficiency of the sharded training chunk over an N-device mesh.

Scales ``num_envs`` proportionally with mesh size (weak scaling) and measures
env-steps/s of the FULL jitted chunk (act + step + bank auto-reset + replay +
learner with its gradient all-reduce). Efficiency(n) = sps(n) / (n * sps(1)).
North star (BASELINE.json): >= 85% efficiency 1 -> N hosts.

On this box the mesh is 8 VIRTUAL CPU devices (one physical TPU chip is
available, so true ICI scaling cannot be measured here) — the harness
validates the program structure and runs unchanged on a real pod, where the
per-device partitions execute on separate chips instead of time-slicing two
host cores. Run with:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/bench_multichip.py
"""

from __future__ import annotations

import json
import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

try:
    jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tetris_piclim_tpu.dqn.train import DQNTrainer
from tetris_piclim_tpu.gen.bank import ConfigBank
from tetris_piclim_tpu.parallel import make_mesh, shard_bank, shard_train_state
from tetris_piclim_tpu.utils.config import DQNConfig, EnvConfig, TrainConfig
from tetris_piclim_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

ENVS_PER_DEVICE = 512
CHUNK_STEPS = 64
REPEATS = 3
L, M = 2, 20


def run(n_dev: int, bank: ConfigBank) -> float:
    cfg = TrainConfig(
        env=EnvConfig(L=L, M=M),
        dqn=DQNConfig(batch_size=128),
        num_envs=ENVS_PER_DEVICE * n_dev,
        bank_capacity=bank.capacity,
        replay_capacity=8192 * n_dev,
        warmup_steps=1,
        seed=0,
    )
    trainer = DQNTrainer(cfg, bank=bank)
    mesh = make_mesh(n_dev)
    shard_bank(mesh, trainer.bank)
    trainer.state = shard_train_state(mesh, trainer.state)

    def chunk():
        ts, _ = trainer._chunk(
            trainer.state, trainer._bank_boards(), trainer.bank.pieces,
            n_steps=CHUNK_STEPS,
        )
        jax.block_until_ready(ts.params)
        trainer.state = ts

    chunk()  # compile
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        chunk()
        best = min(best, time.time() - t0)
    return CHUNK_STEPS * cfg.num_envs / best


def main() -> None:
    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= n_avail]
    bank = ConfigBank(L, M, capacity=256, seed=0).fill_device()
    rows = []
    base = None
    for n in sizes:
        sps = run(n, bank)
        if base is None:
            base = sps
        eff = sps / (n * base)
        rows.append({
            "devices": n,
            "env_steps_per_s": round(sps, 1),
            "weak_scaling_efficiency": round(eff, 4),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)
    out = {
        "metric": "weak_scaling_efficiency",
        "value": rows[-1]["weak_scaling_efficiency"],
        "unit": f"fraction at {sizes[-1]} devices",
        "backend": jax.default_backend(),
        "rows": rows,
    }
    if jax.default_backend() == "cpu":
        # self-describing artifact: without this a reader of the JSON alone
        # would read "scaling is broken" when what was measured is host
        # oversubscription (N virtual devices time-slicing 2 host cores)
        out["caveat"] = (
            f"{sizes[-1]} virtual CPU devices share "
            f"{os.cpu_count()} host cores; this measures host "
            "oversubscription, not ICI scaling — rerun on a real pod "
            "for the north-star number"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
