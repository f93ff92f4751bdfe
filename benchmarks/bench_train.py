"""DQN training-loop throughput: fused act+step+replay+update chunk.

Measures full actor-learner env-steps/s (the number that bounds wall-clock
training time), distinct from bench.py's env-only stepping.
Prints one JSON line.
"""

from __future__ import annotations

import json
import time

import jax

from tetris_piclim_tpu.dqn.train import DQNTrainer
from tetris_piclim_tpu.gen.bank import ConfigBank
from tetris_piclim_tpu.utils.config import EnvConfig, TrainConfig
from tetris_piclim_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

NUM_ENVS = 4096
CHUNK = 512


def main() -> None:
    cfg = TrainConfig(
        env=EnvConfig(L=2, M=20),
        num_envs=NUM_ENVS,
        bank_capacity=1024,
        replay_capacity=262144,
        warmup_steps=1,      # learner active from the start
        total_steps=CHUNK,
        log_every=CHUNK,
        seed=0,
    )
    bank = ConfigBank(cfg.env.L, cfg.env.M, capacity=cfg.bank_capacity, seed=0)
    bank.fill_device()
    tr = DQNTrainer(cfg, bank=bank)

    # compile
    ts, _ = tr._chunk(tr.state, tr._bank_boards(), tr.bank.pieces, n_steps=CHUNK)
    jax.block_until_ready(ts.params)
    tr.state = ts

    times = []
    for _ in range(3):
        t0 = time.time()
        ts, _ = tr._chunk(
            tr.state, tr._bank_boards(), tr.bank.pieces, n_steps=CHUNK
        )
        jax.block_until_ready(ts.params)
        tr.state = ts
        times.append(time.time() - t0)

    sps = NUM_ENVS * CHUNK / min(times)
    print(json.dumps({
        "bench": "dqn_train_env_steps_per_s",
        "num_envs": NUM_ENVS,
        "value": round(sps, 1),
        "updates_per_env_step": 1,
        "best_s": round(min(times), 4),
    }))


if __name__ == "__main__":
    main()
