"""Two-process multi-host demo on CPU: the full sharded DQN training step
over a mesh spanning BOTH processes via jax.distributed.

Validates the actual multi-host code path (gRPC coordinator, cross-process
GSPMD collectives) that the single-process 8-device tests can't: run

    python tools/multihost_demo.py

and it forks itself into 2 processes x 4 CPU devices = one 8-device dp mesh,
runs one sharded training chunk, and prints per-process confirmation. On a
TPU pod the same code takes no arguments — jax.distributed.initialize()
auto-detects.
"""

from __future__ import annotations

import os
import subprocess
import sys

COORD = "127.0.0.1:29781"
N_PROC = 2
LOCAL_DEVICES = 4


def worker(rank: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=COORD, num_processes=N_PROC, process_id=rank
    )
    assert jax.process_count() == N_PROC
    n_global = len(jax.devices())
    assert n_global == N_PROC * LOCAL_DEVICES

    from tetris_piclim_tpu.dqn.train import DQNTrainer
    from tetris_piclim_tpu.parallel import make_mesh, shard_bank, shard_train_state
    from tetris_piclim_tpu.utils.config import DQNConfig, EnvConfig, TrainConfig

    cfg = TrainConfig(
        env=EnvConfig(L=1, M=6),
        dqn=DQNConfig(batch_size=32),
        num_envs=4 * n_global,
        bank_capacity=8,
        replay_capacity=64 * n_global,
        warmup_steps=1,
        seed=0,
    )
    trainer = DQNTrainer(cfg)
    mesh = make_mesh(n_global)
    shard_bank(mesh, trainer.bank)
    trainer.state = shard_train_state(mesh, trainer.state)
    ts, metrics = trainer._chunk(
        trainer.state, trainer._bank_boards(), trainer.bank.pieces, n_steps=2
    )
    jax.block_until_ready(ts.params)
    print(
        f"[proc {rank}] ok — global_devices={n_global} "
        f"updates={int(ts.updates_done)} episodes={int(metrics.episodes)}",
        flush=True,
    )


def main() -> None:
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
        return
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen([sys.executable, os.path.abspath(__file__), str(r)], env=env)
        for r in range(N_PROC)
    ]
    rcs = [p.wait(timeout=600) for p in procs]
    assert all(rc == 0 for rc in rcs), rcs
    print("multihost demo: ALL PROCESSES OK")


if __name__ == "__main__":
    main()
