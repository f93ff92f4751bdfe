"""Checkpoint/resume: TrainState round-trips exactly and training resumes."""

import jax
import numpy as np

from tetris_piclim_tpu.dqn.train import DQNTrainer
from tetris_piclim_tpu.utils.checkpoint import restore_train_state, save_train_state
from tetris_piclim_tpu.utils.config import DQNConfig, EnvConfig, TrainConfig


def _cfg(seed=0):
    return TrainConfig(
        env=EnvConfig(L=1, M=6),
        dqn=DQNConfig(batch_size=32),
        num_envs=16, bank_capacity=16, replay_capacity=256,
        warmup_steps=32, total_steps=20, log_every=10, seed=seed,
    )


def test_roundtrip_exact(tmp_path):
    tr = DQNTrainer(_cfg())
    tr.train(log_fn=None)
    path = str(tmp_path / "ckpt")
    save_train_state(path, tr.state)

    tr2 = DQNTrainer(_cfg())
    restored = restore_train_state(path, tr2.state)

    for a, b in zip(jax.tree.leaves(tr.state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_warm_start_params_only(tmp_path):
    """Weights transfer to a trainer with a DIFFERENT task/config shape;
    everything else (replay, env, counters) starts fresh."""
    tr = DQNTrainer(_cfg())
    tr.train(log_fn=None)
    path = str(tmp_path / "ckpt")
    save_train_state(path, tr.state)

    cfg2 = TrainConfig(
        env=EnvConfig(L=2, M=8),          # harder task
        dqn=DQNConfig(batch_size=32),
        num_envs=8, bank_capacity=8, replay_capacity=128,   # different shapes
        warmup_steps=16, total_steps=10, log_every=5, seed=1,
    )
    tr2 = DQNTrainer(cfg2)
    tr2.warm_start(path)
    for a, b in zip(
        jax.tree.leaves(tr.state.params), jax.tree.leaves(tr2.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(tr2.state.global_step) == 0
    assert int(tr2.state.replay.size) == 0
    tr2.train(log_fn=None)  # trains from the warm-started weights
    assert int(tr2.state.global_step) == 10


def test_resume_continues_training(tmp_path):
    tr = DQNTrainer(_cfg())
    tr.train(log_fn=None)
    step_before = int(tr.state.global_step)
    path = str(tmp_path / "ckpt")
    save_train_state(path, tr.state)

    tr2 = DQNTrainer(_cfg())
    tr2.state = restore_train_state(path, tr2.state)
    tr2.train(total_steps=10, log_fn=None)
    assert int(tr2.state.global_step) == step_before + 10
