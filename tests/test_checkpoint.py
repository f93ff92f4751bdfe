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
