"""Curriculum: heterogeneous per-env (L, M) under one compiled step."""

import jax
import jax.numpy as jnp
import numpy as np

from tetris_piclim_tpu.gen.curriculum import (
    build_curriculum_bank,
    make_states,
    promote_levels,
    step_autoreset_curriculum,
)


def test_mixed_levels_lockstep():
    levels = [(1, 8), (2, 12), (4, 16)]
    bank = build_curriculum_bank(jax.random.PRNGKey(0), levels, capacity=16)
    assert bank.boards.shape == (3, 16, 10)
    assert bank.pieces.shape == (3, 16, 17)  # max M + 1

    n = 96
    level = jnp.asarray(np.arange(n) % 3, jnp.int32)
    states = make_states(bank, level, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(
        np.asarray(states.lines_goal), [1, 2, 4] * (n // 3)
    )
    np.testing.assert_array_equal(
        np.asarray(states.move_limit), [8, 12, 16] * (n // 3)
    )

    @jax.jit
    def run(states, key):
        def body(carry, _):
            states, key = carry
            k1, k2, k3, key = jax.random.split(key, 4)
            rots = jax.random.randint(k1, (n,), 0, 4)
            locs = jax.random.randint(k2, (n,), 0, 10)
            states, res = step_autoreset_curriculum(
                states, rots, locs, bank, level, k3
            )
            return (states, key), res.done.sum()
        (states, _), dones = jax.lax.scan(body, (states, key), None, length=20)
        return states, dones.sum()

    states, total_dones = run(states, jax.random.PRNGKey(2))
    assert int(total_dones) > 0
    # levels survive auto-reset
    np.testing.assert_array_equal(
        np.asarray(states.lines_goal), [1, 2, 4] * (n // 3)
    )


def test_promotion():
    level = np.zeros(100, dtype=np.int64)
    win = np.array([0.9, 0.0, 0.0])
    new = promote_levels(level, win, n_levels=3, threshold=0.8, fraction=0.5)
    assert (new == 1).sum() == 50
    assert (new == 0).sum() == 50
    # below threshold: no movement
    new2 = promote_levels(new, np.array([0.1, 0.1, 0.0]), n_levels=3)
    np.testing.assert_array_equal(new, new2)


def test_curriculum_trainer_promotes():
    from tetris_piclim_tpu.dqn.curriculum_train import CurriculumTrainer
    from tetris_piclim_tpu.utils.config import DQNConfig, EnvConfig, TrainConfig

    cfg = TrainConfig(
        env=EnvConfig(L=1, M=6),
        dqn=DQNConfig(batch_size=32),
        num_envs=64, bank_capacity=16, replay_capacity=2048,
        warmup_steps=64, seed=0,
    )
    tr = CurriculumTrainer([(1, 8), (2, 12)], cfg=cfg)
    hist = tr.train(total_steps=120, chunk=60, threshold=0.0, fraction=0.5,
                    log_fn=None)
    assert len(hist) == 2
    # threshold 0 forces promotion whenever level-0 episodes occurred
    assert hist[-1]["level_distribution"][1] > 0
    assert np.isfinite(hist[-1]["loss"])


def test_curriculum_trainer_custom_net_and_replay_ratio():
    """CurriculumTrainer accepts a custom net (dueling/joint) and honors
    cfg.updates_per_step (replay-ratio loop inside the fused chunk)."""
    from tetris_piclim_tpu.dqn.curriculum_train import CurriculumTrainer
    from tetris_piclim_tpu.models.qnet import QNetwork
    from tetris_piclim_tpu.utils.config import DQNConfig, EnvConfig, TrainConfig

    cfg = TrainConfig(
        env=EnvConfig(L=1, M=6),
        dqn=DQNConfig(batch_size=32),
        num_envs=64, bank_capacity=16, replay_capacity=2048,
        warmup_steps=64, updates_per_step=2, seed=0,
    )
    tr = CurriculumTrainer(
        [(1, 8), (2, 12)], cfg=cfg, net=QNetwork(dueling=True, joint=True)
    )
    hist = tr.train(total_steps=120, chunk=60, threshold=0.0, fraction=0.5,
                    log_fn=None)
    assert np.isfinite(hist[-1]["loss"])
    rows = tr.evaluate_levels(episodes_per_level=32)
    assert all(0.0 <= r["win_rate"] <= 1.0 for r in rows)
