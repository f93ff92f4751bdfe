"""Held-out evaluation bank: disjointness, family mix, trainer integration.

The round-1 headline win rates were measured on the training bank (the same
finite config set the agent trained on); gen.bank.make_holdout_bank builds
an eval bank PROVABLY disjoint from training (forward seeds >= 100000 — the
reference pipeline only ever uses 0..99, game/tetris_algo_main/main.py:39-40
— plus device carves from a fresh key, with row-identity hashing as the
proof)."""

import numpy as np
import pytest

from tetris_piclim_tpu.dqn.train import DQNTrainer
from tetris_piclim_tpu.gen.bank import ConfigBank, make_holdout_bank
from tetris_piclim_tpu.utils.config import EnvConfig, TrainConfig


@pytest.fixture(scope="module")
def train_bank():
    return ConfigBank(1, 8, capacity=16, seed=0).fill_device()


@pytest.fixture(scope="module")
def holdout(train_bank):
    return make_holdout_bank(
        1, 8, capacity=16, train_bank=train_bank,
        forward_fraction=0.5, forward_seed_budget=200,
    )


def test_holdout_disjoint_from_train(train_bank, holdout):
    assert not (holdout.row_keys() & train_bank.row_keys())
    assert len(holdout.row_keys()) > 1  # rows are distinct, not repeated


def test_holdout_contains_both_families(holdout):
    # forward yield at L=1/M=8 is high; both families must be represented
    assert holdout.family_counts["forward"] > 0
    assert holdout.family_counts["carve"] > 0
    assert sum(holdout.family_counts.values()) == holdout.capacity


def test_holdout_configs_are_winnable(holdout):
    """Every holdout config must be winnable (solvable by construction —
    forward rows are prover-verified, carved rows replay to WIN); check the
    structural invariant that no board starts already won or topped out."""
    boards = np.asarray(holdout._host_boards)
    assert boards.shape == (16, 20, 10)
    # no full rows at start (a full row would mean a free line)
    assert not boards.all(axis=2).any()
    # stacks never reach the top rows (carver keeps bottom-L + holes;
    # forward caps at initial_height_max + piece height)
    assert not boards[:, :8].any()


def test_trainer_evaluates_on_holdout(train_bank, holdout):
    cfg = TrainConfig(
        env=EnvConfig(L=1, M=8),
        num_envs=16, bank_capacity=16, replay_capacity=512,
        warmup_steps=8, total_steps=16, log_every=8, seed=0,
    )
    trainer = DQNTrainer(cfg, bank=train_bank)
    trainer.train(log_fn=None)
    ev_train = trainer.evaluate(n_episodes=64)
    ev_hold = trainer.evaluate(n_episodes=64, bank=holdout)
    for ev in (ev_train, ev_hold):
        assert ev["unfinished"] == 0.0
        assert 0.0 <= ev["win_rate"] <= 1.0


def test_holdout_family_subsets(holdout):
    from tetris_piclim_tpu.gen.bank import FAMILY_CARVE, FAMILY_FORWARD

    carve = holdout.subset(FAMILY_CARVE)
    fwd = holdout.subset(FAMILY_FORWARD)
    assert carve is not None and fwd is not None
    assert carve.capacity + fwd.capacity == holdout.capacity
    assert carve.boards.shape[0] == carve.capacity
    assert not (carve.row_keys() & fwd.row_keys())


def test_holdout_collision_replacement():
    """Rows colliding with the training bank must be dropped: feed the
    holdout builder a 'training bank' that IS a holdout-like bank built from
    the same seed, forcing collisions, and require disjoint output anyway."""
    a = make_holdout_bank(1, 8, capacity=8, train_bank=None,
                          forward_fraction=0.0, seed=7)
    b = make_holdout_bank(1, 8, capacity=8, train_bank=a,
                          forward_fraction=0.0, seed=7)
    assert not (a.row_keys() & b.row_keys())
