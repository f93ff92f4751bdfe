"""n-step returns + prioritized replay (the extensions beyond the
reference's declared 1-step uniform algorithm, each default-off).

The ring buffer writes one contiguous block of ``num_envs`` transitions per
step, so the n-step successor of physical slot ``i`` is ``i + k*num_envs``
(mod capacity) — these tests pin that invariant against a plain-Python
trajectory model, including the wrapped-ring case.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_piclim_tpu.dqn import agent as agent_lib
from tetris_piclim_tpu.dqn import replay as replay_lib
from tetris_piclim_tpu.ops import bitboard
from tetris_piclim_tpu.utils.config import DQNConfig, EnvConfig, TrainConfig

GAP = 2  # envs per step in these tests


def _states(n, cur_piece=0):
    boards = jnp.zeros((n, 20, 10), bool)
    pieces = jnp.full((n, 8), cur_piece, jnp.int8)
    return bitboard.make_state_batch(boards, pieces, 2, 7)


def _fill(capacity, rewards, dones):
    """Write a trajectory of T steps x GAP envs; rewards/dones are [T, GAP]."""
    r = replay_lib.replay_init(capacity)
    for t in range(len(rewards)):
        r = replay_lib.replay_add(
            r,
            _states(GAP, cur_piece=t % 7),
            jnp.zeros(GAP, jnp.int32),
            jnp.zeros(GAP, jnp.int32),
            jnp.asarray(rewards[t], jnp.float32),
            _states(GAP, cur_piece=(t + 1) % 7),
            jnp.asarray(dones[t], bool),
        )
    return r


def _expected_nstep(rewards, dones, t, e, n, gamma):
    """Plain-Python n-step return from step t for env e."""
    g, disc = 0.0, 1.0
    for k in range(n):
        g += (gamma ** k) * rewards[t + k][e]
        if dones[t + k][e]:
            return g, gamma ** (k + 1), True, t + k
    return g, gamma ** n, bool(dones[t + n - 1][e]), t + n - 1


@pytest.mark.parametrize("capacity,steps", [(16, 6), (8, 6)])
def test_nstep_chain_math_vs_python(capacity, steps):
    """Sampled n-step returns/discounts/dones must match the trajectory
    model — both unwrapped (cap 16) and after the ring wraps (cap 8)."""
    n, gamma = 3, 0.9
    rng = np.random.default_rng(0)
    rewards = [[10.0 * t + e for e in range(GAP)] for t in range(steps)]
    dones = [[bool(rng.random() < 0.3) for _ in range(GAP)] for _ in range(steps)]
    r = _fill(capacity, rewards, dones)

    cap_steps = capacity // GAP
    first_kept = max(0, steps - cap_steps)  # older steps were overwritten
    size = int(r.size)
    valid = size - (n - 1) * GAP
    oldest = (int(r.pos) - size) % capacity

    batch, idx0 = jax.jit(
        lambda rr, k: replay_lib.replay_sample_ext(
            rr, k, 64, gamma=gamma, n_step=n, step_gap=GAP
        )
    )(r, jax.random.PRNGKey(1))
    idx0 = np.asarray(idx0)

    for b, i in enumerate(idx0):
        logical = (i - oldest) % capacity
        assert logical < valid, "sampled a base without a full chain"
        t = first_kept + logical // GAP
        e = logical % GAP
        g, disc, done, _ = _expected_nstep(rewards, dones, t, e, n, gamma)
        assert float(batch.reward[b]) == pytest.approx(g, rel=1e-5)
        assert float(batch.discount[b]) == pytest.approx(disc, rel=1e-5)
        assert bool(batch.done[b]) == done


def test_nstep1_reduces_to_onestep():
    rewards = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    dones = [[False, True], [False, False], [True, False]]
    r = _fill(16, rewards, dones)
    batch, idx0 = replay_lib.replay_sample_ext(
        r, jax.random.PRNGKey(0), 32, gamma=0.99, n_step=1, step_gap=GAP
    )
    idx0 = np.asarray(idx0)
    np.testing.assert_allclose(
        np.asarray(batch.reward), np.asarray(r.reward)[idx0]
    )
    np.testing.assert_array_equal(
        np.asarray(batch.done), np.asarray(r.done)[idx0]
    )
    np.testing.assert_allclose(np.asarray(batch.discount), 0.99)
    np.testing.assert_allclose(np.asarray(batch.weight), 1.0)


def test_nstep_next_obs_comes_from_chain_end():
    """With no dones, next_obs of an n-step sample must be the after-state
    written n-1 steps later (distinguishable here via the piece one-hots)."""
    n = 3
    steps = 5
    rewards = [[0.0] * GAP for _ in range(steps)]
    dones = [[False] * GAP for _ in range(steps)]
    r = _fill(32, rewards, dones)
    batch, idx0 = replay_lib.replay_sample_ext(
        r, jax.random.PRNGKey(2), 16, gamma=0.9, n_step=n, step_gap=GAP
    )
    idx0 = np.asarray(idx0)
    # current piece one-hot of obs encodes t; of next_obs encodes the chain
    # end's after-state piece (t + n - 1 + 1) — both mod 7
    obs_piece = np.argmax(np.asarray(batch.obs)[:, 200:207], axis=1)
    next_piece = np.argmax(np.asarray(batch.next_obs)[:, 200:207], axis=1)
    t = idx0 // GAP
    np.testing.assert_array_equal(obs_piece, t % 7)
    np.testing.assert_array_equal(next_piece, (t + n) % 7)


def test_per_sampling_and_weights():
    """High-priority slots must dominate proportional sampling, and IS
    weights must equal (valid * P)^-beta, max-normalized."""
    steps = 4
    rewards = [[0.0] * GAP for _ in range(steps)]
    dones = [[False] * GAP for _ in range(steps)]
    r = _fill(16, rewards, dones)
    prio = np.full(16, 1e-6, np.float32)
    prio[3] = 1.0    # everything else negligible
    prio[5] = 1.0
    r = r._replace(priority=jnp.asarray(prio))
    alpha, beta = 1.0, 0.5
    batch, idx0 = replay_lib.replay_sample_ext(
        r, jax.random.PRNGKey(3), 512, gamma=0.99, n_step=1, step_gap=GAP,
        prioritized=True, alpha=alpha, beta=beta,
    )
    idx0 = np.asarray(idx0)
    frac = np.isin(idx0, [3, 5]).mean()
    assert frac > 0.99
    # both hot slots have equal priority -> equal P -> weight 1 after
    # max-normalization
    np.testing.assert_allclose(np.asarray(batch.weight), 1.0, rtol=1e-5)


def test_per_weight_ratio():
    """Two slots with priorities p and 2p: w(hot)/w(cold) = 2^-beta."""
    steps = 2
    rewards = [[0.0] * GAP for _ in range(steps)]
    dones = [[False] * GAP for _ in range(steps)]
    r = _fill(8, rewards, dones)
    prio = np.full(8, 1e-8, np.float32)
    prio[0], prio[1] = 1.0, 2.0
    r = r._replace(priority=jnp.asarray(prio))
    beta = 0.7
    batch, idx0 = replay_lib.replay_sample_ext(
        r, jax.random.PRNGKey(4), 1024, gamma=0.99, n_step=1, step_gap=GAP,
        prioritized=True, alpha=1.0, beta=beta,
    )
    idx0 = np.asarray(idx0)
    w = np.asarray(batch.weight)
    assert (idx0 == 1).any() and (idx0 == 0).any()
    w_cold = w[idx0 == 0].mean()   # lower priority -> larger weight
    w_hot = w[idx0 == 1].mean()
    assert w_cold == pytest.approx(1.0, rel=1e-5)  # max-normalized
    assert w_hot == pytest.approx(2.0 ** -beta, rel=1e-4)


def test_priority_update_and_fresh_write_max():
    steps = 2
    rewards = [[0.0] * GAP for _ in range(steps)]
    dones = [[False] * GAP for _ in range(steps)]
    r = _fill(8, rewards, dones)
    assert float(r.max_prio) == 1.0
    np.testing.assert_allclose(np.asarray(r.priority)[:4], 1.0)
    r = replay_lib.replay_update_priority(
        r, jnp.array([1, 2]), jnp.array([5.0, 0.25]), eps=1e-3
    )
    p = np.asarray(r.priority)
    assert p[1] == pytest.approx(5.001) and p[2] == pytest.approx(0.251)
    assert float(r.max_prio) == pytest.approx(5.001)
    # the next write inherits the new max priority
    r = replay_lib.replay_add(
        r, _states(GAP), jnp.zeros(GAP, jnp.int32), jnp.zeros(GAP, jnp.int32),
        jnp.zeros(GAP), _states(GAP), jnp.zeros(GAP, bool),
    )
    np.testing.assert_allclose(np.asarray(r.priority)[4:6], 5.001, rtol=1e-6)


def test_per_beta_anneal_schedule():
    """beta must anneal linearly per_beta -> 1 over training (Schaul et al.
    §3.4); a fixed beta leaves the IS correction permanently biased."""
    import jax.numpy as jnp

    from tetris_piclim_tpu.dqn.agent import per_beta_schedule
    from tetris_piclim_tpu.utils.config import DQNConfig

    cfg = DQNConfig(prioritized=True, per_beta=0.4)
    total = 1000
    assert float(per_beta_schedule(jnp.int32(0), cfg, total)) == pytest.approx(0.4)
    assert float(per_beta_schedule(jnp.int32(500), cfg, total)) == pytest.approx(0.7)
    assert float(per_beta_schedule(jnp.int32(1000), cfg, total)) == pytest.approx(1.0)
    assert float(per_beta_schedule(jnp.int32(5000), cfg, total)) == pytest.approx(1.0)
    # explicit horizon override
    cfg2 = DQNConfig(prioritized=True, per_beta=0.4, per_beta_steps=100)
    assert float(per_beta_schedule(jnp.int32(100), cfg2, total)) == pytest.approx(1.0)
    # anneal disabled -> constant
    cfg3 = DQNConfig(prioritized=True, per_beta=0.4, per_beta_anneal=False)
    assert float(per_beta_schedule(jnp.int32(900), cfg3, total)) == pytest.approx(0.4)


def test_trainer_smoke_nstep_per():
    """End-to-end: fused trainer with n_step=3 + PER learns with finite loss
    on CPU and evaluation still terminates every episode."""
    from tetris_piclim_tpu.dqn.train import DQNTrainer

    cfg = TrainConfig(
        env=EnvConfig(L=1, M=8),
        dqn=DQNConfig(batch_size=32, n_step=3, prioritized=True),
        num_envs=16, bank_capacity=16, replay_capacity=2048,
        warmup_steps=64, total_steps=60, log_every=30, seed=0,
    )
    tr = DQNTrainer(cfg)
    out = tr.train(log_fn=None)
    rows = out["history"]
    assert all(np.isfinite(r["loss"]) for r in rows)
    assert int(tr.state.updates_done) > 0
    # PER actually moved priorities off the fresh-write value
    prio = np.asarray(tr.state.replay.priority)
    assert np.unique(prio[: int(tr.state.replay.size)]).size > 1
    ev = tr.evaluate(n_episodes=32)
    assert ev["unfinished"] == 0.0


def test_curriculum_evaluate_levels():
    from tetris_piclim_tpu.dqn.curriculum_train import CurriculumTrainer

    cfg = TrainConfig(
        env=EnvConfig(L=1, M=6),
        dqn=DQNConfig(batch_size=32),
        num_envs=16, bank_capacity=32, replay_capacity=512,
        warmup_steps=32,
    )
    tr = CurriculumTrainer([(1, 6), (2, 10)], cfg=cfg, seed=0)
    tr.train(total_steps=40, chunk=20, log_fn=None)
    rows = tr.evaluate_levels(episodes_per_level=32)
    assert [r["level"] for r in rows] == [0, 1]
    assert rows[0]["L"] == 1 and rows[1]["M"] == 10
    for row in rows:
        assert 0.0 <= row["win_rate"] <= 1.0
        assert row["win_rate"] + row["loss_rate"] == pytest.approx(1.0)
