"""DQN: replay mechanics, loss math, end-to-end smoke + learning sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_piclim_tpu.dqn import replay as replay_lib
from tetris_piclim_tpu.dqn import agent as agent_lib
from tetris_piclim_tpu.models.qnet import FactoredQ, init_qnet
from tetris_piclim_tpu.utils.config import DQNConfig, EnvConfig, TrainConfig
from tetris_piclim_tpu.engine import OBS_DIM


def test_replay_ring_semantics():
    r = replay_lib.replay_init(8)
    obs = jnp.arange(5, dtype=jnp.float32)[:, None] * jnp.ones((5, OBS_DIM))
    add = jax.jit(replay_lib.replay_add)
    r = add(r, obs, jnp.zeros(5, jnp.int32), jnp.zeros(5, jnp.int32),
            jnp.arange(5, dtype=jnp.float32), obs, jnp.zeros(5, bool))
    assert int(r.size) == 5 and int(r.pos) == 5
    # wrap around
    obs2 = obs + 100
    r = add(r, obs2, jnp.ones(5, jnp.int32), jnp.ones(5, jnp.int32),
            jnp.arange(5, dtype=jnp.float32) + 100, obs2, jnp.ones(5, bool))
    assert int(r.size) == 8 and int(r.pos) == 2
    # slots 5,6,7 hold new entries 0,1,2; slots 0,1 hold new entries 3,4
    np.testing.assert_allclose(np.asarray(r.reward), [103, 104, 2, 3, 4, 100, 101, 102])


def test_factored_q_math():
    q = jnp.array([[1.0, 3.0, 2.0, 0.0,   # rot branch, max @1
                    0., 0., 5., 0., 0., 0., 0., 0., 0., 1.]])  # col branch, max @2
    rot, col = FactoredQ.greedy(q)
    assert int(rot[0]) == 1 and int(col[0]) == 2
    assert float(FactoredQ.max_value(q)[0]) == 8.0
    assert float(FactoredQ.gather(q, jnp.array([2]), jnp.array([9]))[0]) == 3.0


def test_td_loss_terminal_ignores_next():
    key = jax.random.PRNGKey(0)
    net, params = init_qnet(key)
    cfg = DQNConfig()
    b = replay_lib.Batch(
        obs=jnp.zeros((4, OBS_DIM)),
        rot=jnp.zeros((4,), jnp.int32),
        col=jnp.zeros((4,), jnp.int32),
        reward=jnp.ones((4,)),
        next_obs=jnp.ones((4, OBS_DIM)) * 100.0,  # wild next obs
        done=jnp.ones((4,), bool),                # ...but all terminal
    )
    loss, aux = agent_lib.td_loss(params, params, net.apply, b, cfg)
    # target must be exactly reward (=1) since done masks the bootstrap
    q = net.apply(params, b.obs)
    qc = FactoredQ.gather(q, b.rot, b.col)
    expected_td = np.asarray(qc) - 1.0
    np.testing.assert_allclose(float(aux["td_abs"]), np.abs(expected_td).mean(), rtol=1e-5)


def test_eps_schedule_matches_declared_constants():
    cfg = DQNConfig()
    assert float(agent_lib.eps_schedule(jnp.int32(0), cfg)) == pytest.approx(0.9)
    assert float(agent_lib.eps_schedule(jnp.int32(10**9), cfg)) == pytest.approx(0.05)
    mid = float(agent_lib.eps_schedule(jnp.int32(1000), cfg))
    assert mid == pytest.approx(0.05 + 0.85 * np.exp(-1.0), rel=1e-5)


def test_trainer_smoke():
    from tetris_piclim_tpu.dqn.train import DQNTrainer

    cfg = TrainConfig(
        env=EnvConfig(L=1, M=8),
        num_envs=32, bank_capacity=32, replay_capacity=4096,
        warmup_steps=128, total_steps=120, log_every=60, seed=0,
    )
    tr = DQNTrainer(cfg)
    out = tr.train(log_fn=None)
    rows = out["history"]
    assert len(rows) == 2
    assert all(np.isfinite(r["loss"]) for r in rows)
    assert rows[-1]["episodes"] > 0
    ev = tr.evaluate(n_episodes=64)
    assert ev["unfinished"] == 0.0
    assert 0.0 <= ev["win_rate"] <= 1.0


@pytest.mark.slow
def test_learning_improves_win_rate():
    """On the easiest task (L=1), a trained greedy policy must beat the
    untrained one by a clear margin."""
    from tetris_piclim_tpu.dqn.train import DQNTrainer

    cfg = TrainConfig(
        env=EnvConfig(L=1, M=10),
        num_envs=128, bank_capacity=128, replay_capacity=32768,
        warmup_steps=500, total_steps=4000, log_every=1000, seed=1,
    )
    tr = DQNTrainer(cfg)
    before = tr.evaluate(n_episodes=512)["win_rate"]
    tr.train(log_fn=None)
    after = tr.evaluate(n_episodes=512)["win_rate"]
    assert after > before + 0.1, f"no learning: {before:.3f} -> {after:.3f}"
    assert after > 0.15
