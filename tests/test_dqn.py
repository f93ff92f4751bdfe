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


def _states(n, fill_col=0):
    from tetris_piclim_tpu.ops import bitboard

    boards = jnp.zeros((n, 20, 10), bool).at[:, 19, fill_col].set(True)
    pieces = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int8) % 7, (n, 8))
    return bitboard.make_state_batch(boards, pieces, 2, 7)


def test_replay_ring_semantics():
    r = replay_lib.replay_init(8)
    s = _states(4)
    add = jax.jit(replay_lib.replay_add)
    r = add(r, s, jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
            jnp.arange(4, dtype=jnp.float32), s, jnp.zeros(4, bool))
    assert int(r.size) == 4 and int(r.pos) == 4
    r = add(r, s, jnp.ones(4, jnp.int32), jnp.ones(4, jnp.int32),
            jnp.arange(4, dtype=jnp.float32) + 100, s, jnp.ones(4, bool))
    assert int(r.size) == 8 and int(r.pos) == 0
    r = add(r, s, jnp.ones(4, jnp.int32), jnp.ones(4, jnp.int32),
            jnp.arange(4, dtype=jnp.float32) + 200, s, jnp.ones(4, bool))
    assert int(r.size) == 8 and int(r.pos) == 4  # wrapped, overwrote slots 0-3
    np.testing.assert_allclose(
        np.asarray(r.reward), [200, 201, 202, 203, 100, 101, 102, 103]
    )
    # non-divisible write is rejected at trace time
    with pytest.raises(ValueError, match="multiple"):
        replay_lib.replay_add(
            replay_lib.replay_init(10), _states(4),
            jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
            jnp.zeros(4), _states(4), jnp.zeros(4, bool),
        )


def test_replay_sample_reconstructs_observation():
    """Sampled obs must equal what observe() produced at write time."""
    from tetris_piclim_tpu.ops import bitboard

    r = replay_lib.replay_init(8)
    s = _states(8, fill_col=3)
    obs_direct = bitboard.observe_batch(s)
    r = replay_lib.replay_add(
        r, s, jnp.zeros(8, jnp.int32), jnp.zeros(8, jnp.int32),
        jnp.zeros(8), s, jnp.zeros(8, bool),
    )
    batch = replay_lib.replay_sample(r, jax.random.PRNGKey(0), 16)
    # every sampled row must match one of the written observations
    for row in np.asarray(batch.obs):
        diffs = np.abs(np.asarray(obs_direct) - row[None]).sum(axis=1)
        assert diffs.min() < 1e-6


def test_factored_q_math():
    q = jnp.array([[1.0, 3.0, 2.0, 0.0,   # rot branch, max @1
                    0., 0., 5., 0., 0., 0., 0., 0., 0., 1.]])  # col branch, max @2
    rot, col = FactoredQ.greedy(q)
    assert int(rot[0]) == 1 and int(col[0]) == 2
    assert float(FactoredQ.max_value(q)[0]) == 8.0
    assert float(FactoredQ.gather(q, jnp.array([2]), jnp.array([9]))[0]) == 3.0


def test_joint_q_math():
    from tetris_piclim_tpu.models.qnet import JOINT_DIM, JointQ, q_ops

    q = jnp.zeros((1, JOINT_DIM)).at[0, 17].set(5.0)  # rot 1, col 7
    rot, col = JointQ.greedy(q)
    assert int(rot[0]) == 1 and int(col[0]) == 7
    assert float(JointQ.max_value(q)[0]) == 5.0
    assert float(JointQ.gather(q, jnp.array([1]), jnp.array([7]))[0]) == 5.0
    assert float(JointQ.gather(q, jnp.array([0]), jnp.array([0]))[0]) == 0.0
    assert q_ops(JOINT_DIM) is JointQ
    assert q_ops(14) is FactoredQ
    with pytest.raises(ValueError):
        q_ops(21)


def test_joint_head_trains_smoke():
    """The 40-way joint head works end-to-end through the fused trainer
    (select_actions / td_loss dispatch on head width)."""
    from tetris_piclim_tpu.dqn.train import DQNTrainer
    from tetris_piclim_tpu.models.qnet import JOINT_DIM, QNetwork

    cfg = TrainConfig(
        env=EnvConfig(L=1, M=8),
        num_envs=32, bank_capacity=32, replay_capacity=4096,
        warmup_steps=128, total_steps=120, log_every=60, seed=0,
    )
    tr = DQNTrainer(cfg, net=QNetwork(joint=True, dueling=True))
    q = tr.apply_fn(tr.state.params, jnp.zeros((1, OBS_DIM)))
    assert q.shape[-1] == JOINT_DIM
    out = tr.train(log_fn=None)
    assert all(np.isfinite(r["loss"]) for r in out["history"])
    ev = tr.evaluate(n_episodes=64)
    assert ev["unfinished"] == 0.0


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


def test_double_vs_vanilla_td_targets():
    """double_dqn=True evaluates the ONLINE argmax action under the TARGET
    net; False takes the target net's own max. With distinct online/target
    params the two targets must differ, and the vanilla bootstrap must be
    >= the double one under the same target net (max dominates any gather)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    net, params = init_qnet(k1)
    _, target_params = init_qnet(k2)
    obs = jax.random.uniform(jax.random.PRNGKey(4), (8, OBS_DIM))
    b = replay_lib.Batch(
        obs=obs,
        rot=jnp.zeros((8,), jnp.int32),
        col=jnp.zeros((8,), jnp.int32),
        reward=jnp.zeros((8,)),
        next_obs=obs,
        done=jnp.zeros((8,), bool),
    )
    q_t = net.apply(target_params, b.next_obs)
    q_o = net.apply(params, b.next_obs)
    a_rot, a_col = FactoredQ.greedy(q_o)
    double_val = np.asarray(FactoredQ.gather(q_t, a_rot, a_col))
    vanilla_val = np.asarray(FactoredQ.max_value(q_t))
    assert (vanilla_val >= double_val - 1e-6).all()
    assert not np.allclose(vanilla_val, double_val)

    # the losses the learner actually computes pick up exactly these targets
    cfg_d = DQNConfig(double_dqn=True)
    cfg_v = DQNConfig(double_dqn=False)
    _, aux_d = agent_lib.td_loss(params, target_params, net.apply, b, cfg_d)
    _, aux_v = agent_lib.td_loss(params, target_params, net.apply, b, cfg_v)
    q = net.apply(params, b.obs)
    qc = np.asarray(FactoredQ.gather(q, b.rot, b.col))
    np.testing.assert_allclose(
        float(aux_d["td_abs"]),
        np.abs(qc - cfg_d.gamma * double_val).mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(aux_v["td_abs"]),
        np.abs(qc - cfg_v.gamma * vanilla_val).mean(), rtol=1e-5)


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
        # carve-only bank: this test asserts LEARNING at a tiny CPU budget;
        # the mixed-family default makes the task family strictly harder
        # (forward boards have no prepared near-complete line)
        bank_carve_fraction=1.0,
    )
    tr = DQNTrainer(cfg)
    before = tr.evaluate(n_episodes=512)["win_rate"]
    tr.train(log_fn=None)
    after = tr.evaluate(n_episodes=512)["win_rate"]
    assert after > before + 0.1, f"no learning: {before:.3f} -> {after:.3f}"
    assert after > 0.15


def test_conv_qnetwork_forward_and_trains():
    from tetris_piclim_tpu.models.convnet import ConvQNetwork
    from tetris_piclim_tpu.dqn.train import DQNTrainer

    net = ConvQNetwork()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, OBS_DIM)))
    q = net.apply(params, jnp.zeros((5, OBS_DIM)))
    assert q.shape == (5, 14)

    cfg = TrainConfig(
        env=EnvConfig(L=1, M=6),
        dqn=DQNConfig(batch_size=32),
        num_envs=16, bank_capacity=16, replay_capacity=256,
        warmup_steps=32, total_steps=20, log_every=10, seed=0,
    )
    tr = DQNTrainer(cfg, net=net)
    out = tr.train(log_fn=None)
    assert np.isfinite(out["history"][-1]["loss"])


def test_array_backend_trainer_smoke():
    from tetris_piclim_tpu.dqn.train import DQNTrainer

    cfg = TrainConfig(
        env=EnvConfig(L=1, M=6),
        dqn=DQNConfig(batch_size=32),
        num_envs=16, bank_capacity=16, replay_capacity=256,
        warmup_steps=32, total_steps=20, log_every=10, seed=0,
    )
    tr = DQNTrainer(cfg, backend="array")
    out = tr.train(log_fn=None)
    assert np.isfinite(out["history"][-1]["loss"])
    ev = tr.evaluate(n_episodes=32)
    assert ev["unfinished"] == 0.0


def test_backends_train_identically():
    """Same seed -> bit-identical training on the array and bitboard
    backends: both use the same RNG streams and step-equivalent engines, so
    the learned parameters must match exactly."""
    from tetris_piclim_tpu.dqn.train import DQNTrainer

    def run(backend):
        cfg = TrainConfig(
            env=EnvConfig(L=1, M=6),
            dqn=DQNConfig(batch_size=32),
            num_envs=16, bank_capacity=16, replay_capacity=256,
            warmup_steps=32, total_steps=30, log_every=30, seed=3,
        )
        tr = DQNTrainer(cfg, backend=backend)
        tr.train(log_fn=None)
        return tr.state.params

    p_bit = run("bitboard")
    p_arr = run("array")
    for a, b in zip(jax.tree.leaves(p_bit), jax.tree.leaves(p_arr)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dueling_head_math_and_trains():
    """dueling_combine preserves the additive factored-Q semantics: the
    joint Q equals V + centered rot/col advantages, and the dueling nets
    train end-to-end."""
    from tetris_piclim_tpu.models.qnet import QNetwork, dueling_combine
    from tetris_piclim_tpu.dqn.train import DQNTrainer

    key = jax.random.PRNGKey(3)
    v = jax.random.normal(key, (5, 1))
    adv = jax.random.normal(jax.random.fold_in(key, 1), (5, 14))
    q = dueling_combine(v, adv)
    assert q.shape == (5, 14)
    joint = FactoredQ.gather(q, jnp.zeros(5, jnp.int32), jnp.zeros(5, jnp.int32))
    a_rot, a_col = adv[:, :4], adv[:, 4:]
    expect = (
        v[:, 0]
        + a_rot[:, 0] - a_rot.mean(-1)
        + a_col[:, 0] - a_col.mean(-1)
    )
    np.testing.assert_allclose(np.asarray(joint), np.asarray(expect), atol=1e-5)

    net = QNetwork(dueling=True)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, OBS_DIM)))
    assert net.apply(params, jnp.zeros((3, OBS_DIM))).shape == (3, 14)

    cfg = TrainConfig(
        env=EnvConfig(L=1, M=6),
        dqn=DQNConfig(batch_size=32),
        num_envs=16, bank_capacity=16, replay_capacity=256,
        warmup_steps=32, total_steps=20, log_every=10, seed=0,
    )
    tr = DQNTrainer(cfg, net=net)
    out = tr.train(log_fn=None)
    assert np.isfinite(out["history"][-1]["loss"])
