"""Demonstration-augmented training (round-5).

The reference's solvers PRODUCE winning action sequences — the DFS returns
``move_stack`` (reference: game/tetris_algo_main/TetrisSolver.py:140) and the
carver records its solution (reference: game/tetris.py:156, 259-260) — but
its trainer stub never existed to consume them. Here the device beam prover's
recorded solutions (gen/jax_forward.py sol_rot/sol_loc) are replayed through
the engine into a persistent demo buffer sampled by the learner.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tetris_piclim_tpu.dqn.train import DQNTrainer
from tetris_piclim_tpu.utils.config import DQNConfig, EnvConfig, TrainConfig


def _cfg(**kw):
    base = dict(
        env=EnvConfig(L=1, M=8),
        dqn=DQNConfig(batch_size=32),
        num_envs=32,
        bank_capacity=64,
        replay_capacity=4096,
        warmup_steps=64,
        total_steps=200,
        log_every=50,
        demo_every=2,
        demo_ratio=0.25,
        demo_rows=64,
        demo_capacity=512,
    )
    base.update(kw)
    return TrainConfig(**base)


class TestDemoBuffer:
    def test_refresh_fills_buffer_with_winning_transitions(self):
        tr = DQNTrainer(_cfg())
        tr._refresh_demo(jax.random.PRNGKey(0))
        d = tr._demo
        assert int(d.size) == 512
        rewards = np.asarray(d.reward)
        dones = np.asarray(d.done)
        # the even-stride selection must include terminal (winning)
        # transitions, not only early timesteps
        assert dones.any()
        assert rewards.max() >= tr.cfg.env.win_reward

    def test_demo_transitions_replay_only_solution_moves(self):
        """Every demo transition's action comes from a recorded solution:
        rewards are never the loss penalty (proven trajectories end in WIN,
        and invalid steps are masked out)."""
        tr = DQNTrainer(_cfg())
        tr._refresh_demo(jax.random.PRNGKey(1))
        rewards = np.asarray(tr._demo.reward)
        assert rewards.min() > tr.cfg.env.loss_reward

    def test_train_runs_with_demo_sampling(self):
        tr = DQNTrainer(_cfg())
        out = tr.train(total_steps=120, log_fn=None)
        assert len(out["history"]) >= 1
        assert int(tr.state.updates_done) > 0
        # the demo buffer was built (refresh at chunk 0)
        assert int(tr._demo.size) == 512

    def test_demo_incompatible_with_per(self):
        import pytest

        with pytest.raises(ValueError, match="PER"):
            DQNTrainer(_cfg(dqn=DQNConfig(batch_size=32, prioritized=True)))

    def test_demo_off_leaves_trainer_unchanged(self):
        tr = DQNTrainer(_cfg(demo_every=0))
        assert tr._demo is None
        assert tr._demo_n == 0


class TestAmsgradBf16:
    def test_bf16_state_matches_f32_direction(self):
        """The bf16-moment AMSGrad produces (nearly) the same update as the
        f32 optax one — only the storage precision differs."""
        from tetris_piclim_tpu.dqn import agent as agent_lib

        params = {
            "w": jnp.array([[1.0, -2.0], [3.0, 4.0]]),
            "b": jnp.array([0.1, -0.1]),
        }
        grads = {
            "w": jnp.array([[0.1, 0.2], [-0.3, 0.05]]),
            "b": jnp.array([0.01, -0.02]),
        }
        outs = []
        for bf16 in (False, True):
            opt = agent_lib.make_optimizer(DQNConfig(opt_state_bf16=bf16))
            st = opt.init(params)
            for _ in range(3):
                up, st = opt.update(grads, st, params)
            outs.append(up)
        for k in outs[0]:
            np.testing.assert_allclose(
                np.asarray(outs[0][k]), np.asarray(outs[1][k]),
                rtol=0.02, atol=1e-6,
            )

    def test_bf16_state_dtype(self):
        from tetris_piclim_tpu.dqn import agent as agent_lib

        params = {"w": jnp.ones((4, 4))}
        opt = agent_lib.make_optimizer(DQNConfig(opt_state_bf16=True))
        st = opt.init(params)
        assert st[0].mu["w"].dtype == jnp.bfloat16
        assert st[0].nu["w"].dtype == jnp.bfloat16
        assert st[0].nu_max["w"].dtype == jnp.bfloat16
