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

    def test_demo_targets_are_mc_returns_not_bootstraps(self):
        """Demo rows carry Monte-Carlo returns-to-go with done=True — the
        learner must never bootstrap off expert states (TD-bootstrapped
        demos diverged: results/train_r5_L10demo.log, loss 0.08 -> 1e4)."""
        tr = DQNTrainer(_cfg())
        tr._refresh_demo(jax.random.PRNGKey(3))
        d = tr._demo
        n = int(d.size)
        assert np.asarray(d.done)[:n].all()
        r = np.asarray(d.reward)[:n]
        # every trajectory is proven to WIN: the discounted return-to-go is
        # strictly positive everywhere and at least gamma^M * win_reward
        gamma, M = tr.cfg.dqn.gamma, tr.cfg.env.M
        assert r.min() >= (gamma ** M) * tr.cfg.env.win_reward - 1e-6
        # and bounded by the best possible undiscounted return
        assert r.max() <= tr.cfg.env.win_reward + M * 4.0 * tr.cfg.env.reward_per_line

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


class TestDemoMargin:
    """DQfD large-margin term (Hester et al. 2018 eq. 2) on demo samples."""

    def test_margin_max_matches_bruteforce_both_heads(self):
        from tetris_piclim_tpu.models.qnet import (
            ACTION_DIM, JOINT_DIM, NUM_COL, NUM_ROT, q_ops,
        )

        rng = np.random.default_rng(0)
        rot = jnp.array(rng.integers(0, NUM_ROT, 16), jnp.int32)
        col = jnp.array(rng.integers(0, NUM_COL, 16), jnp.int32)
        margin = 0.8
        for width in (ACTION_DIM, JOINT_DIM):
            q = jnp.array(rng.normal(size=(16, width)), jnp.float32)
            ops = q_ops(width)
            got = np.asarray(ops.margin_max(q, rot, col, margin))
            # brute force over the 40 joint actions
            want = np.empty(16, np.float32)
            qn = np.asarray(q)
            for i in range(16):
                best = -np.inf
                for r in range(NUM_ROT):
                    for c in range(NUM_COL):
                        if width == ACTION_DIM:
                            v = qn[i, r] + qn[i, NUM_ROT + c]
                        else:
                            v = qn[i, r * NUM_COL + c]
                        if not (r == int(rot[i]) and c == int(col[i])):
                            v += margin
                        best = max(best, v)
                want[i] = best
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_margin_loss_zero_when_expert_dominates(self):
        """J_E = mean(margin_max - gather) is 0 exactly when the expert
        action's Q beats every alternative by >= the margin."""
        from tetris_piclim_tpu.models.qnet import JOINT_DIM, NUM_COL, q_ops

        q = jnp.full((4, JOINT_DIM), -1.0)
        rot = jnp.array([0, 1, 2, 3], jnp.int32)
        col = jnp.array([0, 3, 5, 9], jnp.int32)
        a = rot * NUM_COL + col
        q = q.at[jnp.arange(4), a].set(1.0)  # expert leads by 2.0 > margin
        ops = q_ops(JOINT_DIM)
        j_e = jnp.mean(ops.margin_max(q, rot, col, 0.8) - ops.gather(q, rot, col))
        assert float(j_e) == 0.0
        # and positive when the expert does NOT lead by the margin
        j_e2 = jnp.mean(ops.margin_max(q, rot, col, 3.0) - ops.gather(q, rot, col))
        assert float(j_e2) > 0.0

    def test_train_runs_with_margin_and_logs_finite_loss(self):
        tr = DQNTrainer(_cfg(demo_margin=0.8))
        out = tr.train(total_steps=120, log_fn=None)
        assert len(out["history"]) >= 1
        assert int(tr.state.updates_done) > 0
        assert np.isfinite(float(out["history"][-1]["loss"]))

    def test_margin_pushes_expert_action_up(self):
        """Margin-dominated learner updates on a fixed demo buffer must
        drive the supervised term J_E down (the expert action's Q rises
        relative to the augmented max)."""
        from tetris_piclim_tpu.dqn import agent as agent_lib
        from tetris_piclim_tpu.models.qnet import q_ops

        from tetris_piclim_tpu.dqn import replay as replay_lib

        tr = DQNTrainer(_cfg(demo_margin=0.8))
        tr._refresh_demo(jax.random.PRNGKey(2))
        d = tr._demo
        # a fixed probe batch (the replay stores packed state; obs is
        # reconstructed at sample time)
        probe, _ = replay_lib.replay_sample_ext(
            d, jax.random.PRNGKey(123), 256,
            gamma=tr.cfg.dqn.gamma, n_step=1, step_gap=1, prioritized=False,
        )

        def j_e(params):
            q = tr.apply_fn(params, probe.obs)
            ops = q_ops(q.shape[-1])
            return float(jnp.mean(
                ops.margin_max(q, probe.rot, probe.col, 0.8)
                - ops.gather(q, probe.rot, probe.col)
            ))

        params = tr.state.params
        target = tr.state.target_params
        opt_state = tr.state.opt_state
        j0 = j_e(params)
        # the demo buffer doubles as the env replay (it is a plain replay
        # struct); weight 100 makes the margin term dominate the TD term
        for i in range(30):
            params, target, opt_state, _, aux = agent_lib.learner_update(
                params, target, opt_state, d, jax.random.PRNGKey(i),
                apply_fn=tr.apply_fn, optimizer=tr.optimizer, cfg=tr.cfg.dqn,
                step_gap=1, demo_rpl=d, demo_n=16,
                demo_margin=0.8, demo_margin_weight=100.0,
            )
        assert "demo_margin_loss" in aux
        assert j_e(params) < j0


class TestDemoCheckpointCompat:
    """The demo buffer lives OUTSIDE TrainState, so checkpoints are
    resume-compatible in both directions (docs/ROUND5_NOTES.md): a demo-off
    checkpoint can be resumed with demos on (the round-5 D1 plan), and a
    demo-on checkpoint can be resumed demo-free."""

    def test_demo_off_checkpoint_resumes_with_demos_on(self, tmp_path):
        from tetris_piclim_tpu.utils.checkpoint import (
            restore_train_state, save_train_state)

        tr = DQNTrainer(_cfg(demo_every=0))
        tr.train(log_fn=None)
        step_before = int(tr.state.global_step)
        path = str(tmp_path / "ckpt")
        save_train_state(path, tr.state)

        tr2 = DQNTrainer(_cfg())          # demos ON
        tr2.state = restore_train_state(path, tr2.state)
        tr2.train(total_steps=20, log_fn=None)
        assert int(tr2.state.global_step) == step_before + 20
        assert int(tr2._demo.size) == 512  # buffer built on first chunk

    def test_demo_on_checkpoint_resumes_demo_free(self, tmp_path):
        from tetris_piclim_tpu.utils.checkpoint import (
            restore_train_state, save_train_state)

        tr = DQNTrainer(_cfg())
        tr.train(log_fn=None)
        step_before = int(tr.state.global_step)
        path = str(tmp_path / "ckpt")
        save_train_state(path, tr.state)

        tr2 = DQNTrainer(_cfg(demo_every=0))
        tr2.state = restore_train_state(path, tr2.state)
        tr2.train(total_steps=20, log_fn=None)
        assert int(tr2.state.global_step) == step_before + 20
        assert tr2._demo is None


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
