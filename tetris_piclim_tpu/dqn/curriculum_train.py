"""Curriculum DQN trainer: per-env (L, M) levels with win-rate promotion.

Realizes BASELINE.json config 4 ("curriculum sweep over (L, M, initial-config
density) with per-env termination/auto-reset") end-to-end: one compiled chunk
trains a heterogeneous population — each env carries its own lines-goal /
move-limit and resets from the bank of ITS level — and between chunks the
host promotes a fraction of envs whose level cleared a win-rate threshold.
The level array is an ordinary jit argument, so promotion never recompiles.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..gen import curriculum as cur_lib
from ..models.qnet import ACTION_DIM, QNetwork
from ..ops import bitboard
from ..utils.config import TrainConfig
from . import agent as agent_lib
from . import replay as replay_lib


class CurriculumState(NamedTuple):
    params: dict
    target_params: dict
    opt_state: tuple
    replay: replay_lib.ReplayState
    env: bitboard.PackedState
    key: jax.Array
    global_step: jax.Array


class CurriculumTrainer:
    def __init__(
        self,
        levels: Sequence[tuple[int, int]],
        cfg: Optional[TrainConfig] = None,
        seed: int = 0,
        net=None,
    ) -> None:
        self.levels = list(levels)
        self.cfg = cfg or TrainConfig()
        self.n_levels = len(levels)
        key = jax.random.PRNGKey(seed)
        key, k_bank, k_env, k_init = jax.random.split(key, 4)

        self.bank = cur_lib.build_curriculum_bank(
            k_bank, levels, capacity=self.cfg.bank_capacity
        )
        n = self.cfg.num_envs
        self.level = np.zeros(n, dtype=np.int64)  # everyone starts easy
        env = cur_lib.make_states(
            self.bank, jnp.asarray(self.level, jnp.int32), k_env
        )

        # any flax module with apply(params, obs[N, 217]) -> q[N, 14|40]
        # works (e.g. models.convnet.ConvQNetwork, dueling/joint variants)
        self.net = net if net is not None else QNetwork(action_dim=ACTION_DIM)
        self.apply_fn = self.net.apply
        params = self.net.init(k_init, jnp.zeros((1, 217), jnp.float32))
        self.optimizer = agent_lib.make_optimizer(self.cfg.dqn)
        self.state = CurriculumState(
            params=params,
            target_params=params,
            opt_state=self.optimizer.init(params),
            replay=replay_lib.replay_init(self.cfg.replay_capacity),
            env=env,
            key=key,
            global_step=jnp.int32(0),
        )
        self._rng = np.random.default_rng(seed)
        self._chunk = jax.jit(self._chunk_impl, static_argnames=("n_steps",))

    def _chunk_impl(self, ts: CurriculumState, bank, level, n_steps: int):
        dqn = self.cfg.dqn
        K = self.n_levels

        def learn(args):
            params, target_params, opt_state, rpl, k, beta = args

            def one(carry, kk):
                params, target_params, opt_state, rpl = carry
                params, target_params, opt_state, rpl, aux = (
                    agent_lib.learner_update(
                        params, target_params, opt_state, rpl, kk,
                        apply_fn=self.apply_fn,
                        optimizer=self.optimizer,
                        cfg=dqn,
                        step_gap=self.cfg.num_envs,
                        beta=beta,
                    )
                )
                return (params, target_params, opt_state, rpl), aux["loss"]

            keys = jax.random.split(k, self.cfg.updates_per_step)
            (params, target_params, opt_state, rpl), losses = jax.lax.scan(
                one, (params, target_params, opt_state, rpl), keys
            )
            return params, target_params, opt_state, rpl, losses.mean()

        def skip(args):
            params, target_params, opt_state, rpl, _, _ = args
            return params, target_params, opt_state, rpl, jnp.float32(0)

        def body(ts: CurriculumState, _):
            key, k_act, k_step, k_sample = jax.random.split(ts.key, 4)
            obs = bitboard.observe_batch(ts.env)
            eps = agent_lib.eps_schedule(ts.global_step, dqn)
            rot, col = agent_lib.select_actions(
                self.apply_fn, ts.params, obs, eps, k_act
            )
            next_env, res = cur_lib.step_autoreset_curriculum(
                ts.env, rot, col, bank, level, k_step
            )
            lost = res.done & ~res.won
            reward = (
                res.lines_delta.astype(jnp.float32) * self.cfg.env.reward_per_line
                + res.won.astype(jnp.float32) * self.cfg.env.win_reward
                + lost.astype(jnp.float32) * self.cfg.env.loss_reward
            )
            rpl = replay_lib.replay_add(
                ts.replay, ts.env, rot, col, reward, res.state, res.done
            )
            min_size = (
                max(self.cfg.warmup_steps, dqn.batch_size)
                + (dqn.n_step - 1) * self.cfg.num_envs
            )
            beta = agent_lib.per_beta_schedule(
                ts.global_step, dqn, self.cfg.total_steps
            )
            params, target_params, opt_state, rpl, loss = jax.lax.cond(
                rpl.size >= min_size,
                learn, skip,
                (ts.params, ts.target_params, ts.opt_state, rpl,
                 k_sample, beta),
            )
            # per-level episode / win tallies
            eps_l = jax.ops.segment_sum(
                res.done.astype(jnp.int32), level, num_segments=K
            )
            wins_l = jax.ops.segment_sum(
                res.won.astype(jnp.int32), level, num_segments=K
            )
            new_ts = CurriculumState(
                params, target_params, opt_state, rpl, next_env, key,
                ts.global_step + 1,
            )
            return new_ts, (eps_l, wins_l, loss)

        ts, (eps_l, wins_l, losses) = jax.lax.scan(
            body, ts, None, length=n_steps
        )
        return ts, eps_l.sum(axis=0), wins_l.sum(axis=0), losses.mean()

    def evaluate_levels(self, episodes_per_level: int = 256, key=None) -> list[dict]:
        """Greedy-policy win rate measured separately at EVERY level (not
        just the levels envs currently train on): each level gets
        ``episodes_per_level`` fresh single-episode envs from its own bank,
        rolled out frozen (no auto-reset) for max(M)+1 steps so every episode
        terminates. Closes the train-time-win-rates-only gap."""
        key = key if key is not None else jax.random.PRNGKey(1234)
        max_m = max(m for (_, m) in self.levels)
        out = []
        for k_level in range(self.n_levels):
            key, k_env = jax.random.split(key)
            lvl = jnp.full((episodes_per_level,), k_level, jnp.int32)
            env = cur_lib.make_states(self.bank, lvl, k_env)
            final = self._eval_rollout(self.state.params, env, max_m + 1)
            status = np.asarray(final.status)
            out.append(
                {
                    "level": k_level,
                    "L": self.levels[k_level][0],
                    "M": self.levels[k_level][1],
                    "episodes": episodes_per_level,
                    "win_rate": float((status == 1).mean()),
                    "loss_rate": float((status == 2).mean()),
                }
            )
        return out

    @partial(jax.jit, static_argnums=(0, 3))
    def _eval_rollout(self, params, env: bitboard.PackedState, n_steps: int):
        def body(env, _):
            obs = bitboard.observe_batch(env)
            rot, col = agent_lib.select_actions(
                self.apply_fn, params, obs,
                jnp.float32(0.0), jax.random.PRNGKey(0),
            )
            res = bitboard.step(env, rot, col)
            keep = env.status != 0
            nxt = jax.tree.map(
                lambda a, b: jnp.where(
                    keep.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
                ),
                env, res.state,
            )
            return nxt, None

        env, _ = jax.lax.scan(body, env, None, length=n_steps)
        return env

    def train(
        self,
        total_steps: int,
        chunk: int = 500,
        threshold: float = 0.7,
        fraction: float = 0.5,
        log_fn=print,
    ) -> list[dict]:
        history = []
        done = 0
        while done < total_steps:
            n = min(chunk, total_steps - done)
            lvl = jnp.asarray(self.level, jnp.int32)
            self.state, eps_l, wins_l, loss = self._chunk(
                self.state, self.bank, lvl, n_steps=n
            )
            jax.block_until_ready(self.state.params)
            done += n
            eps_np = np.asarray(eps_l)
            wins_np = np.asarray(wins_l)
            win_rate = wins_np / np.maximum(eps_np, 1)
            self.level = cur_lib.promote_levels(
                self.level, win_rate, self.n_levels,
                threshold=threshold, fraction=fraction, rng=self._rng,
            )
            dist = np.bincount(self.level, minlength=self.n_levels)
            row = {
                "step": done,
                "loss": float(loss),
                "win_rate_per_level": [round(float(w), 3) for w in win_rate],
                "level_distribution": dist.tolist(),
            }
            history.append(row)
            if log_fn:
                log_fn(
                    f"[{done:>6}] loss={row['loss']:.4f} "
                    f"wr={row['win_rate_per_level']} dist={row['level_distribution']}"
                )
        return history
