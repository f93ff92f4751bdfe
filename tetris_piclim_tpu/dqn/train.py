"""DQN trainer — on-device actor-learner loop.

The complete training loop the reference never wrote (its train() stub ends
at model/train.py:27 after constructing the optimizer). One jitted "chunk"
fuses: vmapped epsilon-greedy action selection over N envs -> lockstep env
step with bank auto-reset -> batched replay write -> replay sample ->
TD update -> Polyak target update, scanned ``log_every`` times. The host
only logs metrics and (optionally) refreshes the config bank between chunks
— the bank arrays are ordinary jit arguments, so a refresh never recompiles.
"""

from __future__ import annotations

import time
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import engine
from ..gen.bank import ConfigBank
from ..models.qnet import ACTION_DIM, QNetwork
from ..ops import bitboard
from ..utils.config import TrainConfig
from . import agent as agent_lib
from . import replay as replay_lib


class TrainState(NamedTuple):
    params: dict
    target_params: dict
    opt_state: tuple
    replay: replay_lib.ReplayState
    env: tuple                    # batched env state (backend-specific) [N]
    key: jax.Array
    global_step: jax.Array        # int32 — env steps taken (per-env lockstep)
    updates_done: jax.Array       # int32


class ChunkMetrics(NamedTuple):
    episodes: jax.Array
    wins: jax.Array
    lines: jax.Array
    reward: jax.Array
    loss_sum: jax.Array
    loss_count: jax.Array
    q_mean_sum: jax.Array


def adapt_share(share: float, win_carve: float, win_forward: float) -> float:
    """One adaptive-share controller step: reallocate the forward share of
    the training bank toward the weaker family, proportional to failure
    rates, EMA-smoothed (alpha 0.5) and clipped to [0.1, 0.9]. The +0.05
    floor keeps both families sampled when one saturates at ~100%."""
    target = (1.0 - win_forward + 0.05) / (
        (1.0 - win_carve) + (1.0 - win_forward) + 0.10
    )
    return min(0.9, max(0.1, 0.5 * share + 0.5 * target))


def adapt_share_v2(share: float, win_carve: float, win_forward: float,
                   prior: float = 0.25) -> float:
    """Prior-anchored controller (round-4 finding: pure failure-rate
    equalization over-feeds the intrinsically-harder family by ~3-5 carve
    points on every task where the optimum is the 0.25 prior). Raise the
    share above the prior ONLY while the forward family is weak in
    ABSOLUTE terms (probe < half the carve probe — the regime where the
    misallocation catastrophe lives, e.g. L=2's 34%-forward collapse);
    otherwise decay back to the prior."""
    if win_forward < 0.5 * win_carve:
        target = (1.0 - win_forward + 0.05) / (
            (1.0 - win_carve) + (1.0 - win_forward) + 0.10
        )
    else:
        target = prior
    return min(0.9, max(0.1, 0.5 * share + 0.5 * target))


def height_at(device_height, done_steps: int, total_steps: int) -> int:
    """Graduated forward difficulty: initial_height_max linearly annealed
    from h0 to h1 over the run (None -> the reference's canonical 4,
    tetris_algo_main/main.py:38)."""
    if device_height is None:
        return 4
    h0, h1 = device_height
    frac = done_steps / max(total_steps, 1)
    return int(round(h0 + (h1 - h0) * frac))


class DQNTrainer:
    def __init__(
        self,
        cfg: TrainConfig,
        bank: Optional[ConfigBank] = None,
        backend: str = "bitboard",
        net=None,
        mesh=None,
    ):
        self.cfg = cfg
        # optional jax.sharding.Mesh with a "dp" axis. The XLA chunk needs no
        # mesh plumbing (GSPMD partitions it from the argument shardings, see
        # parallel/mesh.py), but the fused Pallas actor is opaque to GSPMD —
        # with a mesh it runs per-shard under jax.shard_map (batch-parallel:
        # envs sharded, params/bank replicated, metrics psum-reduced).
        self.mesh = mesh
        # any flax module with apply(params, obs[N, 217]) -> q[N, 14] works
        # (e.g. models.convnet.ConvQNetwork)
        self.net = net if net is not None else QNetwork(action_dim=ACTION_DIM)
        self.apply_fn = self.net.apply
        # "bitboard" = packed uint32 production path; "array" = the readable
        # parity-reference engine. Both expose the same batched API.
        self.backend = bitboard if backend == "bitboard" else engine

        if bank is None:
            bank = ConfigBank(
                cfg.env.L, cfg.env.M, capacity=cfg.bank_capacity, seed=cfg.seed
            ).fill(carve_fraction=cfg.bank_carve_fraction)
        self.bank = bank

        key = jax.random.PRNGKey(cfg.seed)
        key, k_init, k_env = jax.random.split(key, 3)
        params = self.net.init(
            k_init, jnp.zeros((1, engine.OBS_DIM), jnp.float32)
        )
        self.optimizer = agent_lib.make_optimizer(cfg.dqn)
        opt_state = self.optimizer.init(params)

        idx = jax.random.randint(
            k_env, (cfg.num_envs,), 0, bank.boards.shape[0]
        )
        env = self.backend.make_state_batch(
            bank.boards[idx], bank.pieces[idx], cfg.env.L, cfg.env.M
        )
        self.state = TrainState(
            params=params,
            target_params=params,
            opt_state=opt_state,
            replay=replay_lib.replay_init(cfg.replay_capacity),
            env=env,
            key=key,
            global_step=jnp.int32(0),
            updates_done=jnp.int32(0),
        )
        if cfg.actor_fusion > 0:
            from ..models.qnet import ACTION_DIM as _AD, JOINT_DIM as _JD
            from ..models.qnet import QNetwork as _QN

            if not (
                isinstance(self.net, _QN)
                and not self.net.dueling
                and self.backend is bitboard
            ):
                raise ValueError(
                    "actor_fusion requires the plain (non-dueling) MLP "
                    "QNetwork on the bitboard backend — the fused kernel "
                    "runs that exact forward in VMEM"
                )
            self._head_dim = _JD if self.net.joint else _AD
            # largest power-of-two tile dividing the (per-shard) env batch,
            # <= 512; under a mesh the kernel sees num_envs/mesh_size envs
            local_envs = cfg.num_envs
            if self.mesh is not None:
                n_dev = self.mesh.shape["dp"]
                if cfg.num_envs % n_dev:
                    raise ValueError(
                        f"num_envs ({cfg.num_envs}) must be divisible by "
                        f"the mesh size ({n_dev}) for actor_fusion"
                    )
                local_envs = cfg.num_envs // n_dev
            if local_envs % 8:
                raise ValueError(
                    f"per-shard env batch ({local_envs}) must be a multiple "
                    "of the minimum fused-actor tile (8)"
                )
            tile = 8
            while tile * 2 <= min(512, local_envs) and local_envs % (tile * 2) == 0:
                tile *= 2
            self._fused_tile = tile
            if jax.default_backend() == "tpu":
                self._fused_interpret = False
            else:  # CPU tests drive the kernel through the interpreter
                from jax.experimental.pallas import tpu as pltpu

                self._fused_interpret = pltpu.InterpretParams()
            self._chunk = jax.jit(
                partial(self._chunk_fused_impl), static_argnames=("n_steps",)
            )
        else:
            self._chunk = jax.jit(
                partial(self._chunk_impl), static_argnames=("n_steps",)
            )

        # demonstration-augmented training (round-5): a persistent buffer of
        # transitions from PROVEN winning trajectories — the solutions the
        # beam prover already records (gen/jax_forward.py sol_rot/sol_loc)
        # and the reference's own DFS returns (TetrisSolver.py:140
        # move_stack) but whose trainer never existed to use them. The
        # buffer lives OUTSIDE TrainState so checkpoints remain
        # resume-compatible with and without demos.
        self._demo = None
        self._demo_n = 0
        if cfg.demo_every > 0:
            if cfg.dqn.prioritized:
                raise ValueError(
                    "demo-augmented training is incompatible with PER "
                    "(priority updates index the env buffer only)"
                )
            if cfg.actor_fusion > 0:
                raise ValueError(
                    "demo-augmented training requires the XLA chunk "
                    "(actor_fusion=0)"
                )
            if self.backend is not bitboard:
                raise ValueError(
                    "demo-augmented training requires the bitboard backend"
                )
            self._demo = replay_lib.replay_init(cfg.demo_capacity)
            self._demo_n = max(
                1, int(round(cfg.dqn.batch_size * cfg.demo_ratio))
            )
            self._demo_rollout = jax.jit(self._demo_rollout_impl)

    # -- core jitted chunk ---------------------------------------------------

    def _reward(self, res: engine.StepResult) -> jax.Array:
        e = self.cfg.env
        lost = res.done & ~res.won
        return (
            res.lines_delta.astype(jnp.float32) * e.reward_per_line
            + res.won.astype(jnp.float32) * e.win_reward
            + lost.astype(jnp.float32) * e.loss_reward
        )

    def _chunk_impl(
        self,
        ts: TrainState,
        bank_boards: jax.Array,
        bank_pieces: jax.Array,
        n_steps: int,
        demo=None,
    ) -> tuple[TrainState, ChunkMetrics]:
        dqn = self.cfg.dqn

        n_upd = max(1, self.cfg.updates_per_step)

        def learn(args):
            params, target_params, opt_state, rpl, k, beta = args

            def one_update(i, carry):
                params, target_params, opt_state, rpl, _, _ = carry
                k_i = jax.random.fold_in(k, i)
                params, target_params, opt_state, rpl, aux = (
                    agent_lib.learner_update(
                        params, target_params, opt_state, rpl, k_i,
                        apply_fn=self.apply_fn,
                        optimizer=self.optimizer,
                        cfg=dqn,
                        step_gap=self.cfg.num_envs,
                        beta=beta,
                        demo_rpl=demo,
                        demo_n=self._demo_n,
                        demo_margin=self.cfg.demo_margin,
                        demo_margin_weight=self.cfg.demo_margin_weight,
                    )
                )
                return (params, target_params, opt_state, rpl,
                        aux["loss"], aux["q_mean"])

            carry = (params, target_params, opt_state, rpl,
                     jnp.float32(0), jnp.float32(0))
            params, target_params, opt_state, rpl, loss, q_mean = (
                jax.lax.fori_loop(0, n_upd, one_update, carry)
            )
            return (params, target_params, opt_state, rpl,
                    loss, q_mean, jnp.int32(n_upd))

        def skip(args):
            params, target_params, opt_state, rpl, _, _ = args
            return (params, target_params, opt_state, rpl,
                    jnp.float32(0), jnp.float32(0), jnp.int32(0))

        def body(ts: TrainState, _):
            key, k_act, k_step, k_sample = jax.random.split(ts.key, 4)
            obs = self.backend.observe_batch(ts.env)
            eps = agent_lib.eps_schedule(ts.global_step, dqn)
            rot, col = agent_lib.select_actions(
                self.apply_fn, ts.params, obs, eps, k_act
            )
            next_env, res = self.backend.step_autoreset_batch(
                ts.env, rot, col, bank_boards, bank_pieces, k_step
            )
            reward = self._reward(res)
            # replay stores packed states; the array backend packs on the fly
            if self.backend is bitboard:
                s_before, s_after = ts.env, res.state
            else:
                s_before = bitboard.from_env_state(ts.env)
                s_after = bitboard.from_env_state(res.state)
            rpl = replay_lib.replay_add(
                ts.replay, s_before, rot, col, reward, s_after, res.done
            )
            # learning starts once the warmup is met AND every sampled n-step
            # chain can be fully resolved ((n-1)*num_envs newer transitions)
            min_size = (
                max(self.cfg.warmup_steps, dqn.batch_size)
                + (dqn.n_step - 1) * self.cfg.num_envs
            )
            beta = agent_lib.per_beta_schedule(
                ts.global_step, dqn, self.cfg.total_steps
            )
            params, target_params, opt_state, rpl, loss, q_mean, did = (
                jax.lax.cond(
                    rpl.size >= min_size,
                    learn,
                    skip,
                    (ts.params, ts.target_params, ts.opt_state, rpl,
                     k_sample, beta),
                )
            )
            new_ts = TrainState(
                params=params,
                target_params=target_params,
                opt_state=opt_state,
                replay=rpl,
                env=next_env,
                key=key,
                global_step=ts.global_step + 1,
                updates_done=ts.updates_done + did,
            )
            step_m = ChunkMetrics(
                episodes=res.done.sum().astype(jnp.int32),
                wins=res.won.sum().astype(jnp.int32),
                lines=res.lines_delta.sum().astype(jnp.int32),
                reward=reward.sum(),
                loss_sum=loss,
                loss_count=did,
                q_mean_sum=q_mean,
            )
            return new_ts, step_m

        ts, ms = jax.lax.scan(body, ts, None, length=n_steps)
        totals = ChunkMetrics(*[m.sum(axis=0) for m in ms])
        return ts, totals

    def _chunk_fused_impl(
        self,
        ts: TrainState,
        bank_boards: jax.Array,   # uint32[B, 10] packed
        bank_pieces: jax.Array,
        n_steps: int,
    ) -> tuple[TrainState, ChunkMetrics]:
        """Fused-actor chunk: the Pallas actor kernel runs K env steps with
        VMEM-resident weights/state, then the learner runs K * updates_per_step
        updates on the recorded transitions. Policy lag is K steps (vs 1 in
        :meth:`_chunk_impl`) — at K=8-16 a fraction of replay staleness.

        The kernel resets from a KB-row window of the bank, sliding randomly
        per phase: a [tile, B] one-hot over the full 4096-row bank would blow
        VMEM, and with per-chunk device regeneration the window loses no
        diversity."""
        from ..ops.pallas_actor import actor_rollout_fused

        dqn = self.cfg.dqn
        e = self.cfg.env
        K = self.cfg.actor_fusion
        outer = n_steps // K
        assert outer * K == n_steps, (n_steps, K)
        n_upd = max(1, self.cfg.updates_per_step) * K
        B = bank_boards.shape[0]
        KB = min(256, B)

        def learn(args):
            params, target_params, opt_state, rpl, k, beta = args

            def one_update(i, carry):
                params, target_params, opt_state, rpl, _, _ = carry
                k_i = jax.random.fold_in(k, i)
                params, target_params, opt_state, rpl, aux = (
                    agent_lib.learner_update(
                        params, target_params, opt_state, rpl, k_i,
                        apply_fn=self.apply_fn,
                        optimizer=self.optimizer,
                        cfg=dqn,
                        step_gap=self.cfg.num_envs,
                        beta=beta,
                    )
                )
                return (params, target_params, opt_state, rpl,
                        aux["loss"], aux["q_mean"])

            carry = (params, target_params, opt_state, rpl,
                     jnp.float32(0), jnp.float32(0))
            params, target_params, opt_state, rpl, loss, q_mean = (
                jax.lax.fori_loop(0, n_upd, one_update, carry)
            )
            return (params, target_params, opt_state, rpl,
                    loss, q_mean, jnp.int32(n_upd))

        def skip(args):
            params, target_params, opt_state, rpl, _, _ = args
            return (params, target_params, opt_state, rpl,
                    jnp.float32(0), jnp.float32(0), jnp.int32(0))

        def body(ts: TrainState, _):
            key, k_seed, k_off, k_sample = jax.random.split(ts.key, 4)
            off = jax.random.randint(k_off, (), 0, B - KB + 1)
            sub_cols = jax.lax.dynamic_slice(bank_boards, (off, 0), (KB, 10))
            sub_pieces = jax.lax.dynamic_slice(
                bank_pieces, (off, 0), (KB, bank_pieces.shape[1])
            )
            seed = jax.random.randint(k_seed, (), 0, 2**31 - 1)

            def run_fused(env, params, sub_cols, sub_pieces, global_step,
                          seed):
                return actor_rollout_fused(
                    env, params, sub_cols, sub_pieces, global_step, seed,
                    eps_start=dqn.eps_start, eps_end=dqn.eps_end,
                    eps_decay=dqn.eps_decay,
                    head_dim=self._head_dim, n_steps=K,
                    tile=self._fused_tile,
                    interpret=self._fused_interpret,
                )

            if self.mesh is None:
                env, trans, episodes, wins = run_fused(
                    ts.env, ts.params, sub_cols, sub_pieces,
                    ts.global_step, seed,
                )
            else:
                # Pallas is opaque to GSPMD: run the kernel per-shard.
                # Envs are batch-sharded, weights + bank window replicated
                # (same layout as the XLA path, parallel/mesh.py); per-shard
                # seeds are decorrelated, episode/win counts psum-reduced so
                # every shard returns the global totals.
                from jax.sharding import PartitionSpec as _P

                def sharded(env, params, sub_cols, sub_pieces, global_step,
                            seed):
                    seed = seed + jax.lax.axis_index("dp") * 7919
                    env, trans, episodes, wins = run_fused(
                        env, params, sub_cols, sub_pieces, global_step, seed
                    )
                    return (
                        env, trans,
                        jax.lax.psum(episodes, "dp"),
                        jax.lax.psum(wins, "dp"),
                    )

                env, trans, episodes, wins = jax.shard_map(
                    sharded, mesh=self.mesh,
                    in_specs=(_P("dp"), _P(), _P(), _P(), _P(), _P()),
                    out_specs=(_P("dp"), _P(None, "dp"), _P(), _P()),
                    check_vma=False,
                )(ts.env, ts.params, sub_cols, sub_pieces,
                  ts.global_step, seed)
            lost = trans.done & ~trans.won
            reward = (
                trans.lines_delta.astype(jnp.float32) * e.reward_per_line
                + trans.won.astype(jnp.float32) * e.win_reward
                + lost.astype(jnp.float32) * e.loss_reward
            )                                           # [K, N]
            rpl = ts.replay
            for k in range(K):
                rpl = replay_lib.replay_add_fields(
                    rpl, trans.cols[k], trans.cur[k], trans.nxt[k],
                    trans.lines_left[k], trans.moves_left[k],
                    trans.rot[k], trans.col[k], reward[k], trans.done[k],
                    trans.n_cols[k], trans.n_cur[k], trans.n_nxt[k],
                    trans.n_lines_left[k], trans.n_moves_left[k],
                    trans.n_status[k],
                )
            min_size = (
                max(self.cfg.warmup_steps, dqn.batch_size)
                + (dqn.n_step - 1) * self.cfg.num_envs
            )
            beta = agent_lib.per_beta_schedule(
                ts.global_step, dqn, self.cfg.total_steps
            )
            params, target_params, opt_state, rpl, loss, q_mean, did = (
                jax.lax.cond(
                    rpl.size >= min_size,
                    learn,
                    skip,
                    (ts.params, ts.target_params, ts.opt_state, rpl,
                     k_sample, beta),
                )
            )
            new_ts = TrainState(
                params=params,
                target_params=target_params,
                opt_state=opt_state,
                replay=rpl,
                env=env,
                key=key,
                global_step=ts.global_step + K,
                updates_done=ts.updates_done + did,
            )
            step_m = ChunkMetrics(
                episodes=episodes.astype(jnp.int32),
                wins=wins.astype(jnp.int32),
                lines=trans.lines_delta.sum().astype(jnp.int32),
                reward=reward.sum(),
                loss_sum=loss,
                loss_count=did,
                q_mean_sum=q_mean,
            )
            return new_ts, step_m

        ts, ms = jax.lax.scan(body, ts, None, length=outer)
        totals = ChunkMetrics(*[m.sum(axis=0) for m in ms])
        return ts, totals

    # -- demonstration buffer ------------------------------------------------

    def _demo_rollout_impl(
        self,
        boards_packed: jax.Array,   # uint32[D, 10] — prover candidates
        pieces: jax.Array,          # int8[D, M+1]
        sol_rot: jax.Array,         # int8[D, M] — recorded solution
        sol_loc: jax.Array,         # int8[D, M]
        sol_len: jax.Array,         # int32[D] — 0 for unproven candidates
        rpl: replay_lib.ReplayState,
    ) -> replay_lib.ReplayState:
        """Replay recorded winning solutions through the env and write the
        resulting transitions into the demo buffer (full rewrite).

        Every step t < sol_len of a proven candidate is a demonstration
        transition; unproven candidates have sol_len == 0 and contribute
        nothing. The K buffer slots are filled from the valid transitions
        (cycled if there are fewer than K — duplicates are harmless under
        uniform sampling).

        Demo targets are **Monte-Carlo returns-to-go, not TD bootstraps**:
        each stored transition carries ``reward = R_t = sum_k gamma^k
        r_{t+k}`` with ``done = True``, so the learner regresses
        ``Q(s_t, a_t) -> R_t`` directly. The trajectory is proven to end in
        WIN, so the full return is known — there is nothing to bootstrap.
        Bootstrapped demo targets were tried first and diverged
        catastrophically (results/train_r5_L10demo.log: loss 0.08 -> 1e4,
        win rate pinned at 0): 25% of every batch bootstrapping Q(s') on
        expert states the behavior policy never visits is the deadly triad
        in its purest form. R_t is also a lower bound on Q*(s_t, a_t)
        (deterministic env), so the regression is conservative."""
        e = self.cfg.env
        D, M = sol_rot.shape
        K = rpl.cols.shape[0]
        env = bitboard.make_state_batch(
            bitboard.unpack_board(boards_packed), pieces, e.L, e.M
        )

        def body(env, t):
            rot = sol_rot[:, t].astype(jnp.int32)
            col = sol_loc[:, t].astype(jnp.int32)
            valid = (env.status == engine.RUNNING) & (t < sol_len)
            res = bitboard.step_batch(env, rot, col)
            reward = self._reward(res)
            # freeze finished envs (as in evaluate): their further "steps"
            # are masked invalid anyway
            keep = env.status != engine.RUNNING
            nxt = jax.tree.map(
                lambda a, b: jnp.where(
                    keep.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
                ),
                env, res.state,
            )
            out = (env, rot.astype(jnp.int8), col.astype(jnp.int8),
                   reward, res.state, res.done, valid)
            return nxt, out

        _, outs = jax.lax.scan(body, env, jnp.arange(M))
        s_before, rot, col, reward, s_after, done, valid = outs
        # reverse-scan the per-step rewards into returns-to-go; valid is a
        # per-column prefix (episodes start at t=0), so valid[t+1] gates
        # whether t+1 continues the same proven trajectory
        gamma = self.cfg.dqn.gamma
        v_next = jnp.concatenate(
            [valid[1:], jnp.zeros_like(valid[:1])], axis=0
        )

        def body_rev(r_next, xs):
            r_t, cont = xs
            r_t = r_t + gamma * r_next * cont.astype(jnp.float32)
            return r_t, r_t

        _, returns = jax.lax.scan(
            body_rev, jnp.zeros((D,), jnp.float32), (reward, v_next),
            reverse=True,
        )
        reward = returns
        done = jnp.ones_like(done)  # MC target: no bootstrap on demo rows
        flat = lambda a: a.reshape((M * D,) + a.shape[2:])
        valid_f = flat(valid)
        n_valid = valid_f.sum()
        order = jnp.argsort(~valid_f)          # stable: valid first
        # even stride over ALL valid transitions — taking the first K would
        # keep only early timesteps (the flatten is t-major) and never the
        # winning +reward transitions the demos exist to provide
        pos = (jnp.arange(K) * jnp.maximum(n_valid, 1)) // K
        idx = order[jnp.mod(pos, jnp.maximum(n_valid, 1))]
        take = lambda a: flat(a)[idx]
        new = replay_lib.replay_add(
            rpl,
            jax.tree.map(take, s_before),
            take(rot), take(col), take(reward),
            jax.tree.map(take, s_after),
            take(done),
        )
        return jax.lax.cond(
            n_valid > 0, lambda _: new, lambda _: rpl, None
        )

    def _refresh_demo(
        self, key, initial_height_max: int = 4, beam_width: int = 8
    ) -> None:
        """Generate+prove a fresh forward-family candidate batch and rebuild
        the demo buffer from its recorded winning solutions. Forward-family
        only — that is the family whose reward signal is sparse enough to
        need demonstrations (round-4: L=10 forward held-out stalled at 56%
        while carve reached 94%)."""
        from ..gen.jax_forward import generate_batch_device_jit as fwd_jit

        fb = fwd_jit(
            key, n=self.cfg.demo_rows, L=self.cfg.env.L, M=self.cfg.env.M,
            initial_height_max=initial_height_max, beam_width=beam_width,
        )
        self._demo = self._demo_rollout(
            fb.boards, fb.pieces, fb.rotations, fb.locations, fb.n_moves,
            self._demo,
        )

    def _bank_boards(self) -> jax.Array:
        """Bank boards in the backend's native layout (packed for bitboard)."""
        if self.backend is bitboard:
            return bitboard.pack_board(self.bank.boards)
        return self.bank.boards

    # -- host loop -----------------------------------------------------------

    def train(
        self,
        total_steps: Optional[int] = None,
        log_fn=print,
        refresh_bank: bool = False,
        device_refresh_every: int = 0,
        device_forward_fraction: float = 0.0,
        device_beam_width: int = 8,
        device_height: Optional[tuple[int, int]] = None,
        adaptive_share: bool = False,
        adapt_every: int = 20,
        adapt_episodes: int = 1024,
        adapt_rule: str = "v2",
    ) -> dict:
        """``device_refresh_every=k`` regenerates the carve-family bank rows
        ON DEVICE every k chunks (fresh PRNG key each time) — the training
        distribution becomes effectively infinite, so the policy cannot
        memorize a finite config set (the round-1 failure mode: 97.5%
        train-bank vs 29% held-out). ``device_forward_fraction > 0``
        regenerates that share of the bank as PROVEN on-device
        forward-family configs (gen/jax_forward.py), making BOTH config
        families infinite distributions. ``refresh_bank`` additionally runs
        the two host producer threads (carve + forward generate+prove).

        ``device_height=(h0, h1)`` anneals the forward generator's
        ``initial_height_max`` linearly from h0 to h1 over THIS call's
        steps — a graduated-difficulty curriculum: a taller prefill leaves
        fewer rows for the policy to complete, so the forward family starts
        easy (dense reward) and hardens toward the reference's canonical
        height cap (4; tetris_algo_main/main.py:38). The height is a TRACED
        argument of the device generator (gen/jax_forward.py), so the whole
        anneal reuses one compiled program.

        ``adaptive_share=True`` turns the per-task forward-share dial into
        a closed-loop controller: every ``adapt_every`` chunks the trainer
        evaluates the greedy policy on two fixed PROBE banks (one per
        family, device-generated, disjoint seeds from both the training
        bank and any holdout) and reallocates the forward share of the
        next bank refreshes proportionally to each family's failure rate,
        EMA-smoothed and clipped to [0.1, 0.9]. One recipe, no per-task
        hand tuning (round-3 finding: the best share is task-dependent)."""
        cfg = self.cfg
        total = total_steps if total_steps is not None else cfg.total_steps
        chunk = max(1, min(cfg.log_every, total))
        done_steps = 0
        history = []
        since_ckpt = 0  # periodic checkpointing (cfg.checkpoint_every > 0)
        chunk_i = 0
        bank_keys = np.random.default_rng(cfg.seed + 0xBA4E)
        share = float(device_forward_fraction)
        probe_c = probe_f = None
        if adaptive_share:
            # Fixed probe banks: the controller's measurement set. Fresh
            # device-generated rows under dedicated seeds — NOT the holdout
            # (controller feedback from the holdout would leak it into
            # training decisions) and not the churning training bank.
            probe_c = ConfigBank(
                cfg.env.L, cfg.env.M, capacity=512, seed=cfg.seed + 7001
            ).fill_device(forward_fraction=0.0)
            probe_f = ConfigBank(
                cfg.env.L, cfg.env.M, capacity=512, seed=cfg.seed + 7002
            ).fill_device(
                forward_fraction=1.0, beam_width=device_beam_width
            )
        if refresh_bank:
            self.bank.start_refresh()
        try:
            t0 = time.time()
            while done_steps < total:
                probe = None
                if adaptive_share and chunk_i and chunk_i % adapt_every == 0:
                    k_pc, k_pf = (
                        jax.random.PRNGKey(int(bank_keys.integers(2**31 - 1))),
                        jax.random.PRNGKey(int(bank_keys.integers(2**31 - 1))),
                    )
                    wc = self.evaluate(
                        adapt_episodes, bank=probe_c, key=k_pc
                    )["win_rate"]
                    wf = self.evaluate(
                        adapt_episodes, bank=probe_f, key=k_pf
                    )["win_rate"]
                    if adapt_rule == "v2":
                        share = adapt_share_v2(share, wc, wf)
                    else:
                        share = adapt_share(share, wc, wf)
                    probe = {"probe_carve": wc, "probe_forward": wf}
                if device_refresh_every and chunk_i and (
                    chunk_i % device_refresh_every == 0
                ):
                    height_now = height_at(device_height, done_steps, total)
                    self.bank.refresh_device(
                        jax.random.PRNGKey(int(bank_keys.integers(2**31 - 1))),
                        forward_fraction=share,
                        beam_width=device_beam_width,
                        initial_height_max=height_now,
                    )
                if self._demo is not None and chunk_i % cfg.demo_every == 0:
                    # fresh proven winning trajectories -> demo buffer
                    # (runs at chunk 0 too, so the buffer is never empty
                    # when learning starts)
                    self._refresh_demo(
                        jax.random.PRNGKey(int(bank_keys.integers(2**31 - 1))),
                        initial_height_max=height_at(
                            device_height, done_steps, total
                        ),
                        beam_width=device_beam_width,
                    )
                chunk_i += 1
                n = min(chunk, total - done_steps)
                if self.cfg.actor_fusion > 0:
                    K = self.cfg.actor_fusion
                    n = ((n + K - 1) // K) * K  # kernel phases are K steps
                demo_kw = {"demo": self._demo} if self._demo is not None else {}
                self.state, m = self._chunk(
                    self.state, self._bank_boards(), self.bank.pieces,
                    n_steps=n, **demo_kw
                )
                jax.block_until_ready(self.state.params)
                done_steps += n
                dt = time.time() - t0
                t0 = time.time()
                eps_now = float(
                    agent_lib.eps_schedule(self.state.global_step, cfg.dqn)
                )
                episodes = int(m.episodes)
                row = {
                    "step": done_steps,
                    "env_steps": done_steps * cfg.num_envs,
                    "episodes": episodes,
                    "win_rate": float(m.wins) / max(episodes, 1),
                    "lines": int(m.lines),
                    "reward": float(m.reward),
                    "loss": float(m.loss_sum) / max(int(m.loss_count), 1),
                    "q_mean": float(m.q_mean_sum) / max(int(m.loss_count), 1),
                    "eps": eps_now,
                    "steps_per_s": n * cfg.num_envs / max(dt, 1e-9),
                }
                if refresh_bank:
                    # bank churn: rows replaced so far + family mix
                    row["bank_writes"] = self.bank.refresh_writes
                    row["bank_families"] = self.bank.family_counts
                if device_refresh_every and (
                    adaptive_share or device_height is not None
                ):
                    row["forward_share"] = round(share, 4)
                if probe is not None:
                    row.update(probe)
                history.append(row)
                if log_fn is not None:
                    extra = (
                        f" bank_writes={row['bank_writes']}"
                        f" families={row['bank_families']}"
                        if refresh_bank else ""
                    )
                    if "forward_share" in row:
                        extra += f" share={row['forward_share']:.2f}"
                    if probe is not None:
                        extra += (
                            f" probe_c={probe['probe_carve']:.3f}"
                            f" probe_f={probe['probe_forward']:.3f}"
                        )
                    log_fn(
                        f"[{row['step']:>7}] env_steps={row['env_steps']:.2e} "
                        f"win_rate={row['win_rate']:.3f} loss={row['loss']:.4f} "
                        f"eps={row['eps']:.3f} sps={row['steps_per_s']:.3e}"
                        f"{extra}"
                    )
                since_ckpt += n
                if (
                    cfg.checkpoint_dir
                    and cfg.checkpoint_every > 0
                    and since_ckpt >= cfg.checkpoint_every
                ):
                    self.save_checkpoint()
                    since_ckpt = 0
        finally:
            if refresh_bank:
                self.bank.stop_refresh()
        return {"history": history}

    # -- checkpoint / resume ---------------------------------------------------

    def save_checkpoint(self, path: Optional[str] = None) -> str:
        """Save the full TrainState (params, target, optimizer, replay, env
        states, RNG, counters) under ``path`` or
        ``cfg.checkpoint_dir/step_<global_step>``. The reference has no model
        checkpointing at all (SURVEY.md §5.4)."""
        from ..utils.checkpoint import save_train_state

        if path is None:
            if not self.cfg.checkpoint_dir:
                raise ValueError("no path given and cfg.checkpoint_dir unset")
            path = f"{self.cfg.checkpoint_dir}/step_{int(self.state.global_step)}"
        save_train_state(path, self.state)
        return path

    def restore_checkpoint(self, path: str) -> None:
        """Resume from a checkpoint written by :meth:`save_checkpoint` with
        an identical config shape (num_envs, replay_capacity, model)."""
        from ..utils.checkpoint import restore_train_state

        self.state = restore_train_state(path, self.state)

    def warm_start(self, path: str) -> None:
        """Load ONLY network weights (params + target) from a checkpoint,
        keeping fresh optimizer/replay/env/counters — curriculum transfer:
        warm-start a harder (L, M) task from an easier task's weights. The
        source run may differ in num_envs, replay capacity, and task; the
        model architecture must match."""
        from ..utils.checkpoint import restore_params

        params, target_params = restore_params(path)
        self.state = self.state._replace(
            params=params, target_params=target_params
        )

    # -- evaluation ----------------------------------------------------------

    def evaluate(self, n_episodes: int = 1024, key=None, bank=None) -> dict:
        """Greedy-policy win rate over ``n_episodes`` fresh bank configs:
        each env plays exactly one episode (no auto-reset), scanned M+1
        steps so every episode reaches a terminal.

        ``bank`` defaults to the TRAINING bank — a win rate that may reflect
        memorization of its finite config set. For a generalization
        measurement pass a held-out bank (gen.bank.make_holdout_bank), whose
        configs are provably disjoint from training."""
        cfg = self.cfg
        bank = bank if bank is not None else self.bank
        key = key if key is not None else jax.random.PRNGKey(cfg.seed + 1)

        # one cached jit per trainer — evaluate() may run several times per
        # session (train bank + holdout + adaptive-share probes) and a fresh
        # jax.jit every call would re-trace (~30-60s per compile on the
        # remote TPU tunnel). Bank-row sampling and env construction live
        # INSIDE the jit: as eager ops they cost several remote-dispatch
        # round trips per call, which at the adaptive controller's probe
        # cadence was ~20% of training wall time.
        if not hasattr(self, "_eval_runs"):
            self._eval_runs = {}
        if n_episodes not in self._eval_runs:  # shape-specializing cache
            def run(params, boards, pieces, key):
                idx = jax.random.randint(
                    key, (n_episodes,), 0, boards.shape[0]
                )
                env = self.backend.make_state_batch(
                    boards[idx], pieces[idx], cfg.env.L, cfg.env.M
                )

                def body(env, _):
                    obs = self.backend.observe_batch(env)
                    # eps is HARDCODED 0.0 (greedy): the PRNGKey(0) below is
                    # dead — select_actions only consumes the key on the
                    # exploration branch. If this rollout ever grows an
                    # eps > 0 mode, thread a real key through the scan or
                    # every env explores identically every step.
                    rot, col = agent_lib.select_actions(
                        self.apply_fn, params, obs,
                        jnp.float32(0.0), jax.random.PRNGKey(0),
                    )
                    res = self.backend.step_batch(env, rot, col)
                    # freeze finished envs
                    keep = env.status != engine.RUNNING
                    nxt = jax.tree.map(
                        lambda a, b: jnp.where(
                            keep.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
                        ),
                        env, res.state,
                    )
                    return nxt, None

                env, _ = jax.lax.scan(body, env, None, length=cfg.env.M + 1)
                return env

            self._eval_runs[n_episodes] = jax.jit(run)

        final = self._eval_runs[n_episodes](
            self.state.params, bank.boards, bank.pieces, key
        )
        status = np.asarray(final.status)
        return {
            "episodes": n_episodes,
            "win_rate": float((status == 1).mean()),
            "loss_rate": float((status == 2).mean()),
            "unfinished": float((status == 0).mean()),
        }
