"""Fused actor kernel: bit-exact equivalence vs the XLA actor path.

At eps=0 the policy is deterministic greedy, and in interpret mode the
kernel PRNG yields zero bits (reset -> bank row 0), so the whole K-step
trajectory — actions, boards, counters, transition records — must match an
XLA loop of observe -> select_actions(greedy) -> bitboard.step -> reset-to-
row-0 word for word. The padded in-kernel MLP adds only exact-zero terms at
the end of each dot product, so even f32 accumulation matches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tetris_piclim_tpu.dqn import agent as agent_lib
from tetris_piclim_tpu.models.qnet import QNetwork
from tetris_piclim_tpu.ops import bitboard
from tetris_piclim_tpu.ops.pallas_actor import actor_rollout_fused


def _xla_reference(net, params, state, bank_cols, bank_pieces, n_steps):
    """XLA actor loop recording the same transition fields the kernel emits."""
    n = state.cols.shape[0]
    zeros = jnp.zeros((n,), jnp.int32)
    records = []
    episodes = wins = 0
    for _ in range(n_steps):
        obs = bitboard.observe_batch(state)
        rot, col = agent_lib.select_actions(
            net.apply, params, obs, jnp.float32(0.0), jax.random.PRNGKey(0)
        )
        res = bitboard.step(state, rot, col)
        p = state.pieces.shape[1]
        cur = jnp.take_along_axis(
            state.pieces.astype(jnp.int32),
            jnp.clip(state.cursor, 0, p - 1)[:, None], axis=1)[:, 0]
        nxt = jnp.take_along_axis(
            state.pieces.astype(jnp.int32),
            jnp.clip(state.cursor + 1, 0, p - 1)[:, None], axis=1)[:, 0]
        n_cur = jnp.take_along_axis(
            res.state.pieces.astype(jnp.int32),
            jnp.clip(res.state.cursor, 0, p - 1)[:, None], axis=1)[:, 0]
        n_nxt = jnp.take_along_axis(
            res.state.pieces.astype(jnp.int32),
            jnp.clip(res.state.cursor + 1, 0, p - 1)[:, None], axis=1)[:, 0]
        records.append({
            "cols": state.cols, "rot": rot, "col": col,
            "cur": cur, "nxt": nxt,
            "lines_left": state.lines_goal - state.lines_cleared,
            "moves_left": state.move_limit - state.moves_used,
            "lines_delta": res.lines_delta, "done": res.done, "won": res.won,
            "n_cols": res.state.cols, "n_cur": n_cur, "n_nxt": n_nxt,
            "n_lines_left": res.state.lines_goal - res.state.lines_cleared,
            "n_moves_left": res.state.move_limit - res.state.moves_used,
            "n_status": res.state.status.astype(jnp.int32),
        })
        episodes += int(res.done.sum())
        wins += int(res.won.sum())
        fresh = bitboard.PackedState(
            cols=jnp.broadcast_to(bank_cols[0], (n, 10)),
            pieces=jnp.broadcast_to(bank_pieces[0], (n,) + bank_pieces.shape[1:]),
            cursor=zeros, lines_cleared=zeros, moves_used=zeros,
            lines_goal=state.lines_goal, move_limit=state.move_limit,
            status=jnp.zeros((n,), jnp.int8),
        )
        done = res.done
        state = jax.tree.map(
            lambda f, s: jnp.where(
                done.reshape((-1,) + (1,) * (f.ndim - 1)), f, s
            ),
            fresh, res.state,
        )
    return state, records, episodes, wins


@pytest.mark.parametrize("head_dim,joint", [(14, False), (40, True)])
@pytest.mark.parametrize("n_steps", [5, 23])
def test_actor_kernel_matches_xla_greedy(head_dim, joint, n_steps):
    n, bank_n, L, M = 84, 8, 2, 12
    key = jax.random.PRNGKey(head_dim + n_steps)
    kb, kp, ki, kbank = jax.random.split(key, 4)
    boards = jax.random.uniform(kb, (n, 20, 10)) < 0.25
    boards = boards.at[:, :8].set(False)
    full = boards.all(axis=2)
    boards = jnp.where(full[:, :, None], False, boards)
    pieces = jax.random.randint(kp, (n, M + 1), 0, 7, dtype=jnp.int8)
    state = bitboard.make_state_batch(boards, pieces, L, M)

    bank_boards = jnp.zeros((bank_n, 20, 10), bool).at[:, 19, :5].set(True)
    bank_cols = bitboard.pack_board(bank_boards)
    bank_pieces = jax.random.randint(
        kbank, (bank_n, M + 1), 0, 7, dtype=jnp.int8
    )

    net = QNetwork(joint=joint)
    params = net.init(ki, jnp.zeros((1, 217), jnp.float32))

    ref_state, recs, ref_eps, ref_wins = _xla_reference(
        net, params, state, bank_cols, bank_pieces, n_steps
    )
    ker_state, trans, ker_eps, ker_wins = actor_rollout_fused(
        state, params, bank_cols, bank_pieces,
        jnp.int32(0), jnp.int32(0),
        eps_start=0.0, eps_end=0.0, eps_decay=1000.0,
        head_dim=head_dim, n_steps=n_steps, tile=42,
        interpret=pltpu.InterpretParams(),
    )

    # final env state identical
    for field in ("cols", "cursor", "lines_cleared", "moves_used", "status"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ker_state, field)),
            np.asarray(getattr(ref_state, field)),
            err_msg=field,
        )
    np.testing.assert_array_equal(
        np.asarray(ker_state.pieces), np.asarray(ref_state.pieces)
    )
    assert int(ker_eps) == ref_eps and int(ker_wins) == ref_wins

    # every per-step transition record identical
    for k, rec in enumerate(recs):
        for name in rec:
            got = np.asarray(getattr(trans, name)[k])
            want = np.asarray(rec[name])
            np.testing.assert_array_equal(got, want, err_msg=f"step {k} {name}")

    # actions actually vary across envs/steps (non-degenerate policy)
    assert len(np.unique(np.asarray(trans.col))) > 1
    assert int(np.asarray(trans.done).sum()) > 0


def test_trainer_actor_fusion_integration():
    """End-to-end fused-chunk trainer on CPU (interpret mode): replay fills,
    the learner runs K*updates updates per phase, counters advance."""
    from tetris_piclim_tpu.dqn.train import DQNTrainer
    from tetris_piclim_tpu.gen.bank import ConfigBank
    from tetris_piclim_tpu.utils.config import DQNConfig, EnvConfig, TrainConfig

    cfg = TrainConfig(
        env=EnvConfig(L=1, M=6),
        dqn=DQNConfig(batch_size=32),
        actor_fusion=4,
        num_envs=16, bank_capacity=16, replay_capacity=512,
        warmup_steps=4, total_steps=16, log_every=8, seed=0,
    )
    bank = ConfigBank(1, 6, capacity=16, seed=0).fill_device()
    tr = DQNTrainer(cfg, bank=bank)
    out = tr.train(log_fn=None)
    assert int(tr.state.global_step) == 16
    assert int(tr.state.updates_done) > 0
    assert int(tr.state.replay.size) == 16 * 16  # K blocks of num_envs each
    rows = out["history"]
    assert rows and all(r["episodes"] >= 0 for r in rows)
    # the eps-greedy path in interpret mode always explores with (0, 0) —
    # what matters here is plumbing: rewards/metrics are finite and typed
    assert all(np.isfinite(r["reward"]) for r in rows)


def test_trainer_actor_fusion_rejects_conv():
    from tetris_piclim_tpu.dqn.train import DQNTrainer
    from tetris_piclim_tpu.models.convnet import ConvQNetwork
    from tetris_piclim_tpu.utils.config import EnvConfig, TrainConfig

    cfg = TrainConfig(
        env=EnvConfig(L=1, M=6), actor_fusion=8,
        num_envs=8, bank_capacity=8, replay_capacity=64, seed=0,
    )
    with pytest.raises(ValueError, match="actor_fusion"):
        DQNTrainer(cfg, net=ConvQNetwork())


def test_actor_kernel_explore_branch_interpret():
    """With eps=1 every action explores; interpret-mode PRNG zero bits give
    rot=0/loc=0 — the trajectory must equal the scripted zero-action scan."""
    n, M = 64, 8
    boards = jnp.zeros((n, 20, 10), bool).at[:, 19, :7].set(True)
    pieces = jnp.broadcast_to(jnp.arange(M + 1, dtype=jnp.int8) % 7, (n, M + 1))
    state = bitboard.make_state_batch(boards, pieces, 1, M)
    bank_cols = bitboard.pack_board(
        jnp.zeros((4, 20, 10), bool).at[:, 19, :3].set(True)
    )
    bank_pieces = jnp.broadcast_to(
        jnp.arange(M + 1, dtype=jnp.int8) % 7, (4, M + 1)
    )
    net = QNetwork()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 217), jnp.float32))

    ker_state, trans, eps_n, _ = actor_rollout_fused(
        state, params, bank_cols, bank_pieces, jnp.int32(0), jnp.int32(0),
        eps_start=1.0, eps_end=1.0, eps_decay=1.0,
        head_dim=14, n_steps=10, tile=64,
        interpret=pltpu.InterpretParams(),
    )
    assert (np.asarray(trans.rot) == 0).all()
    assert (np.asarray(trans.col) == 0).all()

    # replay through bitboard.step with the same zero actions + row-0 resets
    zeros = jnp.zeros((n,), jnp.int32)
    s = state
    for k in range(10):
        res = bitboard.step(s, zeros, zeros)
        np.testing.assert_array_equal(
            np.asarray(trans.n_cols[k]), np.asarray(res.state.cols)
        )
        fresh = bitboard.PackedState(
            cols=jnp.broadcast_to(bank_cols[0], (n, 10)),
            pieces=jnp.broadcast_to(bank_pieces[0], (n, M + 1)),
            cursor=zeros, lines_cleared=zeros, moves_used=zeros,
            lines_goal=s.lines_goal, move_limit=s.move_limit,
            status=jnp.zeros((n,), jnp.int8),
        )
        done = res.done
        s = jax.tree.map(
            lambda f, x: jnp.where(
                done.reshape((-1,) + (1,) * (f.ndim - 1)), f, x
            ),
            fresh, res.state,
        )
    np.testing.assert_array_equal(
        np.asarray(ker_state.cols), np.asarray(s.cols)
    )
