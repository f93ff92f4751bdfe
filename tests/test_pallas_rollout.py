"""Pallas fused-rollout kernel: exact board-math equivalence vs the scan.

Two layers of proof, both in interpret mode (no TPU needed):

* scripted-action fuzz — the kernel's ``actions=`` path replays varied
  rotation/location/reset streams over adversarial boards (near-full rows
  forcing multi-line clears, top-outs, win-on-last-move) and must be
  bit-identical to a jax.lax.scan over bitboard.step with the same streams;
* zero-policy determinism — in interpret mode ``pltpu.prng_random_bits``
  yields all-zero bits, so the PRNG path deterministically plays
  (rot=0, loc=0, reset to bank row 0); we replay exactly that policy.

The live PRNG path is additionally validated on real TPU hardware by
benchmarks/bench_pallas.py (dispersion check there — the interpreter has no
TPU PRNG)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tetris_piclim_tpu.ops import bitboard
from tetris_piclim_tpu.ops import pallas_rollout


def _scan_with_actions(state, bank_cols, bank_pieces, rots, locs, idxs):
    """bitboard.step + explicit bank-row auto-reset, same streams as the
    kernel's scripted path."""
    n = state.cols.shape[0]
    zeros = jnp.zeros((n,), jnp.int32)

    def body(carry, xs):
        state, episodes, wins, multi = carry
        rot, loc, idx = xs
        res = bitboard.step(state, rot, loc)
        fresh = bitboard.PackedState(
            cols=bank_cols[idx],
            pieces=bank_pieces[idx],
            cursor=zeros,
            lines_cleared=zeros,
            moves_used=zeros,
            lines_goal=state.lines_goal,
            move_limit=state.move_limit,
            status=jnp.zeros((n,), jnp.int8),
        )
        done = res.done
        nxt = jax.tree.map(
            lambda f, s: jnp.where(
                done.reshape((-1,) + (1,) * (f.ndim - 1)), f, s
            ),
            fresh, res.state,
        )
        episodes = episodes + done.sum(dtype=jnp.int32)
        wins = wins + res.won.sum(dtype=jnp.int32)
        multi = multi + (res.lines_delta >= 2).sum(dtype=jnp.int32)
        return (nxt, episodes, wins, multi), None

    (state, episodes, wins, multi), _ = jax.lax.scan(
        body, (state, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        (rots, locs, idxs),
    )
    return state, episodes, wins, multi


def _adversarial_boards(key, n):
    """1/3 sparse random, 1/3 bottom rows full minus one column (deep wells
    that clear 2-4 lines at once), 1/3 nearly-topped-out stacks."""
    k1, k2, k3 = jax.random.split(key, 3)
    boards = np.zeros((n, 20, 10), bool)
    third = n // 3
    rnd = np.asarray(jax.random.uniform(k1, (third, 20, 10))) < 0.25
    rnd[:, :6] = False
    boards[:third] = rnd
    # deep wells: bottom k rows full except one column
    depth = np.asarray(jax.random.randint(k2, (third,), 1, 4))
    well = np.asarray(jax.random.randint(k2, (third,), 0, 10))
    for i in range(third):
        boards[third + i, 20 - depth[i]:, :] = True
        boards[third + i, 20 - depth[i]:, well[i]] = False
    # tall stacks: force top-outs
    tall = np.asarray(jax.random.uniform(k3, (n - 2 * third, 20, 10))) < 0.55
    tall[:, :2] = False
    boards[2 * third:] = tall
    # no initial full rows (they would be un-clearable free lines)
    full = boards.all(axis=2)
    boards[full] = False
    return jnp.asarray(boards)


def _bank(key, bank_size, pieces_len):
    kb, kp = jax.random.split(key)
    bank_boards = jnp.zeros((bank_size, 20, 10), bool)
    rows = jax.random.uniform(kb, (bank_size, 20, 10)) < 0.2
    bank_boards = bank_boards.at[:, 14:].set(rows[:, 14:])
    full = bank_boards.all(axis=2)
    bank_boards = jnp.where(full[:, :, None], False, bank_boards)
    bank_cols = bitboard.pack_board(bank_boards)
    bank_pieces = jax.random.randint(
        kp, (bank_size, pieces_len), 0, 7, dtype=jnp.int8
    )
    return bank_cols, bank_pieces


@pytest.mark.parametrize("L,M,n_steps,seed", [
    (2, 20, 48, 0),   # long horizon, many resets
    (4, 6, 25, 1),    # tight move budget: loss/win boundary every 6 steps
    (1, 30, 17, 2),   # wins on first clear
])
def test_kernel_matches_scan_scripted_actions(L, M, n_steps, seed):
    """Bit-exact equivalence on VARIED action streams — rotations 0..7,
    all columns, multi-line clears, top-outs, and per-env bank resets."""
    n, bank_size = 126, 16
    key = jax.random.PRNGKey(seed)
    kb, kp, kr, kl, ki, kbank = jax.random.split(key, 6)
    boards = _adversarial_boards(kb, n)
    pieces = jax.random.randint(kp, (n, M + 1), 0, 7, dtype=jnp.int8)
    state = bitboard.make_state_batch(boards, pieces, L, M)
    bank_cols, bank_pieces = _bank(kbank, bank_size, M + 1)

    rots = jax.random.randint(kr, (n_steps, n), 0, 8, dtype=jnp.int32)
    locs = jax.random.randint(kl, (n_steps, n), 0, 10, dtype=jnp.int32)
    idxs = jax.random.randint(ki, (n_steps, n), 0, bank_size, dtype=jnp.int32)

    ref_state, ref_eps, ref_wins, ref_multi = _scan_with_actions(
        state, bank_cols, bank_pieces, rots, locs, idxs
    )
    ker_state, ker_eps, ker_wins = pallas_rollout.rollout_fused(
        state, bank_cols, bank_pieces, jnp.int32(0),
        n_steps=n_steps, tile=42, interpret=pltpu.InterpretParams(),
        actions=(rots, locs, idxs),
    )

    np.testing.assert_array_equal(
        np.asarray(ker_state.cols), np.asarray(ref_state.cols)
    )
    np.testing.assert_array_equal(
        np.asarray(ker_state.pieces), np.asarray(ref_state.pieces)
    )
    np.testing.assert_array_equal(
        np.asarray(ker_state.cursor), np.asarray(ref_state.cursor)
    )
    np.testing.assert_array_equal(
        np.asarray(ker_state.moves_used), np.asarray(ref_state.moves_used)
    )
    np.testing.assert_array_equal(
        np.asarray(ker_state.lines_cleared), np.asarray(ref_state.lines_cleared)
    )
    np.testing.assert_array_equal(
        np.asarray(ker_state.status), np.asarray(ref_state.status)
    )
    assert int(ker_eps) == int(ref_eps)
    assert int(ker_wins) == int(ref_wins)
    # the fuzz actually covered the interesting regimes
    assert int(ref_eps) > 0, "no episode boundary exercised"
    assert int(ref_multi) > 0, "no multi-line clear exercised"
    if L <= 2:
        assert int(ref_wins) > 0, "no WIN exercised"


def _scan_zero_policy(state, bank_cols, bank_pieces, n_steps):
    """bitboard scan under the interpret-mode kernel's degenerate policy."""
    n = state.cols.shape[0]
    zeros = jnp.zeros((n,), jnp.int32)
    rots = jnp.zeros((n_steps, n), jnp.int32)
    idxs = jnp.zeros((n_steps, n), jnp.int32)
    return _scan_with_actions(
        state, bank_cols, bank_pieces, rots, rots, idxs
    )[:3]


@pytest.mark.parametrize("n_steps", [7, 40])
def test_kernel_matches_scan_zero_policy(n_steps):
    n = 128
    key = jax.random.PRNGKey(0)
    boards = jax.random.uniform(key, (n, 20, 10)) < 0.25
    boards = boards.at[:, :6].set(False)
    pieces = jax.random.randint(key, (n, 21), 0, 7, dtype=jnp.int8)
    state = bitboard.make_state_batch(boards, pieces, 2, 20)

    bank_boards = jnp.zeros((16, 20, 10), bool).at[:, 19, :4].set(True)
    bank_cols = bitboard.pack_board(bank_boards)
    bank_pieces = jnp.broadcast_to(jnp.arange(21, dtype=jnp.int8) % 7, (16, 21))

    ref_state, ref_eps, ref_wins = _scan_zero_policy(
        state, bank_cols, bank_pieces, n_steps
    )
    ker_state, ker_eps, ker_wins = pallas_rollout.rollout_fused(
        state, bank_cols, bank_pieces, jnp.int32(0),
        n_steps=n_steps, tile=64, interpret=pltpu.InterpretParams(),
    )

    np.testing.assert_array_equal(
        np.asarray(ker_state.cols), np.asarray(ref_state.cols)
    )
    np.testing.assert_array_equal(
        np.asarray(ker_state.status), np.asarray(ref_state.status)
    )
    assert int(ker_eps) == int(ref_eps)
    assert int(ker_wins) == int(ref_wins)
