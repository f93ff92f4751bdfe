"""Pallas fused-rollout kernel: exact board-math equivalence vs the scan.

In Pallas interpret mode ``pltpu.prng_random_bits`` yields all-zero bits, so
the kernel deterministically plays (rot=0, loc=0) and resets to bank row 0 —
we replay exactly that policy through the reference bitboard scan and demand
bit-identical boards, counters and episode statistics. The RNG path itself
is validated on real TPU hardware by benchmarks/bench_pallas.py (dispersion
check there, not here — the interpreter has no TPU PRNG).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tetris_piclim_tpu.ops import bitboard
from tetris_piclim_tpu.ops import pallas_rollout


def _scan_zero_policy(state, bank_cols, bank_pieces, n_steps):
    """bitboard scan under the interpret-mode kernel's degenerate policy."""
    n = state.cols.shape[0]
    zeros = jnp.zeros((n,), jnp.int32)

    def body(carry, _):
        state, episodes, wins = carry
        res = bitboard.step(state, zeros, zeros)
        fresh = bitboard.PackedState(
            cols=jnp.broadcast_to(bank_cols[0], (n, 10)),
            pieces=jnp.broadcast_to(bank_pieces[0], (n,) + bank_pieces.shape[1:]),
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
        return (nxt, episodes, wins), None

    (state, episodes, wins), _ = jax.lax.scan(
        body, (state, jnp.int32(0), jnp.int32(0)), None, length=n_steps
    )
    return state, episodes, wins


@pytest.mark.parametrize("n_steps", [1, 7, 40])
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
