"""Bitboard fast path must be step-equivalent to the array parity engine."""

import jax
import jax.numpy as jnp
import numpy as np

from tetris_piclim_tpu import engine
from tetris_piclim_tpu.ops import bitboard


def _assert_states_equal(packed: bitboard.PackedState, arr: engine.EnvState):
    np.testing.assert_array_equal(
        np.asarray(bitboard.unpack_board(packed.cols)), np.asarray(arr.board)
    )
    for field in ("cursor", "lines_cleared", "moves_used", "status"):
        np.testing.assert_array_equal(
            np.asarray(getattr(packed, field)), np.asarray(getattr(arr, field))
        )


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    board = rng.random((32, 20, 10)) < 0.4
    cols = bitboard.pack_board(jnp.asarray(board))
    np.testing.assert_array_equal(np.asarray(bitboard.unpack_board(cols)), board)


def test_step_equivalence_fuzz():
    key = jax.random.PRNGKey(0)
    n = 256
    kb, kp = jax.random.split(key)
    boards = jax.random.uniform(kb, (n, 20, 10)) < 0.35
    boards = boards.at[:, :3].set(False)
    pieces = jax.random.randint(kp, (n, 16), 0, 7, dtype=jnp.int8)

    arr = engine.make_state_batch(boards, pieces, 3, 15)
    packed = bitboard.make_state_batch(boards, pieces, 3, 15)

    jstep_arr = jax.jit(engine.step_batch)
    jstep_bit = jax.jit(bitboard.step)

    k = key
    for it in range(12):
        k1, k2, k = jax.random.split(k, 3)
        rots = jax.random.randint(k1, (n,), 0, 6)
        locs = jax.random.randint(k2, (n,), 0, 10)
        res_a = jstep_arr(arr, rots, locs)
        res_b = jstep_bit(packed, rots, locs)
        _assert_states_equal(res_b.state, res_a.state)
        np.testing.assert_array_equal(
            np.asarray(res_b.lines_delta), np.asarray(res_a.lines_delta)
        )
        np.testing.assert_array_equal(np.asarray(res_b.done), np.asarray(res_a.done))
        np.testing.assert_array_equal(np.asarray(res_b.won), np.asarray(res_a.won))
        arr, packed = res_a.state, res_b.state


def test_observe_equivalence():
    key = jax.random.PRNGKey(1)
    n = 64
    boards = jax.random.uniform(key, (n, 20, 10)) < 0.3
    pieces = jax.random.randint(key, (n, 12), 0, 7, dtype=jnp.int8)
    arr = engine.make_state_batch(boards, pieces, 2, 11)
    packed = bitboard.make_state_batch(boards, pieces, 2, 11)
    obs_a = engine.observe_batch(arr)
    obs_b = bitboard.observe(packed)
    np.testing.assert_array_equal(np.asarray(obs_b), np.asarray(obs_a))


def test_autoreset_equivalence_of_fresh_states():
    n = 32
    bank_boards = jnp.zeros((4, 20, 10), bool).at[:, 19, :5].set(True)
    bank_pieces = jnp.tile(jnp.arange(8, dtype=jnp.int8) % 7, (4, 1))
    boards = jnp.zeros((n, 20, 10), bool)
    pieces = jnp.zeros((n, 8), jnp.int8)
    packed = bitboard.make_state_batch(boards, pieces, 5, 1)  # lose in 1 move
    bank_cols = bitboard.pack_board(bank_boards)
    nxt, res = jax.jit(bitboard.step_autoreset_batch)(
        packed,
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.int32),
        bank_cols,
        bank_pieces,
        jax.random.PRNGKey(0),
    )
    assert bool(res.done.all())
    assert bool((nxt.status == 0).all())
    board = np.asarray(bitboard.unpack_board(nxt.cols))
    assert (board[:, 19, :5].all(axis=1)).all()


def test_solution_replay_wins_on_bitboard():
    """Golden invariant through the packed path."""
    import random

    from tetris_piclim_tpu.gen.carver import CarvingGenerator

    rng = random.Random(7)
    board, pieces, solution = CarvingGenerator(
        4, 14, rng=rng, record_solution=True
    ).generate()
    packed = bitboard.make_state_batch(
        jnp.asarray(board)[None], jnp.asarray(np.array(pieces))[None], 4, 14
    )
    jstep = jax.jit(bitboard.step)
    for rot, loc in solution:
        packed = jstep(
            packed, jnp.array([rot], jnp.int32), jnp.array([loc], jnp.int32)
        ).state
    assert int(packed.status[0]) == 1
