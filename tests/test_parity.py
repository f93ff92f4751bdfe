"""Bit-exact step parity: jitted engine.step vs the reference Tetris.move.

Drives both engines with identical (board, pieces, action) streams and
compares boards / counters / terminal flags after every move — the contract
test from SURVEY.md §4. The reference runs at ~49k moves/s so fuzzing
thousands of transitions per run is cheap.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tetris_piclim_tpu import engine
from ref_loader import load_reference

ref = load_reference()

STATUS_MAP = {None: 0, True: 1, False: 2}


def make_ref_env(L, M, board, pieces):
    t = ref.Tetris.__new__(ref.Tetris)
    t.L, t.M = L, M
    t.warm_reset = False
    t.render = False
    t.debug = False
    t.lines_cleared = 0
    t.moves_used = 0
    t.state = None
    t.random_piece_generator = ref.RandomPieceGenerator()
    t.board = board.copy()
    t.pieces = list(pieces)
    return t


def gen_configs(n, L, M, seed):
    """Winnable initial configs via the reference carving generator."""
    random.seed(seed)
    out = []
    for _ in range(n):
        t = ref.Tetris(L, M, warm_reset=False)
        out.append((t.board.copy(), list(t.pieces)))
    return out


@pytest.mark.parametrize("L,M,seed", [(2, 20, 0), (5, 15, 1), (10, 30, 2)])
def test_step_parity_fuzz(L, M, seed):
    configs = gen_configs(6, L, M, seed)
    rng = random.Random(seed + 100)
    jstep = jax.jit(engine.step)

    for board, pieces in configs:
        t = make_ref_env(L, M, board, pieces)
        s = engine.make_state(board, np.array(pieces), L, M)
        # Play to terminal and two moves beyond (reference move() is
        # unguarded after terminal; parity must hold there too as long as
        # pieces remain).
        extra = 0
        while extra < 2:
            if t.state is not None:
                extra += 1
            if not t.pieces:
                break
            rot = rng.randint(0, 3)
            loc = rng.randint(0, 9)
            t.move(rot, loc)
            s, lines_delta, done, won = jstep(
                s, jnp.int32(rot), jnp.int32(loc)
            )
            np.testing.assert_array_equal(
                np.asarray(s.board), t.board,
                err_msg=f"board mismatch after rot={rot} loc={loc}",
            )
            assert int(s.lines_cleared) == t.lines_cleared
            assert int(s.moves_used) == t.moves_used
            assert int(s.status) == STATUS_MAP[t.state]
            # cursor mirrors pop(0)
            assert len(pieces) - int(s.cursor) == len(t.pieces)


def test_random_boards_parity():
    """Fuzz on arbitrary (non-winnable) boards: random noise stacks."""
    rng = np.random.default_rng(7)
    pyrng = random.Random(3)
    jstep = jax.jit(engine.step)
    for trial in range(25):
        density = rng.uniform(0.05, 0.6)
        board = rng.random((20, 10)) < density
        board[:3] = False  # leave room at top
        # make no floating full rows ambiguity — any board is legal input
        pieces = [pyrng.randint(0, 6) for _ in range(12)]
        L, M = pyrng.randint(1, 6), 11
        t = make_ref_env(L, M, board, pieces)
        s = engine.make_state(board, np.array(pieces), L, M)
        for _ in range(8):
            if not t.pieces:
                break
            rot = pyrng.randint(0, 5)   # exercises rotation wrap
            loc = pyrng.randint(0, 9)
            t.move(rot, loc)
            s, *_ = jstep(s, jnp.int32(rot), jnp.int32(loc))
            np.testing.assert_array_equal(np.asarray(s.board), t.board)
            assert int(s.lines_cleared) == t.lines_cleared
            assert int(s.moves_used) == t.moves_used
            assert int(s.status) == STATUS_MAP[t.state]


def test_topout_semantics():
    """drop<0 loses without board change or move increment
    (reference game/tetris.py:371-379)."""
    board = np.zeros((20, 10), dtype=bool)
    board[0:, 0] = True  # column 0 full to the top
    pieces = [0, 0, 0]
    t = make_ref_env(1, 3, board, pieces)
    s = engine.make_state(board, np.array(pieces), 1, 3)
    t.move(1, 0)  # vertical I onto a full column → top-out
    s, lines_delta, done, won = jax.jit(engine.step)(s, jnp.int32(1), jnp.int32(0))
    assert t.state is False and int(s.status) == 2
    assert t.moves_used == 0 and int(s.moves_used) == 0
    np.testing.assert_array_equal(np.asarray(s.board), t.board)
    assert bool(done) and not bool(won)


def test_win_on_last_move():
    """Clearing the L-th line on the M-th move is a WIN (win checked before
    move-limit loss on the clear path, reference game/tetris.py:414-421)."""
    board = np.zeros((20, 10), dtype=bool)
    board[19, :8] = True  # bottom row missing cols 8,9
    pieces = [6, 0]  # O piece fills 2 cols
    t = make_ref_env(1, 1, board, pieces)
    s = engine.make_state(board, np.array(pieces), 1, 1)
    t.move(0, 8)
    s, lines_delta, done, won = jax.jit(engine.step)(s, jnp.int32(0), jnp.int32(8))
    assert t.state is True
    assert int(s.status) == 1 and bool(won)
    assert int(lines_delta) == 1
    np.testing.assert_array_equal(np.asarray(s.board), t.board)


def test_preexisting_full_rows_survive():
    """Full rows outside the piece span are NOT cleared (reference scans only
    game/tetris.py:381-386's piece rows) — carved initial configs rely on it."""
    board = np.zeros((20, 10), dtype=bool)
    board[19, :] = True   # a pre-existing full row
    board[18, :9] = True
    pieces = [0, 0]
    t = make_ref_env(2, 2, board, pieces)
    s = engine.make_state(board, np.array(pieces), 2, 2)
    t.move(1, 5)  # vertical I on col 5, lands rows 14-17: no clear
    s, *_ = jax.jit(engine.step)(s, jnp.int32(1), jnp.int32(5))
    assert t.board[19].all() and np.asarray(s.board)[19].all()
    np.testing.assert_array_equal(np.asarray(s.board), t.board)
    assert t.lines_cleared == 0 and int(s.lines_cleared) == 0


def test_deep_parity_fuzz():
    """Long-haul fuzz: 40 episodes across mixed (L, M) and densities —
    every transition bit-exact vs the reference."""
    rng = np.random.default_rng(99)
    pyrng = random.Random(99)
    jstep = jax.jit(engine.step)
    transitions = 0
    for trial in range(40):
        L = pyrng.randint(1, 10)
        M = pyrng.randint(max(L, 2), 30)
        density = rng.uniform(0.0, 0.7)
        board = rng.random((20, 10)) < density
        board[: pyrng.randint(1, 5)] = False
        pieces = [pyrng.randint(0, 6) for _ in range(M + 1)]
        t = make_ref_env(L, M, board, pieces)
        s = engine.make_state(board, np.array(pieces), L, M)
        while t.state is None and t.pieces:
            rot = pyrng.randint(0, 7)
            loc = pyrng.randint(0, 9)
            t.move(rot, loc)
            s, *_ = jstep(s, jnp.int32(rot), jnp.int32(loc))
            transitions += 1
            np.testing.assert_array_equal(np.asarray(s.board), t.board)
            assert int(s.lines_cleared) == t.lines_cleared
            assert int(s.moves_used) == t.moves_used
            assert int(s.status) == STATUS_MAP[t.state]
    assert transitions > 120


def test_exhaustive_action_sweep():
    """Systematic (not sampled) sweep: every (piece, rotation 0-3, column
    0-9) against the reference on three canonical boards — 840 transitions
    per board shape, all bit-exact."""
    boards = []
    empty = np.zeros((20, 10), dtype=bool)
    boards.append(empty)
    staircase = np.zeros((20, 10), dtype=bool)
    for c in range(10):
        staircase[19 - c:, c] = True  # ascending staircase
    boards.append(staircase)
    wells = np.zeros((20, 10), dtype=bool)
    wells[12:, ::2] = True  # alternating columns filled from row 12
    boards.append(wells)

    jstep = jax.jit(engine.step)
    for base in boards:
        for piece in range(7):
            for rot in range(4):
                for loc in range(10):
                    t = make_ref_env(1, 2, base, [piece, 0, 0])
                    s = engine.make_state(base, np.array([piece, 0, 0]), 1, 2)
                    t.move(rot, loc)
                    s, *_ = jstep(s, jnp.int32(rot), jnp.int32(loc))
                    np.testing.assert_array_equal(
                        np.asarray(s.board), t.board,
                        err_msg=f"piece={piece} rot={rot} loc={loc}",
                    )
                    assert int(s.status) == STATUS_MAP[t.state]
                    assert int(s.lines_cleared) == t.lines_cleared
