"""User-facing Tetris class: reference API surface + behavior."""

import numpy as np
import pytest

from tetris_piclim_tpu.env_api import Tetris


def test_cold_env_api_surface():
    t = Tetris(2, 10, warm_reset=False, seed=0)
    assert t.board.shape == (20, 10)
    assert len(t.pieces) == 11  # M+1, reference game/tetris.py:281-284
    board, cur, nxt, lines_left, moves_left, state = t.get_state()
    assert lines_left == 2 and moves_left == 10 and state is None
    t.move(1, 3)
    assert t.moves_used == 1
    assert len(t.pieces) == 10
    t.reset()
    assert t.moves_used == 0 and t.state is None and t.lines_cleared == 0
    t.terminate()


def test_warm_reset_queue():
    t = Tetris(2, 10, warm_reset=True, seed=1)
    first = t.board.copy()
    assert first[-1].sum() <= 8  # bottom row broken, game/tetris.py:234
    t.reset()
    assert t.board.shape == (20, 10)
    t.terminate()  # clean worker shutdown


def test_warm_reset_spawns_after_jax(recwarn):
    """Producers must use a spawn context: fork() after the JAX runtime has
    started its threads is a latent deadlock (regression: CPython emitted
    'os.fork() was called ... may lead to deadlocks' under the old default
    fork start method)."""
    import warnings

    import jax
    import jax.numpy as jnp

    jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.ones(8)))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        t = Tetris(1, 6, warm_reset=True, seed=9)
        t.reset()
        t.terminate()
    assert not [w for w in caught if "fork" in str(w.message)]


def test_parity_mode_preserves_reset_quirks():
    t = Tetris(1, 5, warm_reset=False, parity=True, seed=2)
    # drive to terminal
    while t.state is None:
        t.move(0, 0)
    assert t.state is not None
    lines, moves, state = t.lines_cleared, t.moves_used, t.state
    t.reset()
    # reference reset() does NOT zero counters (game/tetris.py:438-443)
    assert t.lines_cleared == lines
    assert t.moves_used == moves
    assert t.state == state
    t.terminate()


def test_parity_get_state_raises_at_exhaustion():
    t = Tetris(1, 3, warm_reset=False, parity=True, seed=3)
    for _ in range(3):
        t.move(0, 0)
    # 3 moves consumed, 1 piece left of M+1=4 → reference would IndexError
    with pytest.raises(IndexError):
        t.get_state()
    t.terminate()


def test_debug_solution_replay_wins():
    t = Tetris(3, 12, warm_reset=False, debug=True, seed=4)
    sol = list(t.solution)
    assert sol
    for rot, loc in sol:
        t.move(rot, loc)
    assert t.state is True
    t.terminate()


def test_context_manager():
    with Tetris(1, 5, warm_reset=True, seed=5) as t:
        t.move(0, 0)
    assert not t._workers


def test_env_api_move_parity_vs_reference():
    """The host-side single-env move must stay bit-exact vs the reference."""
    import random
    import numpy as np
    from ref_loader import load_reference

    ref = load_reference()
    rng = random.Random(11)
    for trial in range(10):
        t_ours = Tetris(3, 12, warm_reset=False, seed=100 + trial)
        board = t_ours.board.copy()
        pieces = list(t_ours.pieces)

        t_ref = ref.Tetris.__new__(ref.Tetris)
        t_ref.L, t_ref.M = 3, 12
        t_ref.warm_reset = False
        t_ref.render = False
        t_ref.debug = False
        t_ref.lines_cleared = 0
        t_ref.moves_used = 0
        t_ref.state = None
        t_ref.random_piece_generator = ref.RandomPieceGenerator()
        t_ref.board = board.copy()
        t_ref.pieces = list(pieces)

        while t_ref.state is None and t_ref.pieces:
            rot, loc = rng.randint(0, 5), rng.randint(0, 9)
            t_ref.move(rot, loc)
            t_ours.move(rot, loc)
            np.testing.assert_array_equal(t_ours.board, t_ref.board)
            assert t_ours.lines_cleared == t_ref.lines_cleared
            assert t_ours.moves_used == t_ref.moves_used
            assert t_ours.state == t_ref.state
            assert t_ours.pieces == t_ref.pieces
        t_ours.terminate()


def test_make_state_copies_host_buffer():
    """make_state must not alias the caller's numpy buffer: env_api keeps
    mutating its live board in place, and a zero-copy alias on the CPU
    backend races JAX's async reads (regression: greedy-play obs probe
    diverged non-deterministically)."""
    import jax.numpy as jnp
    from tetris_piclim_tpu import engine

    board = np.zeros((20, 10), dtype=bool)
    pieces = np.zeros(9, dtype=np.int8)
    s = engine.make_state(board, pieces, 1, 8)
    board[:] = True          # caller mutates after handing the buffer over
    pieces[:] = 6
    assert int(jnp.sum(s.board)) == 0
    assert int(jnp.sum(s.pieces)) == 0


def test_play_obs_matches_engine_observe():
    """The host-side observation the CLI greedy player builds equals
    engine.observe at every non-terminal step (same encoding the net was
    trained on)."""
    import jax.numpy as jnp
    from tetris_piclim_tpu import engine

    for seed in range(5):
        t = Tetris(3, 12, warm_reset=False, debug=True, seed=seed)
        s = engine.make_state(
            np.asarray(t.board), np.array(t._pieces_full), 3, 12
        )
        for rot, loc in list(t.solution):
            if t.state is not None:
                break
            board, cur, nxt, lines_left, moves_left, _ = t.get_state()
            oh = np.zeros(14, np.float32)
            oh[cur] = 1.0
            oh[7 + nxt] = 1.0
            host = np.concatenate([
                board.astype(np.float32).reshape(-1), oh,
                np.array([lines_left, moves_left, 0.0], np.float32),
            ])
            np.testing.assert_array_equal(
                host, np.asarray(engine.observe(s))
            )
            t.move(rot, loc)
            s = engine.step(s, jnp.int32(rot), jnp.int32(loc)).state


def test_warm_reset_worker_restart():
    """Dead producers are restarted so reset() can't block forever — the
    reference flaw SURVEY §5.3 calls out (game/tetris.py:447 blocks on a
    starved queue for good). Mirrors the bank path's restart policy."""
    import queue as qm

    t = Tetris(1, 8, warm_reset=True, seed=3)
    try:
        for proc in list(t._workers):
            proc.terminate()
            proc.join(timeout=10)
        try:
            while True:
                t._queue.get_nowait()
        except qm.Empty:
            pass
        t.reset()  # restarts both producers and returns a fresh config
        assert t._restarts >= 1
        assert any(p.is_alive() for p in t._workers)
        assert t.board.shape == (20, 10)
    finally:
        t.terminate()
