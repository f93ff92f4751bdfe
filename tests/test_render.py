"""Rendering parity tails: carve-loop render hook, pygame path (headless
dummy SDL driver), solver board visualization (reference
TetrisSolver.visualize/visualize_moves, game/tetris.py:264-265)."""

import random

import numpy as np
import pytest

from tetris_piclim_tpu.gen.carver import CarvingGenerator
from tetris_piclim_tpu.gen.forward import ForwardGenerator
from tetris_piclim_tpu.gen.solver import GreedyDFSSolver


def test_carve_loop_render_hook():
    """The carver must invoke the render hook after each ACCEPTED carve
    (reference renders the carve loop, game/tetris.py:264-265)."""
    frames = []
    gen = CarvingGenerator(
        2, 10, rng=random.Random(0),
        render_fn=lambda b: frames.append(b.copy()),
    )
    board, pieces = gen.generate()
    assert frames, "no carve frames rendered"
    np.testing.assert_array_equal(frames[-1], board)
    # frames are monotonically-carved states of a 20x10 bool board
    for f in frames:
        assert f.shape == (20, 10) and f.dtype == bool


def test_pygame_render_smoke(monkeypatch):
    """The pygame render path must construct, draw carve frames + move
    frames, and shut down cleanly under the headless dummy SDL driver."""
    pygame = pytest.importorskip("pygame")
    monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")
    from tetris_piclim_tpu.env_api import Tetris

    t = Tetris(1, 6, render="pygame", framerate=1000, seed=0)
    assert t._pygame is not None, "pygame path not active"
    assert t.warm_reset is False  # render disables warm reset (ref :181-182)
    t.move(0, 0)
    t.reset()  # re-renders the carve loop
    t.terminate()


def test_ascii_render_frame(capsys):
    from tetris_piclim_tpu.env_api import Tetris

    t = Tetris(1, 6, render=True, seed=1)
    t.render_frame(t.board)
    out = capsys.readouterr().out
    assert out.count("\n") >= 20
    assert set(out) <= set("#.-\n")
    t.terminate()


def test_solver_visualize_and_moves(capsys):
    game = ForwardGenerator(seed=3, goal=1, num_pieces=10, initial_height_max=4)
    solver = GreedyDFSSolver(game.board, game.sequence, 1, max_attempts=1000)
    ok, stack, _ = solver.solve()
    assert ok
    txt = solver.visualize()
    assert len(txt.splitlines()) == 20
    lines = solver.visualize_moves(stack)
    out = capsys.readouterr().out
    assert lines == solver.replay(stack)
    assert "Tetromino:" in out and "Lines cleared:" in out
