"""User-facing single-environment API — drop-in analogue of the reference
``Tetris`` class (reference: game/tetris.py:140-470), backed by the jitted
engine.

A user of the reference can switch with the same constructor and methods:
``Tetris(L, M, warm_reset=True, render=False, framerate=30, debug=False)``,
``.move(rotations, location)``, ``.get_state()``, ``.reset()``,
``.terminate()``, and the ``.board/.pieces/.lines_cleared/.moves_used/.state``
attributes.

Differences (decide-and-document, SURVEY.md §7 quirk policy; all restorable
with ``parity=True``):

* ``reset()`` zeroes ``lines_cleared``/``moves_used``/``state`` — the
  reference forgets to (game/tetris.py:438-443), which silently corrupts any
  auto-reset loop. ``parity=True`` reproduces the stale counters.
* ``get_state()`` at a terminal state clamps the next-piece index instead of
  raising IndexError (reference game/tetris.py:435-436 raises when fewer
  than two pieces remain). ``parity=True`` raises.
* warm reset uses a background *thread* + carving generator instead of two
  processes and a multiprocessing.Queue (reference game/tetris.py:190-214):
  the numpy carve loop releases the GIL and the configs land in the same
  bounded queue semantics (maxsize 20) without pickle/IPC overhead.
* rendering is ASCII by default (``render_frame``); pygame is used when
  available and ``render="pygame"``. As in the reference (game/tetris.py:
  181-182), enabling render disables warm reset.
"""

from __future__ import annotations

import queue as queue_mod
import random
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import engine
from .gen.carver import CarvingGenerator

_jitted_step = jax.jit(engine.step)

_STATUS_TO_REF = {0: None, 1: True, 2: False}


class Tetris:
    def __init__(
        self,
        L: int,
        M: int,
        warm_reset: bool = True,
        render=False,
        framerate: int = 30,
        debug: bool = False,
        parity: bool = False,
        seed: Optional[int] = None,
    ) -> None:
        self.L = L
        self.M = M
        self.warm_reset = warm_reset
        self.render = bool(render)
        self._render_mode = render
        self.framerate = framerate
        self.debug = debug
        self.parity = parity
        self._rng = random.Random(seed) if seed is not None else random
        if debug:
            self.solution: list[tuple[int, int]] = []

        self.lines_cleared = 0
        self.moves_used = 0
        self.state = None

        self._pygame = None
        if self.render:
            self.warm_reset = False  # reference game/tetris.py:181-182
            if render == "pygame":
                self._init_pygame()

        self._queue: Optional[queue_mod.Queue] = None
        self._stop: Optional[threading.Event] = None
        self._workers: list[threading.Thread] = []
        if self.warm_reset:
            # bounded like the reference's Queue(maxsize=20), game/tetris.py:195;
            # two producers mirroring the reference's pair of worker processes:
            # a carving producer (game/tetris.py:473-479) and a forward
            # generate+prove producer (game/tetris.py:482-488)
            self._queue = queue_mod.Queue(maxsize=20)
            self._stop = threading.Event()
            for target in (self._warm_worker, self._forward_worker):
                th = threading.Thread(target=target, args=(0,), daemon=True)
                th.start()
                self._workers.append(th)

        self._state: Optional[engine.EnvState] = None
        self.load_warm_reset()

    # -- warm reset ----------------------------------------------------------

    def _warm_worker(self, tid: int) -> None:
        rng = random.Random((tid + 1) * 7919 + int(time.time() * 1e6) % 100003)
        while not self._stop.is_set():
            gen = CarvingGenerator(self.L, self.M, rng=rng)
            item = gen.generate()
            while not self._stop.is_set():
                try:
                    self._queue.put(item, timeout=0.2)
                    break
                except queue_mod.Full:
                    continue

    def _forward_worker(self, tid: int) -> None:
        """Forward generate+prove producer (reference forward_warm_reset_worker,
        game/tetris.py:482-488): batches of solver-proven configs. In parity
        mode the seed window is pinned to 0..100 forever and a random first
        piece is prepended (reference quirks, SURVEY.md §3.5); otherwise the
        seed window rotates and the sequence is kept intact."""
        import random as _rnd

        from .gen.pipeline import generate_batch, translate_batch

        rng = _rnd.Random(9176 + tid)
        seed = 0
        while not self._stop.is_set():
            games = generate_batch(
                self.L, self.M, seed_start=seed, seed_end=seed + 100
            )
            if not self.parity:
                seed += 100
            for item in translate_batch(
                games, self.M, rng=rng, parity=self.parity
            ):
                if self._stop.is_set():
                    return
                while not self._stop.is_set():
                    try:
                        self._queue.put(item, timeout=0.2)
                        break
                    except queue_mod.Full:
                        continue

    def load_warm_reset(self) -> None:
        if self.warm_reset:
            board, pieces = self._queue.get()
        else:
            if self.debug:
                board, pieces, solution = CarvingGenerator(
                    self.L, self.M, rng=self._rng, record_solution=True
                ).generate()
                self.solution = solution
            else:
                board, pieces = CarvingGenerator(
                    self.L, self.M, rng=self._rng
                ).generate()
        self._pieces_full = list(pieces)
        self._state = engine.make_state(
            np.asarray(board, dtype=bool), np.array(pieces), self.L, self.M
        )
        if self.parity:
            # reference reset() carries counters over (game/tetris.py:438-443)
            self._state = self._state._replace(
                lines_cleared=jnp.int32(self.lines_cleared),
                moves_used=jnp.int32(self.moves_used),
                status=jnp.int8(
                    0 if self.state is None else (1 if self.state else 2)
                ),
            )
        else:
            self.lines_cleared = 0
            self.moves_used = 0
            self.state = None

    # -- reference API -------------------------------------------------------

    @property
    def board(self) -> np.ndarray:
        return np.asarray(self._state.board)

    @property
    def pieces(self) -> list[int]:
        return [int(p) for p in self._pieces_full[int(self._state.cursor):]]

    def move(self, rotations: int, location: int) -> None:
        res = _jitted_step(
            self._state, jnp.int32(rotations), jnp.int32(location)
        )
        self._state = res.state
        self.lines_cleared = int(res.state.lines_cleared)
        self.moves_used = int(res.state.moves_used)
        self.state = _STATUS_TO_REF[int(res.state.status)]
        if self.render:
            self.render_frame(self.board)

    def get_state(self):
        """(board, current piece, next piece, lines left, moves left, state)
        — reference game/tetris.py:435-436."""
        remaining = self.pieces
        if self.parity:
            cur, nxt = remaining[0], remaining[1]  # IndexError at terminal, like ref
        else:
            cur = remaining[0] if remaining else 0
            nxt = remaining[1] if len(remaining) > 1 else cur
        return (
            self.board,
            cur,
            nxt,
            self.L - self.lines_cleared,
            self.M - self.moves_used,
            self.state,
        )

    def reset(self) -> None:
        self.load_warm_reset()

    def terminate(self) -> None:
        if self.warm_reset and self._stop is not None:
            self._stop.set()
            # drain so producers blocked on put() can exit
            # (reference protocol, game/tetris.py:451-466)
            try:
                while True:
                    self._queue.get_nowait()
            except queue_mod.Empty:
                pass
            for th in self._workers:
                th.join(timeout=10)
            self._workers.clear()
        if self._pygame is not None:
            self._pygame.quit()

    # -- rendering -----------------------------------------------------------

    def _init_pygame(self):
        try:
            import pygame
        except ImportError:
            return  # fall back to ASCII
        self._pygame = pygame
        self._cell = 40
        pygame.init()
        self._screen = pygame.display.set_mode((400, 800))
        pygame.display.set_caption("Tetris-piclim (TPU)")
        self._clock = pygame.time.Clock()

    def render_frame(self, board: np.ndarray) -> None:
        if self._pygame is not None:
            pg = self._pygame
            for y in range(board.shape[0]):
                for x in range(board.shape[1]):
                    color = (99, 64, 247) if board[y, x] else (255, 255, 255)
                    pg.draw.rect(
                        self._screen, color,
                        (x * self._cell, y * self._cell, self._cell, self._cell),
                    )
            pg.display.flip()
            self._clock.tick(self.framerate)
        else:
            rows = ["".join("#" if c else "." for c in row) for row in board]
            print("\n".join(rows))
            print("-" * board.shape[1])

    def __enter__(self):
        return self

    def __exit__(self, *exc) -> None:
        self.terminate()
