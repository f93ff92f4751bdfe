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
* warm reset keeps the reference's two-producer-process design
  (game/tetris.py:190-214) — one carving producer, one forward
  generate+prove producer — over a bounded multiprocessing.Queue
  (maxsize 20). Processes (not threads): the generators are GIL-bound
  Python/numpy, so true parallelism needs separate interpreters, exactly
  as the reference concluded.
* rendering is ASCII by default (``render_frame``); pygame is used when
  available and ``render="pygame"``. As in the reference (game/tetris.py:
  181-182), enabling render disables warm reset.
"""

from __future__ import annotations

import multiprocessing
import queue as queue_mod
import random
import time
from typing import Optional

import numpy as np

from .gen.carver import CarvingGenerator
from .tables import BOARD_H, BOARD_W, NROT, get_tetromino

# Per-(piece, rotation) unpadded masks + int rtopo arrays, precomputed once —
# the per-move table lookup is then two list indexes (the reference rebuilds
# nothing either; its tables are module constants, game/tetris.py:23-57).
_HOST_TET = [
    [
        (get_tetromino(p, r)[0], np.asarray(get_tetromino(p, r)[1], dtype=np.int64))
        for r in range(int(NROT[p]))
    ]
    for p in range(7)
]


def host_move(board, piece, rotations, location):
    """One hard drop on a numpy board — exact reference ``move`` semantics
    (game/tetris.py:354-433) minus the state bookkeeping. Returns
    (topout, lines_cleared_delta, drop). Mutates ``board`` in place unless
    the drop tops out.

    The single-env interactive path runs on the HOST: a per-move device
    round-trip costs ~2ms of dispatch, while this is a handful of numpy ops
    (the batched device engine remains the training path)."""
    rots = _HOST_TET[piece]
    mask, rtopo = rots[rotations % len(rots)]
    h, w = mask.shape
    location = max(0, min(location, BOARD_W - w))
    window = board[:, location : location + w]
    has = window.any(axis=0)
    first = window.argmax(axis=0)
    topo = np.where(has, first, BOARD_H)
    drop = int((topo - rtopo).min()) - 1
    if drop < 0:
        return True, 0, drop
    board[drop : drop + h, location : location + w] |= mask
    span = board[drop : drop + h]
    full = span.all(axis=1)
    k = int(full.sum())
    if k:
        keep = np.ones(BOARD_H, dtype=bool)
        keep[drop : drop + h][full] = False
        board[k:] = board[keep]
        board[:k] = False
    return False, k, drop


def _carve_producer(queue, stop, L, M):
    """Carving producer process (reference warm_reset_worker,
    game/tetris.py:473-479)."""
    rng = random.Random()
    while not stop.is_set():
        item = CarvingGenerator(L, M, rng=rng).generate()
        while not stop.is_set():
            try:
                queue.put(item, timeout=0.2)
                break
            except queue_mod.Full:
                continue


def _forward_producer(queue, stop, L, M, parity):
    """Forward generate+prove producer process (reference
    forward_warm_reset_worker, game/tetris.py:482-488). Parity mode pins the
    seed window to 0..100 forever and prepends a random first piece
    (reference quirks, SURVEY.md §3.5)."""
    from .gen.pipeline import generate_batch, translate_batch

    rng = random.Random()
    seed = 0
    while not stop.is_set():
        games = generate_batch(L, M, seed_start=seed, seed_end=seed + 100)
        if not parity:
            seed += 100
        for item in translate_batch(games, M, rng=rng, parity=parity):
            if stop.is_set():
                return
            while not stop.is_set():
                try:
                    queue.put(item, timeout=0.2)
                    break
                except queue_mod.Full:
                    continue


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

        self._queue = None
        self._stop = None
        self._workers: list[multiprocessing.Process] = []
        if self.warm_reset:
            # bounded like the reference's Queue(maxsize=20), game/tetris.py:195;
            # two producer PROCESSES mirroring the reference's pair
            # (game/tetris.py:202-211): carving + forward generate+prove.
            # spawn (not fork): the parent typically has live JAX runtime
            # threads by now, and fork() with threads held is a latent
            # deadlock (CPython warns "os.fork() was called ..."). The
            # producers import only numpy-level code, so spawn start cost
            # is a one-off ~100ms per worker.
            ctx = multiprocessing.get_context("spawn")
            self._mp_ctx = ctx
            self._queue = ctx.Queue(maxsize=20)
            self._stop = ctx.Event()
            self._worker_specs = [
                (_carve_producer, (self._queue, self._stop, L, M)),
                (_forward_producer, (self._queue, self._stop, L, M, parity)),
            ]
            self._restarts = 0
            for target, args in self._worker_specs:
                proc = ctx.Process(target=target, args=args, daemon=True)
                proc.start()
                self._workers.append(proc)

        self._board = np.zeros((BOARD_H, BOARD_W), dtype=bool)
        self.load_warm_reset()

    _MAX_WORKER_RESTARTS = 5

    def _reap_and_restart_workers(self) -> None:
        """Restart dead producers (bounded) so ``reset()`` can't hang forever.

        The reference never restarts a dead worker — a starved queue just
        blocks ``reset()`` for good (game/tetris.py:447, the SURVEY §5.3
        gap). Same policy as the bank path's producer restart
        (gen/bank.py): at most _MAX_WORKER_RESTARTS replacements, reaping
        the dead process first."""
        for i, proc in enumerate(self._workers):
            if (
                not proc.is_alive()
                and not self._stop.is_set()
                and self._restarts < self._MAX_WORKER_RESTARTS
            ):
                proc.join(timeout=1)  # reap
                target, args = self._worker_specs[i]
                fresh = self._mp_ctx.Process(
                    target=target, args=args, daemon=True
                )
                fresh.start()
                self._workers[i] = fresh
                self._restarts += 1

    def load_warm_reset(self) -> None:
        if self.warm_reset:
            while True:
                try:
                    board, pieces = self._queue.get(timeout=2.0)
                    break
                except queue_mod.Empty:
                    # starvation: producers may have died — restart them
                    self._reap_and_restart_workers()
                    if (
                        self._restarts >= self._MAX_WORKER_RESTARTS
                        and not any(p.is_alive() for p in self._workers)
                    ):
                        raise RuntimeError(
                            "warm-reset producers died "
                            f"{self._restarts} restarts ago and the queue "
                            "is empty; failing fast instead of blocking "
                            "reset() forever (reference behavior, "
                            "game/tetris.py:447)"
                        )
        else:
            # render each accepted carve, like the reference's carve loop
            # (game/tetris.py:264-265; render forces cold resets, :181-182)
            render_fn = self.render_frame if self.render else None
            if self.debug:
                board, pieces, solution = CarvingGenerator(
                    self.L, self.M, rng=self._rng, record_solution=True,
                    render_fn=render_fn,
                ).generate()
                self.solution = solution
            else:
                board, pieces = CarvingGenerator(
                    self.L, self.M, rng=self._rng, render_fn=render_fn
                ).generate()
        self._pieces_full = list(pieces)
        self._board = np.array(board, dtype=bool)
        self._cursor = 0
        if not self.parity:
            # reference reset() forgets to zero these (game/tetris.py:438-443)
            self.lines_cleared = 0
            self.moves_used = 0
            self.state = None

    # -- reference API -------------------------------------------------------

    @property
    def board(self) -> np.ndarray:
        return self._board

    @property
    def pieces(self) -> list[int]:
        return [int(p) for p in self._pieces_full[self._cursor:]]

    def move(self, rotations: int, location: int) -> None:
        """Reference ``move`` semantics (game/tetris.py:354-422), host-side."""
        piece = int(self._pieces_full[self._cursor])
        self._cursor += 1  # piece consumed before any check (tetris.py:356)
        topout, k, _ = host_move(self._board, piece, rotations, location)
        if topout:
            self.state = False
        else:
            self.moves_used += 1
            if k == 0:
                if self.moves_used >= self.M:
                    self.state = False
            else:
                self.lines_cleared += k
                if self.lines_cleared >= self.L:
                    self.state = True
                elif self.moves_used >= self.M:
                    self.state = False
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
            # drain so producers blocked on put() can exit, then join
            # (reference protocol, game/tetris.py:451-466)
            try:
                while True:
                    self._queue.get_nowait()
            except queue_mod.Empty:
                pass
            self._queue.close()
            for proc in self._workers:
                proc.join(timeout=10)
                if proc.is_alive():
                    proc.terminate()
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
