"""Batch generation + winnability-proving pipeline (host-side).

Replaces the reference's two ``multiprocessing.Pool`` fan-outs
(reference: game/tetris_algo_main/main.py:26-95): generate candidate games
from a seed range, prove each winnable with the greedy DFS solver, keep the
winnable ones. The process pool is swapped for a thread pool: the hot loops
are numpy (GIL-releasing) and the results feed a device upload, so threads
avoid the pickle tax the reference pays.

Quirk policy (SURVEY.md §3.5, §7): the reference always uses seeds
``range(0, 100)``, so its forward warm-reset worker reproduces the same 100
boards forever; and its ``translate`` (game/tetris.py:19-20) PREPENDS one
uniformly-random piece to every proven sequence — the random piece is played
*first*, shifting the proven-solvable sequence by one. Both behaviors are
reproduced under ``parity=True`` and fixed otherwise (rotating seed windows,
no prepended piece, sequence padded to M+1 like the carver's output).
"""

from __future__ import annotations

import random
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

from ..tables import PIECE_IDS
from .forward import ForwardGenerator
from .solver import GreedyDFSSolver

DEFAULT_INITIAL_HEIGHT_MAX = 4  # reference game/tetris_algo_main/main.py:38
DEFAULT_MAX_ATTEMPTS = 1000     # reference game/tetris_algo_main/main.py:41
DEFAULT_BATCH = 100             # reference seeds range(0, 100), main.py:39-40


def _prove_one(args):
    seed, L, M, initial_height_max, max_attempts = args
    game = ForwardGenerator(
        seed=seed, goal=L, num_pieces=M, initial_height_max=initial_height_max
    )
    solver = GreedyDFSSolver(game.board, game.sequence, L, max_attempts=max_attempts)
    solvable, _, _ = solver.solve()
    return game if solvable else None


def generate_batch(
    L: int,
    M: int,
    seed_start: int = 0,
    seed_end: int = DEFAULT_BATCH,
    initial_height_max: int = DEFAULT_INITIAL_HEIGHT_MAX,
    max_attempts: int = DEFAULT_MAX_ATTEMPTS,
    workers: Optional[int] = None,
    executor: str = "thread",
) -> list[ForwardGenerator]:
    """Generate + prove seeds [seed_start, seed_end); return winnable games
    (reference ``generate_batch``, game/tetris_algo_main/main.py:26-95).

    ``executor="process"`` uses a spawn-context process pool (the
    reference's design, main.py:31) instead of threads; see
    benchmarks/bench_generation.py for the measured thread-vs-process
    comparison on this workload."""
    jobs = [
        (s, L, M, initial_height_max, max_attempts)
        for s in range(seed_start, seed_end)
    ]
    if executor == "process":
        import multiprocessing
        from concurrent.futures import ProcessPoolExecutor

        # spawn, not fork: callers typically hold live JAX runtime threads
        ctx = multiprocessing.get_context("spawn")
        with ProcessPoolExecutor(max_workers=workers, mp_context=ctx) as pool:
            results = list(pool.map(_prove_one, jobs, chunksize=8))
    else:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            results = list(pool.map(_prove_one, jobs))
    return [g for g in results if g is not None]


def translate_batch(
    games: list[ForwardGenerator],
    M: int,
    rng: Optional[random.Random] = None,
    parity: bool = True,
) -> list[tuple[np.ndarray, list[int]]]:
    """Letter sequences -> engine piece ids.

    ``parity=True`` reproduces reference ``translate`` (game/tetris.py:19-20):
    one random piece is PREPENDED (played first — a quirk that perturbs the
    proven sequence). ``parity=False`` keeps the proven sequence intact and
    appends one random tail piece instead, so the sequence still has the
    M+1 length the engine expects.
    """
    rng = rng or random
    out = []
    for g in games:
        ids = [PIECE_IDS[letter] for letter in g.sequence]
        extra = rng.randint(0, 6)
        seq = [extra] + ids if parity else ids + [extra]
        out.append((g.board.astype(bool), seq))
    return out
