"""Offline max_attempts auto-tuner.

Behavioral re-implementation of the reference's ``minimize_max_attempts``
(reference: game/tetris_algo_main/minimization.py:1-30): given
``{"solvable", "failed_attempts"}`` stats from a probe batch, pick the
solver give-up cutoff that maximizes solved-games-per-unit-of-work. Not
wired into the live pipeline in the reference either (the caller is
commented out at game/tetris_algo_main/main.py:46-58); exposed here as a
utility plus a ``probe_and_tune`` convenience that actually runs the probe
batch the reference left commented out.

The work model follows the reference exactly: for a candidate cutoff ``A``
(each observed ``failed_attempts + 1`` of a solvable game), total work is
``A * n_games`` minus the attempts saved by games that solve before the
cutoff, and "solved" counts each game once at exactly its observed
attempt count; efficiency = solved / work.
"""

from __future__ import annotations

from typing import Sequence


def minimize_max_attempts(attempts: Sequence[dict]) -> int:
    """Pick the best cutoff. Parity with the reference (identical candidate
    set, work model and tie handling — first best wins)."""
    size = len(attempts)
    best_cutoff = 0
    best_ratio = 0.0
    seen: set[tuple] = set()

    for rec in attempts:
        key = tuple(rec.items())
        if key in seen or not rec["solvable"]:
            continue
        seen.add(key)

        cutoff = rec["failed_attempts"] + 1
        solved = 0
        work = cutoff * size
        for j in range(cutoff * size):
            attempt_no = j // size + 1
            r = attempts[j % size]
            if r["solvable"] and r["failed_attempts"] + 1 == attempt_no:
                solved += 1
                work -= cutoff - attempt_no

        ratio = solved / work
        if ratio > best_ratio:
            best_ratio = ratio
            best_cutoff = cutoff

    return best_cutoff


def probe_and_tune(
    L: int,
    M: int,
    probe_seeds: int = 50,
    initial_height_max: int = 4,
    probe_max_attempts: int = 1000,
    workers=None,
) -> int:
    """Run a probe batch and return the tuned cutoff — the auto-tuning pass
    the reference sketched but left commented out (main.py:46-58)."""
    from concurrent.futures import ThreadPoolExecutor

    from .forward import ForwardGenerator
    from .solver import GreedyDFSSolver

    def probe(seed):
        g = ForwardGenerator(
            seed=seed, goal=L, num_pieces=M,
            initial_height_max=initial_height_max,
        )
        solver = GreedyDFSSolver(
            g.board, g.sequence, L, max_attempts=probe_max_attempts
        )
        ok, _, failed = solver.solve()
        return {"solvable": ok, "failed_attempts": failed}

    with ThreadPoolExecutor(max_workers=workers) as pool:
        stats = list(pool.map(probe, range(probe_seeds)))
    return minimize_max_attempts(stats)
