"""Producer-process entry points for the async bank refresh.

Top-level functions (spawn-picklable) mirroring the reference's two
warm-reset workers (reference: game/tetris.py:473-488). They run in separate
PROCESSES — the generators are GIL-bound Python/numpy, so producer threads
would steal interpreter time from the training dispatch loop; processes give
true parallelism, exactly the conclusion the reference reached with its
multiprocessing design.

Each producer puts ``(family, [(board, pieces), ...])`` batches on a bounded
queue; the consumer thread in the trainer process swaps them into bank rows.
"""

from __future__ import annotations

import queue as queue_mod
import random

FAMILY_CARVE = 0
FAMILY_FORWARD = 1


def _put(queue, stop, item) -> None:
    """Bounded put that stays responsive to the stop event (the reference's
    producers block forever on a full queue; terminate() must drain it —
    game/tetris.py:451-466. The timeout loop needs no drain)."""
    while not stop.is_set():
        try:
            queue.put(item, timeout=0.2)
            return
        except queue_mod.Full:
            continue


def carve_producer(queue, stop, L, M, seed, batch) -> None:
    """Carving producer (reference warm_reset_worker, game/tetris.py:473-479)."""
    from .carver import CarvingGenerator

    rng = random.Random(seed)
    while not stop.is_set():
        items = []
        for _ in range(batch):
            if stop.is_set():
                return
            items.append(CarvingGenerator(L, M, rng=rng).generate())
        _put(queue, stop, (FAMILY_CARVE, items))


def forward_producer(
    queue, stop, L, M, parity, seed_start, window, seed
) -> None:
    """Forward generate+prove producer (reference forward_warm_reset_worker,
    game/tetris.py:482-488) over ROTATING seed windows — the reference pins
    seeds 0..99 and reproduces the same 100 boards forever (SURVEY.md §3.5)."""
    from .pipeline import generate_batch, translate_batch

    rng = random.Random(seed)
    s = seed_start
    while not stop.is_set():
        games = generate_batch(L, M, seed_start=s, seed_end=s + window)
        s += window
        items = translate_batch(games, M, rng=rng, parity=parity)
        if items and not stop.is_set():
            _put(queue, stop, (FAMILY_FORWARD, items))
