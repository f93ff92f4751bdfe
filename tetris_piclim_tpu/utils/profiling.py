"""Profiling hooks.

The reference's only tracing is ad-hoc cProfile in ``__main__`` blocks
(reference: TetrisSolver.py:199-207, TetrisGameGenerator.py:131-132). TPU
equivalents: ``jax.profiler`` traces (Perfetto/TensorBoard-compatible) and a
simple wall-clock section timer for host-side stages.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace if a logdir is given, else a no-op."""
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield


class SectionTimer:
    """Accumulating wall-clock timer for host-side stages (bank refresh,
    generation, upload)."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict[str, dict]:
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k]}
            for k, v in self.totals.items()
        }
