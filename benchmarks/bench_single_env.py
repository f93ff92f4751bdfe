"""Single-env API move throughput — the reference's perf harness
(game/performance_test.py:9-22, stale there; corrected here): random moves
with auto-reset through the drop-in `Tetris` class.

The single-env class steps on the HOST (pure numpy — a per-move device
round-trip would cost ~2ms of dispatch); measured on this box: ~70k pure
moves/s vs the reference's ~63k, and warm-reset episodes at parity with the
reference's producer-process pipeline. Use the batched device engine for
training — it is ~1000x faster. Prints one JSON line.
"""

from __future__ import annotations

import json
import random
import time

from tetris_piclim_tpu.env_api import Tetris

N_MOVES = 20_000


def main() -> None:
    rng = random.Random(0)
    t = Tetris(2, 20, warm_reset=True, seed=0)
    # warmup (jit compile of the single-env step)
    t.move(0, 0)
    t.reset()

    t0 = time.time()
    for _ in range(N_MOVES):
        t.move(rng.randint(0, 3), rng.randint(0, 9))
        if t.state is not None:
            t.reset()
    dt = time.time() - t0
    t.terminate()
    print(json.dumps({
        "bench": "single_env_api_moves_per_s",
        "value": round(N_MOVES / dt, 1),
        "reference_1core": 49000.0,
        "note": "host numpy single-env path; batched device engine is ~1000x faster",
    }))


if __name__ == "__main__":
    main()
