"""Pallas fused-rollout kernel vs the jitted scan, on real TPU.

Also validates the in-kernel PRNG on hardware (the CPU interpreter stubs
prng_random_bits to zeros): after a rollout with a real RNG the envs must
have dispersed move counters and nonzero episode counts per tile.
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from tetris_piclim_tpu.ops import bitboard, pallas_rollout
from tetris_piclim_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N = 8192
STEPS = 1024
BANK = 256


def main() -> None:
    boards = jnp.zeros((N, 20, 10), bool)
    pieces = jnp.broadcast_to(jnp.arange(21, dtype=jnp.int8) % 7, (N, 21))
    state = bitboard.make_state_batch(boards, pieces, 2, 20)
    bank_boards = jnp.zeros((BANK, 20, 10), bool).at[:, 19, :4].set(True)
    bank_cols = bitboard.pack_board(bank_boards)
    bank_pieces = jnp.broadcast_to(
        jnp.arange(21, dtype=jnp.int8) % 7, (BANK, 21)
    )

    fused = jax.jit(
        pallas_rollout.rollout_fused, static_argnames=("n_steps", "tile")
    )
    ns, eps, wins = fused(
        state, bank_cols, bank_pieces, jnp.int32(0), n_steps=STEPS
    )
    jax.block_until_ready(ns.cols)

    # RNG sanity on hardware: dispersed counters, episodes happened
    moves = np.asarray(ns.moves_used)
    disp = len(np.unique(moves))
    print(json.dumps({
        "check": "kernel_rng_dispersion",
        "unique_move_counters": int(disp),
        "episodes": int(eps),
        "ok": bool(disp > 3 and int(eps) > N),
    }))

    times = []
    for i in range(5):
        t0 = time.time()
        ns, eps, wins = fused(
            state, bank_cols, bank_pieces, jnp.int32(i), n_steps=STEPS
        )
        jax.block_until_ready(ns.cols)
        times.append(time.time() - t0)
    sps = N * STEPS / min(times)
    print(json.dumps({
        "bench": "pallas_fused_rollout_steps_per_s",
        "value": round(sps, 1),
        "best_s": round(min(times), 4),
        "scan_reference": 27_100_000,
    }))


if __name__ == "__main__":
    main()
