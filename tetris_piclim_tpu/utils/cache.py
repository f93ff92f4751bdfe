"""Persistent XLA compilation cache for every entry point.

The reference is interpreted numpy and compiles nothing; here every jitted
program is compiled for the TPU through a remote tunnel at ~25-90 s per
program (the device-forward prove program peaked at 20+ minutes, and round-2's
headline bench recorded compile=1292.5 s against a 0.18 s/run steady state).
JAX's persistent compilation cache makes each program a one-time cost per
machine, so no run can lose 20+ minutes to a known-compiled executable.

Round 2 only exported ``JAX_COMPILATION_CACHE_DIR`` from a couple of shell
scripts; this module wires the cache into the Python entry points themselves
(cli, bench.py, benchmarks/, __graft_entry__) so it is on no matter how a
program is launched.
"""

from __future__ import annotations

import os
import pathlib

# repo root: utils/cache.py -> tetris_piclim_tpu -> repo
_DEFAULT_DIR = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_compilation_cache() -> str:
    """Point JAX at the persistent on-disk compile cache (idempotent).

    ``JAX_COMPILATION_CACHE_DIR`` still wins if set; otherwise the cache
    lives at the repo root. Safe to call before or after other jax.config
    updates, but must run before the first compilation to be useful.
    """
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR", str(_DEFAULT_DIR))
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # cache even fast-compiling programs: on the remote tunnel the floor
    # cost is dispatch latency, not compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
