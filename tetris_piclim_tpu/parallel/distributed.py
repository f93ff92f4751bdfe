"""Multi-host initialization + cross-host utilities.

The reference is strictly single-host (multiprocessing only, SURVEY.md §5.8).
For pod-scale runs: call :func:`init_distributed` once per process before any
JAX computation; the dp mesh in :mod:`.mesh` then spans every process's
devices and the same jitted training chunk runs SPMD across hosts, gradients
all-reduced over ICI within a slice and DCN across slices — no program
changes.

CPU simulation (tests / laptops):
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N``
gives one process an N-device mesh exercising the same partitioning.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize jax.distributed when running multi-process.

    With no arguments, honors the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or TPU
    pod auto-detection; a single-process run is a no-op. Returns a summary
    dict for logging.
    """
    should_init = (
        coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if should_init:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def sync_hosts(tag: int = 0) -> None:
    """Barrier across hosts: a tiny psum over all devices."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import numpy as np

    mesh = Mesh(np.array(jax.devices()), ("all",))
    x = jax.device_put(
        jnp.ones((len(jax.devices()),), jnp.int32),
        NamedSharding(mesh, P("all")),
    )
    jax.block_until_ready(jnp.sum(x))
