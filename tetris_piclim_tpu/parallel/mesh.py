"""Device-mesh sharding for the actor-learner loop.

The reference's only parallelism is two multiprocessing workers and a
process pool on one host (SURVEY.md §2.6, §5.8) — there is nothing
distributed to port. This module is the TPU-native scaling story designed in
its place: a 1-D ``dp`` mesh over all chips; environments and the replay
buffer are sharded along the batch/capacity axis, parameters and the config
bank are replicated, and the whole jitted training chunk runs under GSPMD —
XLA partitions the vmapped env step per-device (embarrassingly parallel,
zero communication) and inserts an ICI ``all-reduce`` exactly once per
update, for the gradients of the replay-sampled TD loss. Multi-host runs
extend the same mesh via ``jax.distributed.initialize`` — the program is
identical, the mesh just spans hosts.

Divisibility contracts: ``num_envs``, ``replay_capacity`` and
``bank row count`` used with a mesh of N devices must be divisible by N
(checked in :func:`shard_train_state`).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))


def replicate(mesh: Mesh, tree):
    """Replicate every leaf across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def shard_bank(mesh: Mesh, bank):
    """Config bank is replicated: every device resets from any row with a
    local gather (no collective on the reset path)."""
    bank.boards = replicate(mesh, bank.boards)
    bank.pieces = replicate(mesh, bank.pieces)
    return bank


def shard_train_state(mesh: Mesh, ts, axis: str = "dp"):
    """Lay out a TrainState for the mesh: env + replay batch-sharded,
    everything else replicated. Returns a new TrainState."""
    n = mesh.shape[axis]
    num_envs = jax.tree.leaves(ts.env)[0].shape[0]
    cap = ts.replay.cols.shape[0]
    if num_envs % n or cap % n:
        raise ValueError(
            f"num_envs ({num_envs}) and replay_capacity ({cap}) must be "
            f"divisible by mesh size {n}"
        )
    rep = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(axis))

    def put_batched(tree):
        return jax.tree.map(
            lambda a: jax.device_put(a, row if a.ndim >= 1 and a.shape[0] in (num_envs, cap) else rep),
            tree,
        )

    return ts._replace(
        params=jax.device_put(ts.params, rep),
        target_params=jax.device_put(ts.target_params, rep),
        opt_state=jax.device_put(ts.opt_state, rep),
        replay=put_batched(ts.replay),
        env=put_batched(ts.env),
        key=jax.device_put(ts.key, rep),
        global_step=jax.device_put(ts.global_step, rep),
        updates_done=jax.device_put(ts.updates_done, rep),
    )
