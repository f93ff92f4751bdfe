"""Checkpoint / resume for training state (orbax).

The reference has NO model checkpointing at all (its only
"CheckpointManager", game/tetris.py:111-137, is the carver's backtracking
stack — an unrelated in-algorithm structure; SURVEY.md §5.4). Here the full
TrainState — params, target params, optimizer state, replay buffer, env
states, RNG key, counters — round-trips through orbax, so a training run can
resume exactly where it stopped.
"""

from __future__ import annotations

import os

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except ImportError:  # pragma: no cover - orbax is baked into the image
    _HAS_ORBAX = False


def save_train_state(path: str, state) -> None:
    """Save a TrainState pytree to ``path`` (directory)."""
    path = os.path.abspath(path)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
        ckptr.wait_until_finished()
    else:  # minimal .npz fallback
        flat, treedef = jax.tree.flatten(state)
        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "state.npz"),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
        )


def restore_params(path: str) -> tuple:
    """Load ONLY the network parameters ``(params, target_params)`` from a
    TrainState checkpoint written by :func:`save_train_state`.

    Unlike :func:`restore_train_state` this needs no template, so the source
    run may differ in num_envs / replay capacity / task (L, M) — the use case
    is warm-starting a harder task from an easier one's weights (curriculum
    transfer), which the reference cannot do at all (SURVEY.md §5.4)."""
    if not _HAS_ORBAX:
        raise RuntimeError("params-only restore requires orbax")
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(path)
    to_dev = lambda tree: jax.tree.map(jax.numpy.asarray, tree)
    return to_dev(raw["params"]), to_dev(raw["target_params"])


def save_bank(path: str, bank) -> str:
    """Serialize the LIVE rows of a :class:`gen.bank.ConfigBank` next to a
    TrainState checkpoint (``<path>/bank.npz``).

    A ``--device-refresh`` training run churns its bank every K chunks, so
    the distribution the policy actually trained on is the FINAL bank rows —
    not the initial fill an eval-side rebuild would produce. Reading
    ``_host_boards`` re-materializes the host mirror from the device if the
    all-device refresh fast path left it stale."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, "bank.npz")
    np.savez_compressed(
        out,
        boards=np.asarray(bank._host_boards),
        pieces=np.asarray(bank._host_pieces),
        family=np.asarray(bank._family),
        meta=np.asarray([bank.L, bank.M, bank.capacity], dtype=np.int64),
    )
    return out


def restore_bank(path: str, device=None):
    """Rebuild a ConfigBank from :func:`save_bank` output. ``path`` may be
    the checkpoint directory or the ``bank.npz`` file itself."""
    from ..gen.bank import ConfigBank

    path = os.path.abspath(path)
    if os.path.isdir(path):
        path = os.path.join(path, "bank.npz")
    data = np.load(path)
    L, M, capacity = (int(x) for x in data["meta"])
    bank = ConfigBank(L, M, capacity=capacity, device=device)
    bank._host_boards = data["boards"].astype(bool)
    bank._host_pieces = data["pieces"].astype(np.int8)
    bank._family[:] = data["family"]
    bank._fill_count = capacity
    bank._upload()
    return bank


def restore_train_state(path: str, template):
    """Restore a TrainState saved by :func:`save_train_state`; ``template``
    provides the pytree structure/dtypes (an untrained TrainState)."""
    path = os.path.abspath(path)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        target = jax.tree.map(np.asarray, template)
        restored = ckptr.restore(path, target)
        return jax.tree.map(jax.numpy.asarray, restored)
    data = np.load(os.path.join(path, "state.npz"))
    flat, treedef = jax.tree.flatten(template)
    leaves = [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(len(flat))]
    return jax.tree.unflatten(treedef, leaves)
