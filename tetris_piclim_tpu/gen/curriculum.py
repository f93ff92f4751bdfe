"""Curriculum over (L, M, initial-config density) with per-env levels.

The engine carries ``lines_goal``/``move_limit`` as *per-env dynamic* scalars
(engine.py EnvState), so one compiled step serves a heterogeneous population
of difficulties — the curriculum axis of BASELINE.json config 4. This module
supplies the missing piece: per-level banks of winnable configurations and an
auto-reset that draws each env's fresh config from the bank matching its
level, plus host-side promotion logic between training chunks.

The reference has no curriculum (L and M are fixed per Tetris instance,
game/tetris.py:141); this is new capability layered on the same generators.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bitboard
from .jax_carver import generate_batch_device


class CurriculumBank(NamedTuple):
    """Stacked per-level banks. Level k holds configs carved for
    (L=lines[k], M=moves[k])."""

    boards: jax.Array   # uint32[K, B, 10] — packed
    pieces: jax.Array   # int8[K, B, P]
    lines: jax.Array    # int32[K]
    moves: jax.Array    # int32[K]


def build_curriculum_bank(
    key: jax.Array,
    levels: Sequence[tuple[int, int]],
    capacity: int,
) -> CurriculumBank:
    """Carve ``capacity`` winnable configs per (L, M) level on device.

    All levels share one piece-buffer length P = max(M)+1; shorter levels
    pad their sequences (the engine reads only cursor-indexed entries)."""
    max_m = max(m for _, m in levels)
    P = max_m + 1
    boards, pieces = [], []
    for i, (L, M) in enumerate(levels):
        k = jax.random.fold_in(key, i)
        batch = jax.jit(
            generate_batch_device, static_argnames=("n", "L", "M")
        )(k, n=capacity, L=L, M=M)
        boards.append(batch.boards)
        seq = batch.pieces
        if seq.shape[1] < P:
            k2 = jax.random.fold_in(k, 1)
            pad = jax.random.randint(
                k2, (capacity, P - seq.shape[1]), 0, 7, dtype=jnp.int8
            )
            seq = jnp.concatenate([seq, pad], axis=1)
        pieces.append(seq)
    return CurriculumBank(
        boards=jnp.stack(boards),
        pieces=jnp.stack(pieces),
        lines=jnp.asarray([l for l, _ in levels], jnp.int32),
        moves=jnp.asarray([m for _, m in levels], jnp.int32),
    )


def make_states(bank: CurriculumBank, level: jax.Array, key: jax.Array):
    """Fresh PackedState batch with per-env levels ``level`` (int32[N])."""
    n = level.shape[0]
    idx = jax.random.randint(key, (n,), 0, bank.boards.shape[1])
    return bitboard.PackedState(
        cols=bank.boards[level, idx],
        pieces=bank.pieces[level, idx],
        cursor=jnp.zeros((n,), jnp.int32),
        lines_cleared=jnp.zeros((n,), jnp.int32),
        moves_used=jnp.zeros((n,), jnp.int32),
        lines_goal=bank.lines[level],
        move_limit=bank.moves[level],
        status=jnp.zeros((n,), jnp.int8),
    )


def step_autoreset_curriculum(
    states: bitboard.PackedState,
    rotations: jax.Array,
    locations: jax.Array,
    bank: CurriculumBank,
    level: jax.Array,       # int32[N] — each env's current level
    key: jax.Array,
) -> tuple[bitboard.PackedState, "bitboard.StepResult"]:
    """Step; terminal envs reset from the bank of THEIR level (and pick up
    that level's L/M, so levels can be changed between steps)."""
    res = bitboard.step(states, rotations, locations)
    fresh = make_states(bank, level, key)
    done = res.done
    nxt = jax.tree.map(
        lambda f, s: jnp.where(done.reshape((-1,) + (1,) * (f.ndim - 1)), f, s),
        fresh, res.state,
    )
    return nxt, res


def promote_levels(
    level: np.ndarray,
    win_rate_per_level: np.ndarray,
    n_levels: int,
    threshold: float = 0.8,
    fraction: float = 0.5,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Host-side promotion between chunks: if a level's recent win rate
    clears ``threshold``, move ``fraction`` of its envs up one level."""
    rng = rng or np.random.default_rng(0)
    level = level.copy()
    for k in range(n_levels - 1):
        if win_rate_per_level[k] >= threshold:
            members = np.flatnonzero(level == k)
            n_up = int(len(members) * fraction)
            if n_up:
                level[rng.choice(members, n_up, replace=False)] = k + 1
    return level
