"""7-bag piece randomizer (host-side) + on-device bag sequences.

Public form of the reference's ``RandomPieceGenerator``
(reference: game/tetris.py:64-108): draw pieces without replacement from a
bag of the 7 tetrominoes; refill when empty and report the refill (the
refill signal drives checkpointing in the carving generator — reference
game/tetris.py:239). ``sequence(n)`` concatenates shuffled bags and
truncates (reference game/tetris.py:95-102).

``bag_sequences_device`` is the TPU-native batched equivalent: N independent
7-bag sequences in one shot via per-bag ``jax.random.permutation``.
"""

from __future__ import annotations

import random as _random_module

import jax
import jax.numpy as jnp


class SevenBag:
    """Draws report ``(piece, index, refilled)``; failed consumers may keep
    the piece in the bag (``remove`` is explicit, like the reference's
    ``delete_index`` — game/tetris.py:88-89)."""

    def __init__(self, rng=None) -> None:
        self.rng = rng if rng is not None else _random_module
        self.pieces: list[int] = []

    def refill(self) -> None:
        self.pieces = list(range(7))

    def draw(self) -> tuple[int, int, bool]:
        refilled = False
        if not self.pieces:
            self.refill()
            refilled = True
        idx = self.rng.randint(0, len(self.pieces) - 1)
        return self.pieces[idx], idx, refilled

    def remove(self, idx: int) -> None:
        del self.pieces[idx]

    def sequence(self, length: int) -> list[int]:
        """Concatenated shuffled bags, truncated to ``length``. A non-empty
        current bag is shuffled and consumed first (reference
        game/tetris.py:91-102 semantics, incl. the partial first bag)."""
        out: list[int] = []
        while len(out) < length:
            if not self.pieces:
                self.refill()
            self.rng.shuffle(self.pieces)
            out.extend(self.pieces[: min(length - len(out), 7)])
            self.pieces = []
        return out

    def __len__(self) -> int:
        return len(self.pieces)


def bag_sequences_device(key: jax.Array, n: int, length: int) -> jax.Array:
    """int8[n, length]: N independent 7-bag sequences, fully on device."""
    n_bags = -(-length // 7)
    keys = jax.random.split(key, n * n_bags).reshape(n, n_bags, 2)

    def one_bag(k):
        return jax.random.permutation(k, jnp.arange(7, dtype=jnp.int8))

    bags = jax.vmap(jax.vmap(one_bag))(keys)       # [n, n_bags, 7]
    return bags.reshape(n, n_bags * 7)[:, :length]
