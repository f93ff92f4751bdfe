"""Canonical tetromino tables — the single source of truth for piece geometry.

The reference keeps three divergent copies of these tables
(reference: game/tetris.py:23-57, game/tetris_algo_main/TetrisGameGenerator.py:5-13,
game/tetris_algo_main/TetrisSolver.py:5-13). Here there is exactly one canonical,
device-constant table set, precomputed as fixed-shape arrays so the jitted engine
never branches on piece identity.

Two indexing flavors exist in the reference and both are preserved:

* **Engine flavor** (``PIECE_*`` constants): integer piece ids in the order
  I=0, L=1, J=2, T=3, S=4, Z=5, O=6 (reference: game/tetris.py:8-16) with the
  rotation order of game/tetris.py:23-57.
* **Generator flavor** (``GEN_SHAPES``): letter-keyed with the *different*
  rotation order of TetrisGameGenerator.py:5-13 (the two tables rotate in
  opposite directions; only piece identities ever cross the boundary, via
  ``translate`` — reference: game/tetris.py:19-20).

All masks are padded into a 4x4 boolean box anchored at the top-left. Per
(piece, rotation) we precompute:

* ``WIDTH`` / ``HEIGHT`` — true (unpadded) extents,
* ``RTOPO`` ("reverse topography", reference: game/tetris.py:25-57 second tuple
  elements) — for each mask column, the row index (from the top of the mask) of
  the *lowest* filled cell; used for O(1) hard-drop math,
* ``NROT`` — rotation count per piece (I:2, L:4, J:4, T:4, S:2, Z:2, O:1);
  rotation indices wrap modulo this (reference: game/tetris.py:60-61).
"""

from __future__ import annotations

import numpy as np

BOARD_H = 20
BOARD_W = 10
NUM_PIECES = 7
MAX_ROT = 4
MASK_BOX = 4  # all tetromino rotations fit in a 4x4 box

# Engine-flavor piece ids (reference: game/tetris.py:8-16).
PIECE_I, PIECE_L, PIECE_J, PIECE_T, PIECE_S, PIECE_Z, PIECE_O = range(7)
PIECE_NAMES = ("I", "L", "J", "T", "S", "Z", "O")
PIECE_IDS = {name: idx for idx, name in enumerate(PIECE_NAMES)}

# Shape art: '#' = filled. Engine rotation order matches game/tetris.py:23-57.
_ENGINE_ART: dict[str, tuple[tuple[str, ...], ...]] = {
    "I": (
        ("####",),
        ("#", "#", "#", "#"),
    ),
    "L": (
        ("..#", "###"),
        ("##", ".#", ".#"),
        ("###", "#.."),
        ("#.", "#.", "##"),
    ),
    "J": (
        ("#..", "###"),
        (".#", ".#", "##"),
        ("###", "..#"),
        ("##", "#.", "#."),
    ),
    "T": (
        (".#.", "###"),
        (".#", "##", ".#"),
        ("###", ".#."),
        ("#.", "##", "#."),
    ),
    "S": (
        (".##", "##."),
        ("#.", "##", ".#"),
    ),
    "Z": (
        ("##.", ".##"),
        (".#", "##", "#."),
    ),
    "O": (
        ("##", "##"),
    ),
}

# Generator-flavor rotation order (reference: TetrisGameGenerator.py:5-13).
# NOTE: rotation ORDER differs from the engine flavor — preserved exactly so
# seeded `random.randint(0, nrot-1)` draws map to the same shapes.
_GEN_ART: dict[str, tuple[tuple[str, ...], ...]] = {
    "I": (
        ("####",),
        ("#", "#", "#", "#"),
    ),
    "J": (
        ("#..", "###"),
        ("##", "#.", "#."),
        ("###", "..#"),
        (".#", ".#", "##"),
    ),
    "L": (
        ("..#", "###"),
        ("#.", "#.", "##"),
        ("###", "#.."),
        ("##", ".#", ".#"),
    ),
    "O": (
        ("##", "##"),
    ),
    "S": (
        (".##", "##."),
        ("#.", "##", ".#"),
    ),
    "T": (
        (".#.", "###"),
        ("#.", "##", "#."),
        ("###", ".#."),
        (".#", "##", ".#"),
    ),
    "Z": (
        ("##.", ".##"),
        (".#", "##", "#."),
    ),
}

# Piece-name order used by the forward generator's `random.choice`
# (reference: TetrisGameGenerator.py:22).
GEN_NAME_ORDER = ("I", "J", "L", "O", "S", "T", "Z")


def _art_to_mask(art: tuple[str, ...]) -> np.ndarray:
    return np.array([[ch == "#" for ch in row] for row in art], dtype=bool)


def mask_rtopo(mask: np.ndarray) -> np.ndarray:
    """Reverse topography: per column, the row index of the lowest filled cell.

    Matches the second tuple elements at reference game/tetris.py:25-57
    (every tetromino column has at least one filled cell).
    """
    h = mask.shape[0]
    flipped = mask[::-1]
    return (h - 1 - np.argmax(flipped, axis=0)).astype(np.int32)


def _build_engine_tables():
    masks = np.zeros((NUM_PIECES, MAX_ROT, MASK_BOX, MASK_BOX), dtype=bool)
    width = np.zeros((NUM_PIECES, MAX_ROT), dtype=np.int32)
    height = np.zeros((NUM_PIECES, MAX_ROT), dtype=np.int32)
    rtopo = np.zeros((NUM_PIECES, MAX_ROT, MASK_BOX), dtype=np.int32)
    nrot = np.zeros((NUM_PIECES,), dtype=np.int32)
    for pid, name in enumerate(PIECE_NAMES):
        rots = [_art_to_mask(a) for a in _ENGINE_ART[name]]
        nrot[pid] = len(rots)
        for ridx in range(MAX_ROT):
            m = rots[ridx % len(rots)]  # wrap like get_tetromino (tetris.py:60-61)
            h, w = m.shape
            masks[pid, ridx, :h, :w] = m
            width[pid, ridx] = w
            height[pid, ridx] = h
            rt = mask_rtopo(m)
            rtopo[pid, ridx, :w] = rt
            # unused columns stay 0; consumers never read them (engine.step
            # masks invalid columns via valid_col, the bitboard path builds
            # its own sentinel), so no special padding value is needed
            rtopo[pid, ridx, w:] = 0
    return masks, width, height, rtopo, nrot


MASKS, WIDTH, HEIGHT, RTOPO, NROT = _build_engine_tables()

# Generator-flavor shapes as plain nested lists of 0/1 ints, letter-keyed,
# exactly the structure the seeded host generators index into.
GEN_SHAPES: dict[str, list[np.ndarray]] = {
    name: [_art_to_mask(a).astype(np.int64) for a in arts]
    for name, arts in _GEN_ART.items()
}


def get_tetromino(piece: int, rotations: int) -> tuple[np.ndarray, tuple[int, ...]]:
    """Reference-compatible lookup (game/tetris.py:60-61): returns the
    *unpadded* bool mask and its reverse topography tuple."""
    r = rotations % int(NROT[piece])
    h = int(HEIGHT[piece, r])
    w = int(WIDTH[piece, r])
    mask = MASKS[piece, r, :h, :w]
    return mask, tuple(int(x) for x in RTOPO[piece, r, :w])
