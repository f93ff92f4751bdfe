"""Packed-bitboard Tetris-piclim step — the production hot path.

The 20x10 board is 10 uint32 **column bitmasks** (bit r set = cell (r, c)
filled; bit 0 = top row). The entire hard-drop step of the reference
(game/tetris.py:354-433) becomes branch-free vector bit arithmetic:

* column topography = count-trailing-zeros (via popcount of ``~x & (x-1)``),
  replacing per-column ``np.where`` scans (reference game/tetris.py:427-433);
* drop = min over a precomputed, board-aligned reverse-topography table —
  one tiny gather per env, indexed by (piece, rotation, column);
* lock = ``cols |= piece_colmask << drop``;
* line clear = up to 4 lowest-set-bit delete-and-shift rounds, replacing the
  fancy-index + vstack (reference game/tetris.py:396-407) and the array
  engine's stable argsort;
* full rows = 10-way AND reduce, masked to the piece's row span (only rows
  the piece touched can clear — reference game/tetris.py:381-386).

No sorts, no per-env dynamic slices; the only gathers are three table rows
(piece id from the sequence, aligned column masks, aligned rtopo) — all
indexed by one flat scalar per env. Everything is batch-first [N, ...]: no
vmap, so XLA sees clean [N, 10] uint32 elementwise ops that map straight
onto the VPU.

Step-equivalence with the parity-reference array engine
(:mod:`tetris_piclim_tpu.engine`) is enforced by tests/test_bitboard.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from ..engine import LOSS, RUNNING, WIN, StepResult

H, W = tables.BOARD_H, tables.BOARD_W
_FULL20 = np.uint32((1 << H) - 1)
_BIG = jnp.int32(1 << 20)
_NEG_BIG = -(1 << 20)


def _build_aligned_tables():
    """COLMASK10[p, r, loc, j]: uint32 column mask of piece p/rotation r
    placed at column loc, for board column j (0 if outside the piece).
    RTOPO10 same indexing, with -BIG sentinel outside the piece so
    ``topo - rtopo`` can never win the min. Flattened to [7*4*10, 10] for a
    single-scalar-index gather per env."""
    colmask = np.zeros((7, 4, 10, 10), dtype=np.uint32)
    rtopo10 = np.full((7, 4, 10, 10), _NEG_BIG, dtype=np.int32)
    heights = np.zeros((7, 4), dtype=np.int32)
    for p in range(7):
        for r in range(4):
            mask = tables.MASKS[p, r]  # 4x4 top-left anchored
            w = int(tables.WIDTH[p, r])
            h = int(tables.HEIGHT[p, r])
            heights[p, r] = h
            rt = tables.RTOPO[p, r]
            cm = np.zeros(4, dtype=np.uint32)
            for c in range(4):
                bits = 0
                for row in range(4):
                    if mask[row, c]:
                        bits |= 1 << row
                cm[c] = bits
            for loc in range(10):
                for c in range(w):
                    j = loc + c
                    if j < 10:
                        colmask[p, r, loc, j] = cm[c]
                        rtopo10[p, r, loc, j] = rt[c]
    return (
        jnp.asarray(colmask.reshape(7 * 4 * 10, 10)),
        jnp.asarray(rtopo10.reshape(7 * 4 * 10, 10)),
        jnp.asarray(heights),
    )


_COLMASK10, _RTOPO10, _HEIGHT = _build_aligned_tables()
_WIDTH = jnp.asarray(tables.WIDTH)
_NROT = jnp.asarray(tables.NROT)


class PackedState(NamedTuple):
    """Batch-first packed env state. All leaves have leading axis N."""

    cols: jax.Array          # uint32[N, 10] — column bitmasks
    pieces: jax.Array        # int8[N, P]
    cursor: jax.Array        # int32[N]
    lines_cleared: jax.Array  # int32[N]
    moves_used: jax.Array     # int32[N]
    lines_goal: jax.Array     # int32[N]
    move_limit: jax.Array     # int32[N]
    status: jax.Array         # int8[N]


# -- packing -----------------------------------------------------------------

def pack_board(board: jax.Array) -> jax.Array:
    """bool[..., 20, 10] -> uint32[..., 10]."""
    weights = (jnp.uint32(1) << jnp.arange(H, dtype=jnp.uint32))[:, None]
    return jnp.sum(board.astype(jnp.uint32) * weights, axis=-2, dtype=jnp.uint32)


def unpack_board(cols: jax.Array) -> jax.Array:
    """uint32[..., 10] -> bool[..., 20, 10]."""
    shifts = jnp.arange(H, dtype=jnp.uint32)[:, None]
    return ((cols[..., None, :] >> shifts) & 1).astype(bool)


def make_state_batch(boards, pieces, lines_goal, move_limit) -> PackedState:
    boards = jnp.asarray(boards)
    if boards.dtype == jnp.uint32:
        cols = boards
    else:
        cols = pack_board(boards.astype(bool))
    n = cols.shape[0]
    return PackedState(
        cols=cols,
        pieces=jnp.asarray(pieces, jnp.int8),
        cursor=jnp.zeros((n,), jnp.int32),
        lines_cleared=jnp.zeros((n,), jnp.int32),
        moves_used=jnp.zeros((n,), jnp.int32),
        lines_goal=jnp.broadcast_to(jnp.asarray(lines_goal, jnp.int32), (n,)),
        move_limit=jnp.broadcast_to(jnp.asarray(move_limit, jnp.int32), (n,)),
        status=jnp.zeros((n,), jnp.int8),
    )


# -- bit helpers -------------------------------------------------------------

def _ctz20(x: jax.Array) -> jax.Array:
    """Index of lowest set bit; 20 (board height) when empty — the packed
    'first filled row from the top' (reference game/tetris.py:429-431)."""
    t = jax.lax.population_count((~x) & (x - jnp.uint32(1)))
    return jnp.where(x == 0, jnp.int32(H), t.astype(jnp.int32))


# -- the step ----------------------------------------------------------------

def step(state: PackedState, rotations: jax.Array, locations: jax.Array) -> StepResult:
    """Batched hard-drop step on packed boards; exact semantics of
    engine.step / reference move (game/tetris.py:354-433)."""
    n = state.cols.shape[0]
    piece = jnp.take_along_axis(
        state.pieces, state.cursor[:, None].astype(jnp.int32), axis=1
    )[:, 0].astype(jnp.int32)
    r = jnp.mod(rotations.astype(jnp.int32), _NROT[piece])
    w = _WIDTH[piece, r]
    h = _HEIGHT[piece, r]
    loc = jnp.clip(locations.astype(jnp.int32), 0, W - w)

    flat = (piece * 4 + r) * 10 + loc                     # [N]
    aligned_mask = _COLMASK10[flat]                       # uint32[N, 10]
    aligned_rtopo = _RTOPO10[flat]                        # int32[N, 10]

    topo = _ctz20(state.cols)                             # int32[N, 10]
    deltas = topo - aligned_rtopo                         # invalid cols ≈ +BIG
    drop = jnp.min(deltas, axis=1) - 1                    # [N]
    topout = drop < 0

    drop_c = jnp.maximum(drop, 0).astype(jnp.uint32)[:, None]
    locked = state.cols | (aligned_mask << drop_c)

    # full rows within the piece span
    full = locked[:, 0]
    for c in range(1, W):
        full = full & locked[:, c]
    span = (
        ((jnp.uint32(1) << h.astype(jnp.uint32)) - 1)
        << jnp.maximum(drop, 0).astype(jnp.uint32)
    )
    cm = full & span
    k = jax.lax.population_count(cm).astype(jnp.int32)

    # delete-and-shift each cleared row, topmost first (4 static rounds)
    board = locked
    cmw = cm
    for _ in range(4):
        active = cmw != 0
        lsb = cmw & (~cmw + jnp.uint32(1))
        low = lsb - jnp.uint32(1)
        keep_hi = ~((lsb << 1) - jnp.uint32(1))
        newb = ((board & low[:, None]) << 1) | (board & keep_hi[:, None])
        board = jnp.where(active[:, None], newb, board)
        cmw = cmw & (cmw - jnp.uint32(1))

    moves_used = state.moves_used + 1
    lines = state.lines_cleared + k

    prev = state.status
    status_noclear = jnp.where(moves_used >= state.move_limit, LOSS, prev)
    status_clear = jnp.where(
        lines >= state.lines_goal,
        WIN,
        jnp.where(moves_used >= state.move_limit, LOSS, prev),
    )
    status = jnp.where(
        topout, LOSS, jnp.where(k > 0, status_clear, status_noclear)
    ).astype(jnp.int8)

    new_state = PackedState(
        cols=jnp.where(topout[:, None], state.cols, board),
        pieces=state.pieces,
        cursor=state.cursor + 1,
        lines_cleared=jnp.where(topout, state.lines_cleared, lines),
        moves_used=jnp.where(topout, state.moves_used, moves_used),
        lines_goal=state.lines_goal,
        move_limit=state.move_limit,
        status=status,
    )
    lines_delta = jnp.where(topout, 0, k)
    done = status != RUNNING
    return StepResult(new_state, lines_delta, done, status == WIN)


step_batch = step  # batch-first by construction


def observe(state: PackedState) -> jax.Array:
    """[N, 217] observation — same encoding as engine.observe."""
    p = state.pieces.shape[1]
    cur = jnp.take_along_axis(
        state.pieces, jnp.clip(state.cursor, 0, p - 1)[:, None], axis=1
    )[:, 0].astype(jnp.int32)
    nxt = jnp.take_along_axis(
        state.pieces, jnp.clip(state.cursor + 1, 0, p - 1)[:, None], axis=1
    )[:, 0].astype(jnp.int32)
    board = unpack_board(state.cols).astype(jnp.float32)
    status_f = jnp.where(
        state.status == WIN, 1.0, jnp.where(state.status == LOSS, -1.0, 0.0)
    )
    return jnp.concatenate(
        [
            board.reshape(board.shape[0], -1),
            jax.nn.one_hot(cur, tables.NUM_PIECES, dtype=jnp.float32),
            jax.nn.one_hot(nxt, tables.NUM_PIECES, dtype=jnp.float32),
            jnp.stack(
                [
                    (state.lines_goal - state.lines_cleared).astype(jnp.float32),
                    (state.move_limit - state.moves_used).astype(jnp.float32),
                    status_f,
                ],
                axis=1,
            ),
        ],
        axis=1,
    )


observe_batch = observe


def step_autoreset_batch(
    states: PackedState,
    rotations: jax.Array,
    locations: jax.Array,
    bank_cols: jax.Array,     # uint32[B, 10] (packed) or bool[B, 20, 10]
    bank_pieces: jax.Array,   # int8[B, P]
    key: jax.Array,
) -> tuple[PackedState, StepResult]:
    """Step; terminal envs are swapped for fresh bank configs. One batched
    randint — no per-env key splits."""
    res = step(states, rotations, locations)
    n = states.cols.shape[0]
    if bank_cols.dtype != jnp.uint32:
        bank_cols = pack_board(jnp.asarray(bank_cols).astype(bool))
    idx = jax.random.randint(key, (n,), 0, bank_cols.shape[0])
    fresh = PackedState(
        cols=bank_cols[idx],
        pieces=bank_pieces[idx],
        cursor=jnp.zeros((n,), jnp.int32),
        lines_cleared=jnp.zeros((n,), jnp.int32),
        moves_used=jnp.zeros((n,), jnp.int32),
        lines_goal=states.lines_goal,
        move_limit=states.move_limit,
        status=jnp.zeros((n,), jnp.int8),
    )
    done = res.done
    next_state = jax.tree.map(
        lambda f, s: jnp.where(done.reshape((-1,) + (1,) * (f.ndim - 1)), f, s),
        fresh, res.state,
    )
    return next_state, res


def from_env_state(env_state) -> PackedState:
    """Convert a batched engine.EnvState to PackedState."""
    return PackedState(
        cols=pack_board(env_state.board),
        pieces=env_state.pieces,
        cursor=env_state.cursor,
        lines_cleared=env_state.lines_cleared,
        moves_used=env_state.moves_used,
        lines_goal=env_state.lines_goal,
        move_limit=env_state.move_limit,
        status=env_state.status,
    )


def to_board(state: PackedState) -> jax.Array:
    return unpack_board(state.cols)
