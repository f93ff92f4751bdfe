"""Pure-functional Tetris-piclim engine core (TPU-native).

Re-designs the stateful single-env ``Tetris.move`` / ``reset`` / ``get_state``
machine (reference: game/tetris.py:140-470) as a fixed-shape, side-effect-free
``step`` on an :class:`EnvState` pytree, built to ``jit`` + ``vmap`` over tens
of thousands of boards in lockstep:

* no data-dependent control flow — every branch of the reference's ``move``
  (top-out, no-clear, clear/win/loss; reference game/tetris.py:354-422) is
  computed unconditionally and selected with ``jnp.where``;
* the variable-row line clear (reference game/tetris.py:396-407) becomes a
  stable argsort-gather — a fixed-shape permutation;
* per-column "first filled row" scans (reference game/tetris.py:427-433) are
  a single vectorized argmax over the board.

Bit-exact semantic parity with the reference ``move`` is enforced by
tests/test_parity.py, including the quirks:

* the current piece is consumed *before* any validity check
  (reference game/tetris.py:356);
* horizontal clamp is ``min(location, 10-width)`` with no lower clamp
  (reference game/tetris.py:364) — we additionally clamp at 0 since a jitted
  engine cannot raise on bad input (negative locations raise IndexError-free
  garbage in the reference; callers never produce them);
* a top-out (``drop < 0``) loses WITHOUT incrementing ``moves_used`` or
  touching the board (reference game/tetris.py:371-374 precede the increment
  at :379);
* only rows spanned by the just-locked piece are scanned for full lines
  (reference game/tetris.py:381-386) — pre-existing full rows from a carved
  initial configuration survive until a piece lands on them;
* win is checked before the move-limit loss on the clearing path, so clearing
  the L-th line on the M-th move wins (reference game/tetris.py:414-421);
* a step on an already-terminal state behaves exactly like the reference's
  unguarded ``move``: status may be overwritten by a new terminal condition,
  otherwise it is retained.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import tables

# Status codes (reference uses None/True/False at game/tetris.py:148-151).
RUNNING = jnp.int8(0)
WIN = jnp.int8(1)
LOSS = jnp.int8(2)

OBS_DIM = 217  # 200 board + 7 cur + 7 nxt + lines-left + moves-left + status
_BIG = jnp.int32(1 << 20)

# Device-constant geometry tables (built once from tetris_piclim_tpu.tables).
_MASKS = jnp.asarray(tables.MASKS)
_WIDTH = jnp.asarray(tables.WIDTH)
_HEIGHT = jnp.asarray(tables.HEIGHT)
_RTOPO = jnp.asarray(tables.RTOPO)
_NROT = jnp.asarray(tables.NROT)

H, W = tables.BOARD_H, tables.BOARD_W


class EnvState(NamedTuple):
    """Per-environment state pytree. All leaves are fixed-shape arrays.

    ``pieces`` has static length ``P >= M+1`` (reference pads its piece list
    to M+1, game/tetris.py:281-284); ``cursor`` replaces the reference's
    ``pieces.pop(0)``. ``lines_goal``/``move_limit`` are *dynamic* per-env
    scalars so one compiled step serves a whole (L, M) curriculum.
    """

    board: jax.Array        # bool[20, 10]
    pieces: jax.Array       # int8[P]
    cursor: jax.Array       # int32
    lines_cleared: jax.Array  # int32
    moves_used: jax.Array     # int32
    lines_goal: jax.Array     # int32 (L)
    move_limit: jax.Array     # int32 (M)
    status: jax.Array         # int8


class StepResult(NamedTuple):
    state: EnvState
    lines_delta: jax.Array  # int32 — lines cleared by this step
    done: jax.Array         # bool — terminal after this step
    won: jax.Array          # bool


def make_state(
    board: jax.Array,
    pieces: jax.Array,
    lines_goal,
    move_limit,
) -> EnvState:
    """Build a fresh EnvState from an initial configuration (board, pieces).

    Inputs are copied (``jnp.array``, not ``asarray``): on the CPU backend
    ``asarray`` can zero-copy-alias a host numpy buffer, and a caller that
    keeps mutating that buffer (e.g. ``env_api.Tetris``'s live board) would
    race JAX's async reads."""
    return EnvState(
        board=jnp.array(board, dtype=bool),
        pieces=jnp.array(pieces, dtype=jnp.int8),
        cursor=jnp.int32(0),
        lines_cleared=jnp.int32(0),
        moves_used=jnp.int32(0),
        lines_goal=jnp.int32(lines_goal),
        move_limit=jnp.int32(move_limit),
        status=RUNNING,
    )


def step(state: EnvState, rotations: jax.Array, location: jax.Array) -> StepResult:
    """One hard-drop move — the fixed-shape analogue of reference
    game/tetris.py:354-433. All inputs may be traced scalars; vmap over a
    leading batch axis for lockstep stepping."""
    piece = state.pieces[state.cursor].astype(jnp.int32)
    r = jnp.mod(rotations.astype(jnp.int32), _NROT[piece])
    mask = _MASKS[piece, r]                      # bool[4,4], top-left anchored
    w = _WIDTH[piece, r]
    h = _HEIGHT[piece, r]

    # Horizontal clamp (reference game/tetris.py:362-364) + lower clamp at 0.
    loc = jnp.clip(location.astype(jnp.int32), 0, W - w)

    # Column topography: first filled row per column, 20 if empty
    # (reference game/tetris.py:427-433, vectorized).
    cols = jnp.clip(loc + jnp.arange(tables.MASK_BOX), 0, W - 1)
    col_cells = state.board[:, cols]             # [20, 4]
    has_fill = jnp.any(col_cells, axis=0)
    first_fill = jnp.argmax(col_cells, axis=0).astype(jnp.int32)
    topo = jnp.where(has_fill, first_fill, H)

    valid_col = jnp.arange(tables.MASK_BOX) < w
    deltas = jnp.where(valid_col, topo - _RTOPO[piece, r], _BIG)
    drop = jnp.min(deltas) - 1                   # reference game/tetris.py:424-425
    topout = drop < 0

    # Lock the piece: board-sized overlay of the 4x4 mask at (drop, loc).
    rows = jnp.arange(H, dtype=jnp.int32)[:, None]
    colsg = jnp.arange(W, dtype=jnp.int32)[None, :]
    rel_r = rows - drop
    rel_c = colsg - loc
    in_box = (
        (rel_r >= 0) & (rel_r < tables.MASK_BOX)
        & (rel_c >= 0) & (rel_c < tables.MASK_BOX)
    )
    overlay = in_box & mask[jnp.clip(rel_r, 0, 3), jnp.clip(rel_c, 0, 3)]
    locked = state.board | overlay

    # Line clear — only rows spanned by the piece (reference game/tetris.py:381-386).
    row_idx = jnp.arange(H, dtype=jnp.int32)
    in_span = (row_idx >= drop) & (row_idx < drop + h)
    cleared_rows = jnp.all(locked, axis=1) & in_span
    k = jnp.sum(cleared_rows).astype(jnp.int32)

    # Stable partition: cleared rows float to the top (in order) and are
    # zeroed; remaining rows keep order — equivalent to the fancy-index +
    # vstack at reference game/tetris.py:396-407, but fixed-shape.
    order = jnp.argsort(jnp.where(cleared_rows, 0, 1), stable=True)
    board_after = locked[order] & (row_idx[:, None] >= k)

    moves_used = state.moves_used + 1
    lines = state.lines_cleared + k

    # Terminal logic, reference ordering (game/tetris.py:371-421):
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

    new_state = EnvState(
        board=jnp.where(topout, state.board, board_after),
        pieces=state.pieces,
        cursor=state.cursor + 1,  # piece consumed even on top-out (tetris.py:356)
        lines_cleared=jnp.where(topout, state.lines_cleared, lines),
        moves_used=jnp.where(topout, state.moves_used, moves_used),
        lines_goal=state.lines_goal,
        move_limit=state.move_limit,
        status=status,
    )
    lines_delta = jnp.where(topout, 0, k)
    done = status != RUNNING
    return StepResult(new_state, lines_delta, done, status == WIN)


def observe(state: EnvState) -> jax.Array:
    """217-dim observation — flattening of the reference ``get_state`` tuple
    (game/tetris.py:435-436): 200 board cells + one-hot current piece +
    one-hot next piece + lines-left + moves-left + status.

    The reference's ``get_state`` IndexErrors when fewer than two pieces
    remain; here the next-piece index is clamped to the last slot (decide-and-
    document per SURVEY.md §7 quirk policy). Status encodes running=0,
    win=+1, loss=-1. This realizes the declared-but-never-written 217-dim
    encoding implied by ``Model(217, 14)`` (reference model/train.py:26).
    """
    p = state.pieces.shape[0]
    cur = state.pieces[jnp.clip(state.cursor, 0, p - 1)].astype(jnp.int32)
    nxt = state.pieces[jnp.clip(state.cursor + 1, 0, p - 1)].astype(jnp.int32)
    status_f = jnp.where(
        state.status == WIN, 1.0, jnp.where(state.status == LOSS, -1.0, 0.0)
    )
    return jnp.concatenate([
        state.board.astype(jnp.float32).reshape(-1),
        jax.nn.one_hot(cur, tables.NUM_PIECES, dtype=jnp.float32),
        jax.nn.one_hot(nxt, tables.NUM_PIECES, dtype=jnp.float32),
        jnp.stack([
            (state.lines_goal - state.lines_cleared).astype(jnp.float32),
            (state.move_limit - state.moves_used).astype(jnp.float32),
            status_f,
        ]),
    ])


# ----------------------------------------------------------------------------
# Batched API: vmapped step + auto-reset against a device-resident config bank.
# ----------------------------------------------------------------------------

step_batch = jax.vmap(step)
observe_batch = jax.vmap(observe)


def reset_from_bank(
    bank_boards: jax.Array,   # bool[B, 20, 10]
    bank_pieces: jax.Array,   # int8[B, P]
    index: jax.Array,         # int32 — which bank entry
    lines_goal,
    move_limit,
) -> EnvState:
    """Draw a fresh start state from a device-resident bank of winnable
    configurations — the TPU-native replacement for the reference's
    multiprocessing warm-reset queue (game/tetris.py:190-214, 445-449)."""
    return make_state(bank_boards[index], bank_pieces[index], lines_goal, move_limit)


def step_autoreset_batch(
    states: EnvState,
    rotations: jax.Array,
    locations: jax.Array,
    bank_boards: jax.Array,
    bank_pieces: jax.Array,
    key: jax.Array,
) -> tuple[EnvState, StepResult]:
    """Batched auto-reset step over N envs sharing one bank. One batched
    randint draws all reset indices — no per-env key splits."""
    n = rotations.shape[0]
    res = step_batch(states, rotations, locations)
    idx = jax.random.randint(key, (n,), 0, bank_boards.shape[0])
    fresh = EnvState(
        board=bank_boards[idx],
        pieces=bank_pieces[idx],
        cursor=jnp.zeros((n,), jnp.int32),
        lines_cleared=jnp.zeros((n,), jnp.int32),
        moves_used=jnp.zeros((n,), jnp.int32),
        lines_goal=states.lines_goal,
        move_limit=states.move_limit,
        status=jnp.zeros((n,), jnp.int8),
    )
    done = res.done
    next_states = jax.tree.map(
        lambda f, s: jnp.where(done.reshape((-1,) + (1,) * (f.ndim - 1)), f, s),
        fresh, res.state,
    )
    return next_states, res


def make_state_batch(boards, pieces, lines_goal, move_limit) -> EnvState:
    """Vectorized make_state over leading batch axis."""
    n = boards.shape[0]
    lg = jnp.broadcast_to(jnp.asarray(lines_goal, jnp.int32), (n,))
    ml = jnp.broadcast_to(jnp.asarray(move_limit, jnp.int32), (n,))
    return jax.vmap(make_state)(boards, pieces, lg, ml)

