"""On-device forward-family generator + vectorized winnability prover.

The reference's forward pipeline (game/tetris_algo_main/: TetrisGameGenerator
``fill_grid`` + ``generate_tetromino_sequence``, then the TetrisSolver greedy
DFS) runs ~20 proven games/s on two host cores — which is why round-1/2
training banks were >90% carve-family while the held-out evaluation bank is
50% forward-family: the forward *distribution* (random low stacks + fresh
7-bag sequences) was underrepresented in training, and the per-family holdout
breakdown showed exactly that gap.

This module is the TPU-native answer: generate thousands of forward-family
candidates per call entirely on device, and PROVE winnability with a
vectorized greedy rollout instead of a backtracking DFS:

* prefill: lockstep random hard drops onto empty packed bitboards until the
  next placement would top the ``initial_height_max`` cap (reference
  TetrisGameGenerator.py:72-85 semantics: colliding pieces are skipped, full
  rows clear, the capping placement is not made);
* sequence: independent on-device 7-bag draws (gen/bag.bag_sequences_device,
  reference TetrisGameGenerator.py:90-106);
* prove: play each candidate with a greedy one-step-lookahead policy — all
  40 (rotation, column) placements are scored in parallel each move
  (win now >> lines cleared >> drop depth, ties to the lowest rotation then
  leftmost column, the reference solver's own preference order,
  TetrisSolver.py:90-117) — a game the policy wins is winnable by
  construction. No backtracking means some solvable games are missed
  (XLA-hostile DFS stays on the host, gen/solver.py); volume makes up the
  yield: one device call proves orders of magnitude more games per second
  than the host pipeline.

Decide-and-document differences from the reference generator (this is a
throughput device like gen/jax_carver.py, not a parity target — seed-exact
parity lives in gen/forward.py + gen/solver.py):

* pieces/rotations/columns are drawn from the JAX PRNG, not Python's seeded
  ``random`` stream;
* the prover is greedy one-step lookahead, not greedy DFS — it proves a
  *subset* of what the DFS proves, which is sound (never emits an unwinnable
  config) but not complete;
* candidates the prover cannot win are simply dropped (the caller oversamples
  and keeps winners).

Every emitted winner's recorded (rotation, location) solution replays to WIN
through the engine — enforced by tests/test_jax_forward.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import tables
from ..engine import RUNNING, WIN
from ..ops.bitboard import (
    _COLMASK10,
    _HEIGHT,
    _NROT,
    _RTOPO10,
    _WIDTH,
    _ctz20,
    PackedState,
    make_state_batch,
    step_batch,
)
from .bag import bag_sequences_device

H, W = tables.BOARD_H, tables.BOARD_W


class ForwardBatch(NamedTuple):
    boards: jax.Array      # uint32[N, 10] — packed prefill boards
    pieces: jax.Array      # int8[N, M+1]  — 7-bag piece sequence
    rotations: jax.Array   # int8[N, M]    — greedy prover's solution
    locations: jax.Array   # int8[N, M]
    n_moves: jax.Array     # int32[N]      — solution length (winners only)
    winnable: jax.Array    # bool[N]       — proven winnable by the prover


# -- prefill -----------------------------------------------------------------

def prefill_boards_device(
    key: jax.Array,
    n: int,
    initial_height_max: int = 4,
    max_iters: int = 96,
) -> jax.Array:
    """uint32[n, 10]: random-stack prefill boards, height <= the cap.

    Vectorized ``fill_grid``: each iteration drops one random
    (piece, rotation, column) on every still-active board; a drop whose top
    lands above the cap stops that board (and is not placed); full rows
    clear. ``max_iters`` only bounds the loop — boards stop themselves.
    """

    def body(_, carry):
        key, cols, stopped = carry
        key, k_p, k_r, k_l = jax.random.split(key, 4)
        piece = jax.random.randint(k_p, (n,), 0, 7)
        r = jnp.mod(jax.random.randint(k_r, (n,), 0, 4), _NROT[piece])
        w = _WIDTH[piece, r]
        u = jax.random.uniform(k_l, (n,))
        loc = (u * (W - w + 1).astype(jnp.float32)).astype(jnp.int32)
        loc = jnp.clip(loc, 0, W - w)

        flat = (piece * 4 + r) * 10 + loc
        mask10 = _COLMASK10[flat]                   # uint32[n, 10]
        rtopo10 = _RTOPO10[flat]

        topo = _ctz20(cols)
        drop = jnp.min(topo - rtopo10, axis=1) - 1  # piece top row index
        collide = drop < 0                          # skip, don't stop
        # placement top height from the bottom; over the cap => stop without
        # placing (reference TetrisGameGenerator.py:82-83 break)
        over_cap = (H - drop) > initial_height_max

        place = ~stopped & ~collide & ~over_cap
        stopped = stopped | (~collide & over_cap)

        locked = cols | (
            mask10 << jnp.maximum(drop, 0).astype(jnp.uint32)[:, None]
        )
        # clear any completed rows (reference fill_grid clears lines too)
        full = locked[:, 0]
        for c in range(1, W):
            full = full & locked[:, c]
        board = locked
        cmw = full
        for _ in range(4):
            active = cmw != 0
            lsb = cmw & (~cmw + jnp.uint32(1))
            low = lsb - jnp.uint32(1)
            keep_hi = ~((lsb << 1) - jnp.uint32(1))
            newb = ((board & low[:, None]) << 1) | (board & keep_hi[:, None])
            board = jnp.where(active[:, None], newb, board)
            cmw = cmw & (cmw - jnp.uint32(1))

        cols = jnp.where(place[:, None], board, cols)
        return key, cols, stopped

    cols = jnp.zeros((n, W), dtype=jnp.uint32)
    stopped = jnp.zeros((n,), dtype=bool)
    _, cols, _ = jax.lax.fori_loop(0, max_iters, body, (key, cols, stopped))
    return cols


# -- greedy one-step-lookahead prover ----------------------------------------

def _greedy_actions(state: PackedState) -> tuple[jax.Array, jax.Array]:
    """Best (rotation, location) per env by scoring all 40 placements.

    Score: win-now >> lines cleared >> drop depth; top-outs are last resort.
    Flattened rotation-major so argmax ties prefer the lowest rotation, then
    the leftmost column (the reference solver's preference order).
    """
    n = state.cols.shape[0]
    piece = jnp.take_along_axis(
        state.pieces, state.cursor[:, None].astype(jnp.int32), axis=1
    )[:, 0].astype(jnp.int32)                               # [n]

    rot_raw = jnp.arange(4, dtype=jnp.int32)                # [4]
    r = jnp.mod(rot_raw[None, :], _NROT[piece][:, None])    # [n, 4]
    pe = piece[:, None]
    w = _WIDTH[pe, r]                                       # [n, 4]
    h = _HEIGHT[pe, r]
    loc_raw = jnp.arange(10, dtype=jnp.int32)               # [10]
    loc = jnp.clip(loc_raw[None, None, :], 0, (W - w)[:, :, None])  # [n,4,10]

    flat = (pe[:, :, None] * 4 + r[:, :, None]) * 10 + loc  # [n, 4, 10]
    mask = _COLMASK10[flat]                                 # uint32[n,4,10,10]
    rtopo = _RTOPO10[flat]                                  # int32[n,4,10,10]

    topo = _ctz20(state.cols)                               # [n, 10]
    deltas = topo[:, None, None, :] - rtopo
    drop = jnp.min(deltas, axis=3) - 1                      # [n, 4, 10]
    topout = drop < 0
    dropc = jnp.maximum(drop, 0).astype(jnp.uint32)

    locked = state.cols[:, None, None, :] | (mask << dropc[:, :, :, None])
    full = locked[:, :, :, 0]
    for c in range(1, W):
        full = full & locked[:, :, :, c]
    span = ((jnp.uint32(1) << h.astype(jnp.uint32)) - 1)[:, :, None] << dropc
    k = jax.lax.population_count(full & span).astype(jnp.int32)  # [n, 4, 10]

    win_now = (state.lines_cleared[:, None, None] + k) >= (
        state.lines_goal[:, None, None]
    )
    # holes buried under the post-placement surface (cells that can only be
    # reached by clearing above them): per column, zero bits below the top
    # filled bit = (H - ctz) - popcount. The classic stacking heuristic —
    # without it the depth-greedy buries cells and the long-horizon (L=10)
    # yield collapses to ~2%.
    after = locked
    cleared = after
    cmw2 = full & span
    for _ in range(4):
        active = cmw2 != 0
        lsb = cmw2 & (~cmw2 + jnp.uint32(1))
        low = lsb - jnp.uint32(1)
        keep_hi = ~((lsb << 1) - jnp.uint32(1))
        newb = ((cleared & low[..., None]) << 1) | (cleared & keep_hi[..., None])
        cleared = jnp.where(active[..., None], newb, cleared)
        cmw2 = cmw2 & (cmw2 - jnp.uint32(1))
    col_fill = jax.lax.population_count(cleared).astype(jnp.int32)
    col_height = H - _ctz20(cleared)
    holes = jnp.sum(col_height - col_fill, axis=3)          # [n, 4, 10]
    score = (
        jnp.where(win_now, 10_000_000, 0)
        + k * 100_000
        - holes * 2_000
        + drop
        - jnp.where(topout, 100_000_000, 0)
    )                                                       # int32[n, 4, 10]
    a = jnp.argmax(score.reshape(n, 40), axis=1).astype(jnp.int32)
    return a // 10, a % 10


def prove_batch_device(
    boards: jax.Array,
    pieces: jax.Array,
    L: int,
    M: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Play each (board, sequence) with the greedy policy for up to M moves.

    Returns ``(winnable bool[N], rotations int8[N, M], locations int8[N, M],
    n_moves int32[N])`` — winners' recorded actions replay to WIN.
    ``boards`` may be packed uint32[N, 10] or bool[N, 20, 10].
    """
    state = make_state_batch(boards, pieces, L, M)

    def body(st, i):
        rot, loc = _greedy_actions(st)
        res = step_batch(st, rot, loc)
        frozen = st.status != RUNNING
        nxt = jax.tree.map(
            lambda a, b: jnp.where(
                frozen.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
            ),
            st, res.state,
        )
        return nxt, (rot.astype(jnp.int8), loc.astype(jnp.int8))

    final, (rots, locs) = jax.lax.scan(
        body, state, jnp.arange(M), length=M
    )
    winnable = final.status == WIN
    return (
        winnable,
        jnp.transpose(rots),           # [N, M], played order
        jnp.transpose(locs),
        jnp.where(winnable, final.moves_used, 0),
    )


# -- end-to-end --------------------------------------------------------------

def generate_batch_device(
    key: jax.Array,
    n: int,
    L: int,
    M: int,
    initial_height_max: int = 4,
) -> ForwardBatch:
    """Generate ``n`` forward-family candidates and prove them in lockstep.

    Winners (``.winnable``) are guaranteed winnable; callers oversample and
    keep winners. Sequences have length M+1 (the env's next-piece slot,
    reference game/tetris.py:281-284 padding convention).
    """
    k_pre, k_seq = jax.random.split(key)
    cols = prefill_boards_device(
        k_pre, n, initial_height_max=initial_height_max
    )
    pieces = bag_sequences_device(k_seq, n, M + 1)
    winnable, rots, locs, n_moves = prove_batch_device(cols, pieces, L, M)
    return ForwardBatch(
        boards=cols,
        pieces=pieces,
        rotations=rots,
        locations=locs,
        n_moves=n_moves,
        winnable=winnable,
    )


generate_batch_device_jit = jax.jit(
    generate_batch_device, static_argnames=("n", "L", "M", "initial_height_max")
)
