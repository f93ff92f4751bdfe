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
* prove: vectorized BEAM SEARCH (default width 8) — every move expands all
  live search states x 40 (rotation, column) placements in parallel, scores
  them (win now >> total lines cleared >> fewer buried holes >> drop depth,
  ties to the lowest rotation then leftmost column, the reference solver's
  own preference order, TetrisSolver.py:90-117), drops duplicate successors,
  and keeps the best K. A game is flagged winnable only when a concrete
  recorded action sequence wins — winnable-by-construction. The beam is the
  fixed-shape, XLA-friendly re-design of the reference's backtracking DFS
  (TetrisSolver.py:112-163, which is host-hostile to vectorize); at width 8
  it proves ~97% of L=10/M=30 candidates vs ~35% for the width-1 greedy
  rollout that round 2 shipped (whose greedy-winnable-subset training rows
  caused the 57% forward-family holdout gap). ``beam_width=1`` keeps the
  cheap greedy path.

Decide-and-document differences from the reference generator (this is a
throughput device like gen/jax_carver.py, not a parity target — seed-exact
parity lives in gen/forward.py + gen/solver.py):

* pieces/rotations/columns are drawn from the JAX PRNG, not Python's seeded
  ``random`` stream;
* the prover is a beam search, not greedy DFS — sound (never emits an
  unwinnable config) but not complete, and NOT a subset of the DFS-winnable
  set either: the beam considers all 40 placements per move where the
  reference DFS tries only the single deepest column per rotation
  (TetrisSolver.py:117), so each proves games the other misses;
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


# -- placement scoring (shared by the greedy and beam provers) ---------------

def _score_placements(
    state: PackedState,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Score all 40 (rotation, column) placements of every env's next piece.

    Returns ``(score, win_now, topout, succ_hash)``, each ``[n, 4, 10]``:

    * ``score`` int32 — win-now >> TOTAL lines cleared >> fewer buried holes
      >> deeper drop. Rotation-major flattening means argmax/top_k ties
      prefer the lowest rotation, then the leftmost column (the reference
      solver's preference order, TetrisSolver.py:90-117). The cumulative
      lines term makes scores comparable ACROSS beam states, not just across
      one state's placements.
    * ``win_now`` — the placement clears enough lines to win immediately.
    * ``topout`` — the placement does not fit (drop < 0): a loss.
    * ``succ_hash`` uint32 — hash of (post-clear board, total lines), used by
      the beam prover to drop duplicate successors reached via different
      move orders.
    """
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

    total = state.lines_cleared[:, None, None] + k          # [n, 4, 10]
    win_now = total >= state.lines_goal[:, None, None]
    # holes buried under the post-placement surface (cells that can only be
    # reached by clearing above them): per column, zero bits below the top
    # filled bit = (H - ctz) - popcount. The classic stacking heuristic —
    # without it the depth-greedy buries cells and the long-horizon (L=10)
    # yield collapses to ~2%.
    cleared = locked
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
        + total * 100_000
        - holes * 2_000
        + drop
    )                                                       # int32[n, 4, 10]
    # successor identity: fold the post-clear columns, mix in total lines
    # (same board at different line counts is a different search state)
    succ_hash = jnp.zeros(cleared.shape[:3], dtype=jnp.uint32)
    for c in range(W):
        succ_hash = succ_hash * jnp.uint32(1_000_003) ^ cleared[:, :, :, c]
    succ_hash = succ_hash * jnp.uint32(1_000_003) ^ total.astype(jnp.uint32)
    return score, win_now, topout, succ_hash


def _greedy_actions(state: PackedState) -> tuple[jax.Array, jax.Array]:
    """Best (rotation, location) per env by scoring all 40 placements.

    Top-outs are last resort (not excluded — the env contract needs SOME
    action each move); ties prefer the lowest rotation then leftmost column.
    """
    n = state.cols.shape[0]
    score, _, topout, _ = _score_placements(state)
    score = score - jnp.where(topout, 100_000_000, 0)
    a = jnp.argmax(score.reshape(n, 40), axis=1).astype(jnp.int32)
    return a // 10, a % 10


def prove_batch_device(
    boards: jax.Array,
    pieces: jax.Array,
    L: int,
    M: int,
    beam_width: int = 1,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Prove winnability of each (board, sequence) within M moves.

    ``beam_width=1``: greedy one-step-lookahead rollout (cheapest, proves a
    subset of DFS-winnable games). ``beam_width=K>1``: vectorized beam search
    — every move expands all K live search states x 40 placements, drops
    duplicate successors, and keeps the K best by the shared placement score.
    The beam closes most of the greedy-vs-DFS coverage gap (the reference
    DFS backtracks, TetrisSolver.py:112-163; a beam is the fixed-shape
    re-design of that search) at ~K x the prove cost.

    Returns ``(winnable bool[N], rotations int8[N, M], locations int8[N, M],
    n_moves int32[N])`` — winners' recorded actions replay to WIN.
    ``boards`` may be packed uint32[N, 10] or bool[N, 20, 10].
    """
    if beam_width > 1:
        return _beam_prove(boards, pieces, L, M, beam_width)
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


_NEG = jnp.int32(-(2**30))


def _beam_prove(
    boards: jax.Array,
    pieces: jax.Array,
    L: int,
    M: int,
    K: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Beam-search winnability prover (see prove_batch_device).

    Search state is [N, K] env states flattened to [N*K] (env-major) so
    step_batch and the scorer run unchanged. Each move:

    1. score all K*40 successors of every game (shared scorer);
    2. record the first winning successor of any not-yet-won game — its
       beam's action history plus the winning action IS the solution, so won
       states never occupy beam slots;
    3. mask dead successors (top-outs, dead beams) and duplicate successors
       (same (post-clear board, lines) hash — Tetris reaches the same state
       via many move orders, and without dedup the beam fills with copies);
    4. lax.top_k keeps the K best; gather their parent states and step them.

    Soundness is inherited from the replay contract: a game is only flagged
    winnable when a concrete recorded action sequence wins.
    """
    state0 = make_state_batch(boards, pieces, L, M)
    N = state0.cols.shape[0]
    # env-major replication: beams of game g live at rows [g*K, (g+1)*K)
    state = jax.tree.map(lambda a: jnp.repeat(a, K, axis=0), state0)
    alive = (jnp.arange(N * K, dtype=jnp.int32) % K) == 0   # beam 0 only
    hist_rot = jnp.zeros((N, K, M), jnp.int8)
    hist_loc = jnp.zeros((N, K, M), jnp.int8)
    done = jnp.zeros((N,), bool)
    sol_rot = jnp.zeros((N, M), jnp.int8)
    sol_loc = jnp.zeros((N, M), jnp.int8)
    sol_len = jnp.zeros((N,), jnp.int32)

    def body(carry, i):
        state, alive, hist_rot, hist_loc, done, sol_rot, sol_loc, sol_len = carry
        score, win_now, topout, succ_hash = _score_placements(state)
        score = score.reshape(N, K, 40)
        win_now = win_now.reshape(N, K, 40)
        topout = topout.reshape(N, K, 40)
        valid = alive.reshape(N, K)[:, :, None] & ~topout
        score = jnp.where(valid, score, _NEG)

        # -- record the first winning successor per not-yet-won game
        flat_win = (win_now & valid).reshape(N, K * 40)
        any_win = flat_win.any(axis=1)
        wi = jnp.argmax(flat_win, axis=1)                   # [N]
        wb, wa = wi // 40, wi % 40
        win_hist_rot = jnp.take_along_axis(
            hist_rot, wb[:, None, None], axis=1
        )[:, 0]                                             # [N, M]
        win_hist_loc = jnp.take_along_axis(
            hist_loc, wb[:, None, None], axis=1
        )[:, 0]
        win_hist_rot = win_hist_rot.at[:, i].set((wa // 10).astype(jnp.int8))
        win_hist_loc = win_hist_loc.at[:, i].set((wa % 10).astype(jnp.int8))
        newly = any_win & ~done
        sol_rot = jnp.where(newly[:, None], win_hist_rot, sol_rot)
        sol_loc = jnp.where(newly[:, None], win_hist_loc, sol_loc)
        sol_len = jnp.where(newly, i + 1, sol_len)
        done = done | any_win

        # wins are recorded, not expanded; duplicates keep one copy.
        # Dedup runs over VALID, non-winning slots only: an invalid slot
        # (dead beam, top-out garbage) or a recorded win that happened to
        # share a hash and sort earlier would otherwise suppress the only
        # valid copy of a state. Invalid slots get slot-unique sentinel
        # hashes (0..K*40-1), and a slot is a duplicate only when the
        # PRECEDING equal-hash slot is itself valid — so a real hash that
        # happens to land in the sentinel range can never be suppressed by
        # the sentinel it collides with (advisor r4: the previous version
        # accepted that ~1e-7 false kill; this closes it — the residual
        # failure mode is a harmless false KEEP of one duplicate).
        score = jnp.where(win_now, _NEG, score).reshape(N, K * 40)
        flat_ok = (valid & ~win_now).reshape(N, K * 40)
        h = succ_hash.reshape(N, K * 40)
        slot = jnp.arange(K * 40, dtype=jnp.uint32)[None, :]
        h = jnp.where(flat_ok, h, slot)
        order = jnp.argsort(h, axis=1)
        hs = jnp.take_along_axis(h, order, axis=1)
        ok_sorted = jnp.take_along_axis(flat_ok, order, axis=1)
        dup_sorted = jnp.concatenate(
            [
                jnp.zeros((N, 1), bool),
                (hs[:, 1:] == hs[:, :-1]) & ok_sorted[:, :-1],
            ],
            axis=1,
        )
        inv = jnp.argsort(order, axis=1)
        dup = jnp.take_along_axis(dup_sorted, inv, axis=1)
        score = jnp.where(dup, _NEG, score)

        # -- select K best successors and step their parents
        top_scores, top_idx = jax.lax.top_k(score, K)       # [N, K]
        tb, ta = top_idx // 40, top_idx % 40
        gidx = (jnp.arange(N, dtype=jnp.int32)[:, None] * K + tb).reshape(-1)
        parent = jax.tree.map(lambda a: a[gidx], state)
        rot = (ta // 10).astype(jnp.int32).reshape(-1)
        loc = (ta % 10).astype(jnp.int32).reshape(-1)
        res = step_batch(parent, rot, loc)
        new_alive = (top_scores > _NEG // 2).reshape(-1)
        new_hist_rot = jnp.take_along_axis(
            hist_rot, tb[:, :, None], axis=1
        ).at[:, :, i].set((ta // 10).astype(jnp.int8))
        new_hist_loc = jnp.take_along_axis(
            hist_loc, tb[:, :, None], axis=1
        ).at[:, :, i].set((ta % 10).astype(jnp.int8))
        return (
            res.state, new_alive, new_hist_rot, new_hist_loc,
            done, sol_rot, sol_loc, sol_len,
        ), None

    carry = (state, alive, hist_rot, hist_loc, done, sol_rot, sol_loc, sol_len)
    carry, _ = jax.lax.scan(body, carry, jnp.arange(M), length=M)
    _, _, _, _, done, sol_rot, sol_loc, sol_len = carry
    return done, sol_rot, sol_loc, jnp.where(done, sol_len, 0)


# -- end-to-end --------------------------------------------------------------

def generate_batch_device(
    key: jax.Array,
    n: int,
    L: int,
    M: int,
    initial_height_max: int = 4,
    beam_width: int = 8,
) -> ForwardBatch:
    """Generate ``n`` forward-family candidates and prove them in lockstep.

    Winners (``.winnable``) are guaranteed winnable; callers oversample and
    keep winners. Sequences have length M+1 (the env's next-piece slot,
    reference game/tetris.py:281-284 padding convention). ``beam_width``
    trades prove cost for coverage of the DFS-winnable set (the round-2
    greedy prover trained on a greedy-winnable SUBSET, which showed up as a
    57% forward-family holdout win rate vs 98% carve-family).
    """
    k_pre, k_seq = jax.random.split(key)
    cols = prefill_boards_device(
        k_pre, n, initial_height_max=initial_height_max
    )
    pieces = bag_sequences_device(k_seq, n, M + 1)
    winnable, rots, locs, n_moves = prove_batch_device(
        cols, pieces, L, M, beam_width=beam_width
    )
    return ForwardBatch(
        boards=cols,
        pieces=pieces,
        rotations=rots,
        locations=locs,
        n_moves=n_moves,
        winnable=winnable,
    )


# ``initial_height_max`` is deliberately TRACED (not static): it feeds one
# arithmetic comparison in the prefill, so an annealed height curriculum
# (cli --device-height H0:H1) reuses a single compiled program instead of
# recompiling the expensive beam-prove pipeline per distinct height.
generate_batch_device_jit = jax.jit(
    generate_batch_device,
    static_argnames=("n", "L", "M", "beam_width"),
)
