"""Pallas TPU kernel: K fused env steps with VMEM-resident state.

The jitted bitboard scan (ops/bitboard.py) round-trips the env state through
HBM every step. This kernel keeps a tile of envs resident in VMEM for K
consecutive random-policy steps — the memory traffic drops from
K x (state in + state out) to one load + one store per tile, and the
per-step table/bank lookups become one-hot matmuls on the MXU (Mosaic has no
general vector gather; one-hot contraction is the TPU idiom for tiny-table
lookups).

Semantics per step are bitboard.step + bank auto-reset. Actions come either
from a scripted stream (``actions=`` — the verification path) or from the
in-kernel PRNG (pltpu.prng_random_bits — the bench.py random-policy
workload). PRNG uniform ints use multiply-shift range reduction, which has
O(2^-16) modulo bias — irrelevant for a throughput benchmark.

Step-equivalence against bitboard.step is asserted bit-exactly by
tests/test_pallas_rollout.py at full fuzz depth: scripted streams of varied
rotations/locations/bank-resets over adversarial boards (multi-line clears,
top-outs, win-on-last-move) must reproduce the scan engine's state
word-for-word, plus the degenerate zero-policy case (interpret-mode PRNG
yields all-zero bits). The live RNG path is validated on hardware by
benchmarks/bench_pallas.py (dispersion check).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from . import bitboard as bb

H, W = tables.BOARD_H, tables.BOARD_W
P28 = 28  # piece*4 + rot


def _build_small_tables():
    """[28, 4] column masks / rtopo (sentinel -BIG outside piece width) and
    [28] width/height/nrot-wrapped helpers, as float32 for MXU contraction
    (all values < 2^24 -> exact in f32)."""
    colmask = np.zeros((P28, 4), np.float32)
    rtopo = np.full((P28, 4), -float(1 << 20), np.float32)
    width = np.zeros((P28,), np.float32)
    height = np.zeros((P28,), np.float32)
    for p in range(7):
        for r in range(4):
            i = p * 4 + r
            mask = tables.MASKS[p, r]
            w = int(tables.WIDTH[p, r])
            h = int(tables.HEIGHT[p, r])
            width[i] = w
            height[i] = h
            for c in range(w):
                bits = 0
                for row in range(4):
                    if mask[row, c]:
                        bits |= 1 << row
                colmask[i, c] = bits
                rtopo[i, c] = int(tables.RTOPO[p, r, c])
    nrot = tables.NROT.astype(np.float32)
    return colmask, rtopo, width, height, nrot


_COLMASK4, _RTOPO4, _WIDTH28, _HEIGHT28, _NROT7 = _build_small_tables()


def env_step_once(
    cols, pieces_f, cursor, lines, moves, status, lg, ml,
    rot_raw, loc_raw, reset_idx,
    colmask, rtopo, width, height, nrot,
    bank_cols_f, bank_pieces_f,
    *, tile: int, bank: int, pieces_len: int,
):
    """One fused env step on VMEM-resident values — bitboard.step + bank
    auto-reset semantics, shared by the random-policy rollout kernel and the
    fused actor kernel (tests/test_pallas_rollout.py proves it bit-exact
    against bitboard.step on varied action streams).

    Returns ``(carry, info)``: ``carry`` is the post-auto-reset state tuple
    ``(cols, pieces_f, cursor, lines, moves, status)``; ``info`` holds the
    pre-reset after-state and step outcome needed for replay transitions.
    """
    f32 = jnp.float32
    onehot_cols = jax.lax.broadcasted_iota(jnp.int32, (tile, P28), 1)
    onehot_bank_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, bank), 1)
    onehot_piece_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, pieces_len), 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, W), 1)

    # --- current piece: one-hot over the sequence ---
    cur_onehot = (onehot_piece_iota == cursor[:, None]).astype(f32)
    piece = jnp.sum(cur_onehot * pieces_f, axis=1).astype(jnp.int32)

    # nrot lookup via 7-wide one-hot
    p_onehot7 = (
        jax.lax.broadcasted_iota(jnp.int32, (tile, 7), 1) == piece[:, None]
    ).astype(f32)
    nrot_p = jnp.sum(p_onehot7 * nrot[None, :], axis=1).astype(jnp.int32)
    r = jnp.mod(rot_raw, nrot_p)
    flat = piece * 4 + r
    oh28 = (onehot_cols == flat[:, None]).astype(f32)     # [tile, 28]
    w = jnp.dot(oh28, width[:, None],
                preferred_element_type=f32)[:, 0].astype(jnp.int32)
    h = jnp.dot(oh28, height[:, None],
                preferred_element_type=f32)[:, 0].astype(jnp.int32)
    cm4 = jnp.dot(oh28, colmask, preferred_element_type=f32)   # [tile, 4]
    rt4 = jnp.dot(oh28, rtopo, preferred_element_type=f32)     # [tile, 4]

    loc = jnp.minimum(loc_raw, W - w)

    # --- align 4-wide piece columns onto the 10 board columns ---
    # (four 2D select-accumulate terms: a [tile, 10, 4] one-hot would
    # pad its last dim to 128 lanes and blow VMEM)
    rel = col_iota - loc[:, None]                         # [tile, 10]
    in_piece = (rel >= 0) & (rel < 4)
    mask10f = jnp.zeros((tile, W), f32)
    rtopo10f = jnp.zeros((tile, W), f32)
    for c in range(4):
        sel = (rel == c).astype(f32)
        mask10f = mask10f + sel * cm4[:, c][:, None]
        rtopo10f = rtopo10f + sel * rt4[:, c][:, None]
    mask10 = jnp.where(in_piece, mask10f, 0.0).astype(jnp.int32).astype(jnp.uint32)
    rtopo10 = jnp.where(in_piece, rtopo10f, -f32(1 << 20)).astype(jnp.int32)

    # --- drop ---
    t = jax.lax.population_count((~cols) & (cols - jnp.uint32(1)))
    topo = jnp.where(cols == 0, jnp.int32(H), t.astype(jnp.int32))
    deltas = topo - rtopo10
    drop = jnp.min(deltas, axis=1) - 1
    topout = drop < 0
    drop_c = jnp.maximum(drop, 0).astype(jnp.uint32)
    locked = cols | (mask10 << drop_c[:, None])

    # --- line clear ---
    full = locked[:, 0]
    for c in range(1, W):
        full = full & locked[:, c]
    span = (
        ((jnp.uint32(1) << h.astype(jnp.uint32)) - 1) << drop_c
    )
    cm = full & span
    k = jax.lax.population_count(cm).astype(jnp.int32)
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

    moves_n = moves + 1
    lines_n = lines + k
    RUN, WINS, LOSSS = jnp.int32(0), jnp.int32(1), jnp.int32(2)
    st_nc = jnp.where(moves_n >= ml, LOSSS, status)
    st_c = jnp.where(lines_n >= lg, WINS,
                     jnp.where(moves_n >= ml, LOSSS, status))
    status_n = jnp.where(topout, LOSSS, jnp.where(k > 0, st_c, st_nc))

    new_cols = jnp.where(topout[:, None], cols, board)
    new_lines = jnp.where(topout, lines, lines_n)
    new_moves = jnp.where(topout, moves, moves_n)
    cursor_n = cursor + 1
    done = status_n != RUN
    won = status_n == WINS
    lines_delta = jnp.where(topout, 0, k)

    # --- auto-reset from the bank (one-hot contraction) ---
    b_onehot = (onehot_bank_iota == reset_idx[:, None]).astype(f32)
    fresh_cols = jnp.dot(
        b_onehot, bank_cols_f, preferred_element_type=f32
    ).astype(jnp.int32).astype(jnp.uint32)
    fresh_pieces = jnp.dot(
        b_onehot, bank_pieces_f, preferred_element_type=f32
    )

    out_cols = jnp.where(done[:, None], fresh_cols, new_cols)
    out_pieces = jnp.where(done[:, None], fresh_pieces, pieces_f)
    out_cursor = jnp.where(done, 0, cursor_n)
    out_lines = jnp.where(done, 0, new_lines)
    out_moves = jnp.where(done, 0, new_moves)
    out_status = jnp.where(done, RUN, status_n)

    carry = (out_cols, out_pieces, out_cursor, out_lines, out_moves, out_status)
    info = {
        "piece": piece,
        "done": done,
        "won": won,
        "lines_delta": lines_delta,
        "pre_cols": new_cols,       # after-state, PRE-reset (replay s')
        "pre_cursor": cursor_n,
        "pre_lines": new_lines,
        "pre_moves": new_moves,
        "pre_status": status_n,
    }
    return carry, info


def _kernel(
    *refs,
    n_steps: int, tile: int, bank: int, pieces_len: int,
    with_actions: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (seed_ref, cols_ref, pieces_ref, cursor_ref, lines_ref, moves_ref,
     status_ref, lg_ref, ml_ref, bank_cols_ref, bank_pieces_ref,
     colmask_ref, rtopo_ref, width_ref, height_ref, nrot_ref) = refs[:16]
    if with_actions:
        # scripted action/reset streams, [n_steps, tile] rows per block —
        # the verification path (tests drive varied rotations/locations/
        # resets and demand bit-equality vs bitboard.step)
        rots_in_ref, locs_in_ref, idx_in_ref = refs[16:19]
        outs = refs[19:]
    else:
        outs = refs[16:]
    (out_cols_ref, out_pieces_ref, out_cursor_ref, out_lines_ref,
     out_moves_ref, out_status_ref, out_stats_ref) = outs

    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + pid)

    f32 = jnp.float32

    def rand_uniform_int(maxval_f):
        """[tile] uniform ints in [0, maxval) via multiply-shift.

        Bits are drawn as (1, tile): a (tile, 1) draw puts one useful lane
        in each 8x128 vreg (tile/8 vregs per call), while (1, tile) packs
        the same tile words into tile/128 vregs — 16x less PRNG work."""
        bits = pltpu.prng_random_bits((1, tile))[0, :]
        # prng_random_bits yields int32: '>> 16' alone would be an
        # ARITHMETIC shift (negative for half of all draws -> negative
        # locations / bank indices); mask to the unsigned hi16 field.
        hi16 = ((bits >> 16) & 0xFFFF).astype(f32)
        return (hi16 * maxval_f / 65536.0).astype(jnp.int32)

    def body(step, carry):
        cols, pieces_f, cursor, lines, moves, status, lg, ml, episodes, wins = carry

        # --- action + reset index: scripted streams or in-kernel PRNG ---
        if with_actions:
            rot_raw = rots_in_ref[pl.ds(step, 1), :][0, :]
            loc_raw = locs_in_ref[pl.ds(step, 1), :][0, :]
            idx = idx_in_ref[pl.ds(step, 1), :][0, :]
        else:
            rot_raw = rand_uniform_int(jnp.full((), 4.0, f32))
            loc_raw = rand_uniform_int(jnp.full((), 10.0, f32))
            idx = rand_uniform_int(jnp.full((), float(bank), f32))

        (cols, pieces_f, cursor, lines, moves, status), info = env_step_once(
            cols, pieces_f, cursor, lines, moves, status, lg, ml,
            rot_raw, loc_raw, idx,
            colmask_ref[:], rtopo_ref[:], width_ref[:], height_ref[:],
            nrot_ref[:], bank_cols_ref[:], bank_pieces_ref[:],
            tile=tile, bank=bank, pieces_len=pieces_len,
        )
        episodes = episodes + jnp.sum(info["done"].astype(jnp.int32))
        wins = wins + jnp.sum(info["won"].astype(jnp.int32))
        return (cols, pieces_f, cursor, lines, moves, status, lg, ml,
                episodes, wins)

    init = (
        cols_ref[:],
        pieces_ref[:].astype(f32),
        cursor_ref[:, 0],
        lines_ref[:, 0],
        moves_ref[:, 0],
        status_ref[:, 0],
        lg_ref[:, 0],
        ml_ref[:, 0],
        jnp.int32(0),
        jnp.int32(0),
    )
    (cols, pieces_f, cursor, lines, moves, status, lg, ml, episodes, wins) = (
        jax.lax.fori_loop(0, n_steps, body, init)
    )
    out_cols_ref[:] = cols
    out_pieces_ref[:] = pieces_f.astype(jnp.int32)
    out_cursor_ref[:, 0] = cursor
    out_lines_ref[:, 0] = lines
    out_moves_ref[:, 0] = moves
    out_status_ref[:, 0] = status
    # per-tile aggregates in a [tile, 1] VMEM column: row 0 = episodes,
    # row 1 = wins (SMEM per-program scalars aren't lowerable)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    out_stats_ref[:] = jnp.where(
        row == 0, episodes, jnp.where(row == 1, wins, 0)
    )


def rollout_fused(
    state: bb.PackedState,
    bank_cols: jax.Array,     # uint32[B, 10]
    bank_pieces: jax.Array,   # int8[B, P]
    seed: jax.Array,          # int32 scalar
    n_steps: int,
    tile: int = 1024,
    interpret: bool = False,
    actions=None,             # optional (rots, locs, reset_idx), each [n_steps, N]
):
    """Run ``n_steps`` fused env steps inside a Pallas kernel.

    ``actions=None`` (the bench path) draws random actions from the
    in-kernel TPU PRNG. ``actions=(rots, locs, reset_idx)`` replays scripted
    int32 streams of shape [n_steps, N] — the verification path used by
    tests/test_pallas_rollout.py to fuzz the board math (varied rotations,
    locations, multi-line clears, bank resets) bit-exactly against
    bitboard.step. Returns (final PackedState, episodes, wins)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = state.cols.shape[0]
    assert n % tile == 0, (n, tile)
    grid = (n // tile,)
    bank = bank_cols.shape[0]
    # rand_uniform_int draws 16 bits -> bank indices have 2^16 granularity;
    # a larger bank would leave rows unreachable (and bank values must stay
    # exact in f32 for the one-hot contraction)
    assert bank <= 65536, f"bank capacity {bank} exceeds 16-bit index range"
    pieces_len = state.pieces.shape[1]

    def col2(x):
        return x.reshape(n, 1).astype(jnp.int32)

    kernel = functools.partial(
        _kernel, n_steps=n_steps, tile=tile, bank=bank, pieces_len=pieces_len,
        with_actions=actions is not None,
    )
    row_spec = lambda width, dtype=None: pl.BlockSpec(
        (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    rep_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
        row_spec(10),                            # cols
        row_spec(pieces_len),                    # pieces
        row_spec(1), row_spec(1), row_spec(1),   # cursor, lines, moves
        row_spec(1), row_spec(1), row_spec(1),   # status, lg, ml
        rep_spec((bank, 10)),                    # bank cols (f32)
        rep_spec((bank, pieces_len)),            # bank pieces (f32)
        rep_spec((P28, 4)), rep_spec((P28, 4)),  # colmask, rtopo
        rep_spec((P28,)), rep_spec((P28,)),      # width, height
        rep_spec((7,)),                          # nrot
    ]
    operands = [
        jnp.asarray([seed], jnp.int32),
        state.cols,
        state.pieces.astype(jnp.int32),
        col2(state.cursor), col2(state.lines_cleared), col2(state.moves_used),
        col2(state.status), col2(state.lines_goal), col2(state.move_limit),
        bank_cols.astype(jnp.float32),
        bank_pieces.astype(jnp.float32),
        jnp.asarray(_COLMASK4), jnp.asarray(_RTOPO4),
        jnp.asarray(_WIDTH28), jnp.asarray(_HEIGHT28), jnp.asarray(_NROT7),
    ]
    if actions is not None:
        rots_a, locs_a, idx_a = actions
        assert rots_a.shape == (n_steps, n), (rots_a.shape, (n_steps, n))
        # [n_steps, tile] per block: whole step axis, env-tiled lane axis
        act_spec = pl.BlockSpec(
            (n_steps, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        in_specs += [act_spec, act_spec, act_spec]
        operands += [
            jnp.asarray(rots_a, jnp.int32),
            jnp.asarray(locs_a, jnp.int32),
            jnp.asarray(idx_a, jnp.int32),
        ]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            row_spec(10),
            row_spec(pieces_len),
            row_spec(1), row_spec(1), row_spec(1), row_spec(1),
            row_spec(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 10), jnp.uint32),
            jax.ShapeDtypeStruct((n, pieces_len), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(*operands)
    cols, pieces_out, cursor, lines, moves, status, stats = out
    stats_t = stats.reshape(grid[0], tile)
    episodes = stats_t[:, 0]
    wins = stats_t[:, 1]
    new_state = bb.PackedState(
        cols=cols,
        pieces=pieces_out.astype(jnp.int8),
        cursor=cursor[:, 0],
        lines_cleared=lines[:, 0],
        moves_used=moves[:, 0],
        lines_goal=state.lines_goal,
        move_limit=state.move_limit,
        status=status[:, 0].astype(jnp.int8),
    )
    return new_state, episodes.sum(), wins.sum()
