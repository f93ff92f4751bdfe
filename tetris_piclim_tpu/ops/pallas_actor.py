"""Pallas TPU kernel: fused DQN ACTOR — Q-network forward + epsilon-greedy +
env step + bank auto-reset, K steps with everything VMEM-resident.

The XLA training chunk spends over half its time in the actor phase: each
step materializes a [N, 217] float observation in HBM, runs four small
matmuls, argmaxes, then re-reads the packed env state (measured by
benchmarks/bench_actor_decomp.py). This kernel keeps the env state, the MLP
weights (~310 KB f32), and all activations in VMEM for K consecutive steps —
one state load + one store per tile per K steps, matmuls on the MXU, and the
transitions stream out as compact packed fields for the replay ring.

Scope: the reference-declared MLP (model/model.py:9-13, 217 -> 4x128 ->
head) with either the factored 14-way or joint 40-way head, non-dueling.
The policy is frozen for the K steps of one kernel call; the trainer then
writes the K transition blocks into the replay ring and runs K learner
updates (``TrainConfig.actor_fusion``) — at K=8-16 the added policy lag is
a fraction of the replay buffer's own staleness.

Semantics per step are exactly ``agent.select_actions`` (greedy per-branch /
joint argmax with first-occurrence tie-break, epsilon exploration from the
reference schedule eps_end + (eps_start-eps_end)*exp(-gs/decay),
model/train.py:10-19) followed by ``bitboard.step`` + bank auto-reset — the
env math is the SAME ``env_step_once`` the fuzz-verified rollout kernel uses.
Equivalence at eps=0 (deterministic greedy) is asserted bit-exactly against
the XLA actor in tests/test_pallas_actor.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from . import bitboard as bb
from .pallas_rollout import (
    P28, _COLMASK4, _HEIGHT28, _NROT7, _RTOPO4, _WIDTH28, env_step_once,
)

H, W = tables.BOARD_H, tables.BOARD_W
OBS_PAD = 256     # 217-float observation padded to one lane tile
HID = 128
HEAD_PAD = 128    # head lanes padded; pad biases at -1e9 so argmax ignores
NEG_BIG = -1e9
N_LAYERS = 5      # 217 -> 128 x4 -> head (reference model/model.py:9-13)
T_INT_W = 16      # packed int transition lanes (14 used)


class PackedMLP(NamedTuple):
    """Padded weight/bias stack for the in-kernel forward."""
    w1: jax.Array   # f32[OBS_PAD, HID]
    b1: jax.Array   # f32[1, HID]
    w2: jax.Array
    b2: jax.Array
    w3: jax.Array
    b3: jax.Array
    w4: jax.Array
    b4: jax.Array
    w5: jax.Array   # f32[HID, HEAD_PAD]
    b5: jax.Array   # f32[1, HEAD_PAD] — NEG_BIG beyond the real head width


def pack_mlp_params(params, head_dim: int) -> PackedMLP:
    """Pad flax QNetwork params (plain MLP, non-dueling) for the kernel.
    Jittable — runs inside the training chunk so fresh learner params flow
    straight into the next kernel call."""
    p = params["params"]
    ws = [p[f"Dense_{i}"]["kernel"].astype(jnp.float32) for i in range(N_LAYERS)]
    bs = [p[f"Dense_{i}"]["bias"].astype(jnp.float32) for i in range(N_LAYERS)]
    obs_dim = ws[0].shape[0]
    w1 = jnp.zeros((OBS_PAD, HID), jnp.float32).at[:obs_dim].set(ws[0])
    w5 = jnp.zeros((HID, HEAD_PAD), jnp.float32).at[:, :head_dim].set(ws[4])
    b5 = jnp.full((1, HEAD_PAD), NEG_BIG, jnp.float32).at[0, :head_dim].set(bs[4])
    return PackedMLP(
        w1=w1, b1=bs[0][None, :],
        w2=ws[1], b2=bs[1][None, :],
        w3=ws[2], b3=bs[2][None, :],
        w4=ws[3], b4=bs[3][None, :],
        w5=w5, b5=b5,
    )


def _argmin_lane(values, mask, lane):
    """First-occurrence argmax on the lane dim: max over masked lanes, then
    the smallest lane index attaining it (jnp.argmax tie-break semantics)."""
    neg = jnp.where(mask, values, NEG_BIG)
    m = jnp.max(neg, axis=1, keepdims=True)
    hit = (neg == m) & mask
    return jnp.min(jnp.where(hit, lane, 10_000), axis=1)


def _kernel(
    seed_ref, gs_ref, sched_ref,
    cols_ref, pieces_ref, cursor_ref, lines_ref, moves_ref, status_ref,
    lg_ref, ml_ref, bank_cols_ref, bank_pieces_ref,
    colmask_ref, rtopo_ref, width_ref, height_ref, nrot_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, b4_ref,
    w5_ref, b5_ref,
    out_cols_ref, out_pieces_ref, out_cursor_ref, out_lines_ref,
    out_moves_ref, out_status_ref, out_stats_ref,
    t_cols_ref, t_ncols_ref, t_int_ref,
    *, n_steps: int, tile: int, bank: int, pieces_len: int, head_dim: int,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + pid)
    f32 = jnp.float32

    piece_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, pieces_len), 1)
    iota7 = jax.lax.broadcasted_iota(jnp.int32, (tile, 7), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (tile, HEAD_PAD), 1)

    def rand_u01():
        bits = pltpu.prng_random_bits((1, tile))[0, :]
        return ((bits >> 16) & 0xFFFF).astype(f32) / 65536.0

    def rand_int(maxval_f):
        return (rand_u01() * maxval_f).astype(jnp.int32)

    def gather_piece(pieces_f, cursor):
        oh = (piece_iota == cursor[:, None]).astype(f32)
        return jnp.sum(oh * pieces_f, axis=1).astype(jnp.int32)

    def body(step, carry):
        cols, pieces_f, cursor, lines, moves, status, episodes, wins = carry

        # --- observation (engine.observe encoding, padded to 256 lanes) ---
        cur = gather_piece(pieces_f, jnp.clip(cursor, 0, pieces_len - 1))
        nxt = gather_piece(pieces_f, jnp.clip(cursor + 1, 0, pieces_len - 1))
        parts = [((cols >> r) & 1).astype(f32) for r in range(H)]
        parts.append((iota7 == cur[:, None]).astype(f32))
        parts.append((iota7 == nxt[:, None]).astype(f32))
        ll = lg_ref[:, 0] - lines
        ml = ml_ref[:, 0] - moves
        status_f = jnp.where(
            status == 1, 1.0, jnp.where(status == 2, -1.0, 0.0)
        ).astype(f32)
        parts.append(
            jnp.stack([ll.astype(f32), ml.astype(f32), status_f], axis=1)
        )
        parts.append(jnp.zeros((tile, OBS_PAD - 217), f32))
        obs = jnp.concatenate(parts, axis=1)          # [tile, 256]

        # --- MLP forward on the MXU ---
        h = jnp.maximum(
            jnp.dot(obs, w1_ref[:], preferred_element_type=f32) + b1_ref[:], 0.0
        )
        h = jnp.maximum(
            jnp.dot(h, w2_ref[:], preferred_element_type=f32) + b2_ref[:], 0.0
        )
        h = jnp.maximum(
            jnp.dot(h, w3_ref[:], preferred_element_type=f32) + b3_ref[:], 0.0
        )
        h = jnp.maximum(
            jnp.dot(h, w4_ref[:], preferred_element_type=f32) + b4_ref[:], 0.0
        )
        q = jnp.dot(h, w5_ref[:], preferred_element_type=f32) + b5_ref[:]

        # --- greedy action (first-occurrence argmax, like jnp.argmax) ---
        if head_dim == 14:   # additive factored: per-branch argmax
            rot_g = _argmin_lane(q, lane128 < 4, lane128)
            col_g = _argmin_lane(q, (lane128 >= 4) & (lane128 < 14), lane128) - 4
        else:                # 40-way joint head
            a = _argmin_lane(q, lane128 < 40, lane128)
            rot_g = a // 10
            col_g = a - rot_g * 10

        # --- epsilon-greedy (reference schedule, model/train.py:10-19) ---
        gs = gs_ref[0] + step
        eps = sched_ref[1] + (sched_ref[0] - sched_ref[1]) * jnp.exp(
            -gs.astype(f32) / sched_ref[2]
        )
        explore = rand_u01() < eps
        rot = jnp.where(explore, rand_int(jnp.full((), 4.0, f32)), rot_g)
        col = jnp.where(explore, rand_int(jnp.full((), 10.0, f32)), col_g)

        # --- env step + auto-reset (shared fuzz-verified math) ---
        reset_idx = rand_int(jnp.full((), float(bank), f32))
        (n_cols, n_pieces_f, n_cursor, n_lines, n_moves, n_status), info = (
            env_step_once(
                cols, pieces_f, cursor, lines, moves, status,
                lg_ref[:, 0], ml_ref[:, 0],
                rot, col, reset_idx,
                colmask_ref[:], rtopo_ref[:], width_ref[:], height_ref[:],
                nrot_ref[:], bank_cols_ref[:], bank_pieces_ref[:],
                tile=tile, bank=bank, pieces_len=pieces_len,
            )
        )

        # --- transition record (packed replay fields) ---
        pre_cur = gather_piece(
            pieces_f, jnp.clip(info["pre_cursor"], 0, pieces_len - 1)
        )
        pre_nxt = gather_piece(
            pieces_f, jnp.clip(info["pre_cursor"] + 1, 0, pieces_len - 1)
        )
        ints = jnp.stack(
            [
                cur, nxt, ll, ml, rot, col,
                info["lines_delta"],
                info["done"].astype(jnp.int32),
                info["won"].astype(jnp.int32),
                pre_cur, pre_nxt,
                lg_ref[:, 0] - info["pre_lines"],
                ml_ref[:, 0] - info["pre_moves"],
                info["pre_status"],
                jnp.zeros((tile,), jnp.int32),
                jnp.zeros((tile,), jnp.int32),
            ],
            axis=1,
        )                                              # [tile, 16]
        t_cols_ref[pl.ds(step, 1), :, :] = cols.astype(jnp.int32)[None]
        t_ncols_ref[pl.ds(step, 1), :, :] = (
            info["pre_cols"].astype(jnp.int32)[None]
        )
        t_int_ref[pl.ds(step, 1), :, :] = ints[None]

        episodes = episodes + jnp.sum(info["done"].astype(jnp.int32))
        wins = wins + jnp.sum(info["won"].astype(jnp.int32))
        return (n_cols, n_pieces_f, n_cursor, n_lines, n_moves, n_status,
                episodes, wins)

    init = (
        cols_ref[:],
        pieces_ref[:].astype(f32),
        cursor_ref[:, 0],
        lines_ref[:, 0],
        moves_ref[:, 0],
        status_ref[:, 0],
        jnp.int32(0),
        jnp.int32(0),
    )
    (cols, pieces_f, cursor, lines, moves, status, episodes, wins) = (
        jax.lax.fori_loop(0, n_steps, body, init)
    )
    out_cols_ref[:] = cols
    out_pieces_ref[:] = pieces_f.astype(jnp.int32)
    out_cursor_ref[:, 0] = cursor
    out_lines_ref[:, 0] = lines
    out_moves_ref[:, 0] = moves
    out_status_ref[:, 0] = status
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    out_stats_ref[:] = jnp.where(
        row == 0, episodes, jnp.where(row == 1, wins, 0)
    )


class ActorTransitions(NamedTuple):
    """K steps of packed transitions, leading axes [K, N]."""
    cols: jax.Array          # uint32[K, N, 10] — s (pre-action)
    n_cols: jax.Array        # uint32[K, N, 10] — s' (post-action, pre-reset)
    cur: jax.Array           # int32[K, N]
    nxt: jax.Array
    lines_left: jax.Array
    moves_left: jax.Array
    rot: jax.Array
    col: jax.Array
    lines_delta: jax.Array
    done: jax.Array          # bool[K, N]
    won: jax.Array           # bool[K, N]
    n_cur: jax.Array
    n_nxt: jax.Array
    n_lines_left: jax.Array
    n_moves_left: jax.Array
    n_status: jax.Array


def actor_rollout_fused(
    state: bb.PackedState,
    params,
    bank_cols: jax.Array,     # uint32[B, 10]
    bank_pieces: jax.Array,   # int8[B, P]
    global_step: jax.Array,   # int32 — epsilon schedule position
    seed: jax.Array,          # int32 scalar
    *,
    eps_start: float,
    eps_end: float,
    eps_decay: float,
    head_dim: int,
    n_steps: int,
    tile: int = 512,
    interpret: bool = False,
):
    """K fused actor steps. Returns
    ``(new_state, ActorTransitions, episodes, wins)``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = state.cols.shape[0]
    assert n % tile == 0, (n, tile)
    grid = (n // tile,)
    bank = bank_cols.shape[0]
    assert bank <= 65536, f"bank capacity {bank} exceeds 16-bit index range"
    pieces_len = state.pieces.shape[1]
    packed = (
        params if isinstance(params, PackedMLP)
        else pack_mlp_params(params, head_dim)
    )

    def col2(x):
        return x.reshape(n, 1).astype(jnp.int32)

    kernel = functools.partial(
        _kernel, n_steps=n_steps, tile=tile, bank=bank,
        pieces_len=pieces_len, head_dim=head_dim,
    )
    row_spec = lambda width: pl.BlockSpec(
        (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    rep_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    steps_spec = lambda width: pl.BlockSpec(
        (n_steps, tile, width), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),   # global step
            pl.BlockSpec(memory_space=pltpu.SMEM),   # eps schedule
            row_spec(10),                            # cols
            row_spec(pieces_len),                    # pieces
            row_spec(1), row_spec(1), row_spec(1),   # cursor, lines, moves
            row_spec(1), row_spec(1), row_spec(1),   # status, lg, ml
            rep_spec((bank, 10)),                    # bank cols (f32)
            rep_spec((bank, pieces_len)),            # bank pieces (f32)
            rep_spec((P28, 4)), rep_spec((P28, 4)),  # colmask, rtopo
            rep_spec((P28,)), rep_spec((P28,)),      # width, height
            rep_spec((7,)),                          # nrot
            rep_spec((OBS_PAD, HID)), rep_spec((1, HID)),   # w1, b1
            rep_spec((HID, HID)), rep_spec((1, HID)),       # w2, b2
            rep_spec((HID, HID)), rep_spec((1, HID)),       # w3, b3
            rep_spec((HID, HID)), rep_spec((1, HID)),       # w4, b4
            rep_spec((HID, HEAD_PAD)), rep_spec((1, HEAD_PAD)),  # w5, b5
        ],
        out_specs=[
            row_spec(10), row_spec(pieces_len),
            row_spec(1), row_spec(1), row_spec(1), row_spec(1),
            row_spec(1),
            steps_spec(10), steps_spec(10), steps_spec(T_INT_W),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 10), jnp.uint32),
            jax.ShapeDtypeStruct((n, pieces_len), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_steps, n, 10), jnp.int32),
            jax.ShapeDtypeStruct((n_steps, n, 10), jnp.int32),
            jax.ShapeDtypeStruct((n_steps, n, T_INT_W), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([global_step], jnp.int32),
        jnp.asarray([eps_start, eps_end, eps_decay], jnp.float32),
        state.cols,
        state.pieces.astype(jnp.int32),
        col2(state.cursor), col2(state.lines_cleared), col2(state.moves_used),
        col2(state.status), col2(state.lines_goal), col2(state.move_limit),
        bank_cols.astype(jnp.float32),
        bank_pieces.astype(jnp.float32),
        jnp.asarray(_COLMASK4), jnp.asarray(_RTOPO4),
        jnp.asarray(_WIDTH28), jnp.asarray(_HEIGHT28), jnp.asarray(_NROT7),
        packed.w1, packed.b1, packed.w2, packed.b2, packed.w3, packed.b3,
        packed.w4, packed.b4, packed.w5, packed.b5,
    )
    (cols, pieces_out, cursor, lines, moves, status, stats,
     t_cols, t_ncols, t_int) = out
    stats_t = stats.reshape(grid[0], tile)
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
    trans = ActorTransitions(
        cols=t_cols.astype(jnp.uint32),
        n_cols=t_ncols.astype(jnp.uint32),
        cur=t_int[..., 0], nxt=t_int[..., 1],
        lines_left=t_int[..., 2], moves_left=t_int[..., 3],
        rot=t_int[..., 4], col=t_int[..., 5],
        lines_delta=t_int[..., 6],
        done=t_int[..., 7].astype(bool),
        won=t_int[..., 8].astype(bool),
        n_cur=t_int[..., 9], n_nxt=t_int[..., 10],
        n_lines_left=t_int[..., 11], n_moves_left=t_int[..., 12],
        n_status=t_int[..., 13],
    )
    return new_state, trans, stats_t[:, 0].sum(), stats_t[:, 1].sum()
