"""Device-resident ring replay buffer (functional, compact-packed).

The reference's intended replay (model/train.py:8-9 comments) never existed
in code. Here it is a fixed-shape pytree living in device memory, designed
around TPU memory bandwidth:

* transitions are stored **packed** — the 10 uint32 column bitmasks plus the
  scalar obs fields (current/next piece ids, lines-left, moves-left, status)
  — ~93 bytes per transition instead of the 1736 bytes of two 217-float
  observations. The float observation is reconstructed at *sample* time for
  the 128-transition batch (cheap) rather than materialized at *write* time
  for every env every step (the measured bottleneck: packed writes lifted
  the fused training chunk from 3.3M to >10M env-steps/s per chip);
* writes are one contiguous ``lax.dynamic_update_slice`` at the ring head —
  the capacity must be a multiple of the per-step batch, so the window never
  wraps and no scatter is emitted;
* samples are uniform gathers, fused into the jitted training step.

Transitions never cross the host boundary (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import tables
from ..engine import LOSS, WIN
from ..ops.bitboard import PackedState, unpack_board


class ReplayState(NamedTuple):
    # state before the action (packed obs fields)
    cols: jax.Array        # uint32[C, 10]
    cur: jax.Array         # int8[C]   — current piece id
    nxt: jax.Array         # int8[C]   — next piece id
    lines_left: jax.Array  # int32[C]
    moves_left: jax.Array  # int32[C]
    # action / outcome
    rot: jax.Array         # int8[C]
    col: jax.Array         # int8[C]
    reward: jax.Array      # f32[C]
    done: jax.Array        # bool[C]
    # state after the action (pre-reset)
    n_cols: jax.Array        # uint32[C, 10]
    n_cur: jax.Array         # int8[C]
    n_nxt: jax.Array         # int8[C]
    n_lines_left: jax.Array  # int32[C]
    n_moves_left: jax.Array  # int32[C]
    n_status: jax.Array      # int8[C]
    # prioritized-replay support (ignored when sampling uniformly)
    priority: jax.Array    # f32[C]  — raw |td| + eps; alpha applied at sample
    max_prio: jax.Array    # f32     — running max, assigned to fresh writes
    # ring bookkeeping
    pos: jax.Array         # int32
    size: jax.Array        # int32


class Batch(NamedTuple):
    obs: jax.Array
    rot: jax.Array
    col: jax.Array
    reward: jax.Array
    next_obs: jax.Array
    done: jax.Array
    # n-step / PER extras; None = 1-step uniform semantics (td_loss then uses
    # cfg.gamma and unit weights)
    discount: jax.Array | None = None  # f32[B] — gamma^(k*+1) per sample
    weight: jax.Array | None = None    # f32[B] — importance-sampling weights


def replay_init(capacity: int) -> ReplayState:
    z8 = jnp.zeros((capacity,), jnp.int8)
    z32 = jnp.zeros((capacity,), jnp.int32)
    return ReplayState(
        cols=jnp.zeros((capacity, 10), jnp.uint32),
        cur=z8, nxt=z8, lines_left=z32, moves_left=z32,
        rot=z8, col=z8,
        reward=jnp.zeros((capacity,), jnp.float32),
        done=jnp.zeros((capacity,), bool),
        n_cols=jnp.zeros((capacity, 10), jnp.uint32),
        n_cur=z8, n_nxt=z8, n_lines_left=z32, n_moves_left=z32,
        n_status=z8,
        priority=jnp.zeros((capacity,), jnp.float32),
        max_prio=jnp.float32(1.0),
        pos=jnp.int32(0),
        size=jnp.int32(0),
    )


def _fields(state: PackedState):
    """Packed obs fields of a batched PackedState."""
    p = state.pieces.shape[1]
    cur = jnp.take_along_axis(
        state.pieces, jnp.clip(state.cursor, 0, p - 1)[:, None], axis=1
    )[:, 0]
    nxt = jnp.take_along_axis(
        state.pieces, jnp.clip(state.cursor + 1, 0, p - 1)[:, None], axis=1
    )[:, 0]
    return (
        state.cols,
        cur,
        nxt,
        state.lines_goal - state.lines_cleared,
        state.move_limit - state.moves_used,
        state.status,
    )


def replay_add(
    r: ReplayState,
    state_before: PackedState,
    rot: jax.Array,
    col: jax.Array,
    reward: jax.Array,
    state_after: PackedState,
    done: jax.Array,
) -> ReplayState:
    """Contiguous ring write of N transitions. Requires capacity % N == 0
    (checked at trace time) so the window never wraps."""
    cols, cur, nxt, ll, ml, _ = _fields(state_before)
    n_cols, n_cur, n_nxt, n_ll, n_ml, n_st = _fields(state_after)
    return replay_add_fields(
        r, cols, cur, nxt, ll, ml, rot, col, reward, done,
        n_cols, n_cur, n_nxt, n_ll, n_ml, n_st,
    )


def replay_add_fields(
    r: ReplayState,
    cols, cur, nxt, ll, ml,
    rot, col, reward, done,
    n_cols, n_cur, n_nxt, n_ll, n_ml, n_st,
) -> ReplayState:
    """replay_add on pre-extracted packed fields — the fused actor kernel
    (ops/pallas_actor.py) emits transitions in exactly this layout."""
    n = rot.shape[0]
    cap = r.cols.shape[0]
    if cap % n != 0:
        raise ValueError(
            f"replay capacity ({cap}) must be a multiple of the per-step "
            f"batch ({n}) for wrap-free contiguous writes"
        )
    pos = r.pos

    def put(buf, val):
        val = val.astype(buf.dtype)
        idx = (pos,) + (0,) * (buf.ndim - 1)
        return jax.lax.dynamic_update_slice(buf, val, idx)

    return ReplayState(
        cols=put(r.cols, cols),
        cur=put(r.cur, cur), nxt=put(r.nxt, nxt),
        lines_left=put(r.lines_left, ll), moves_left=put(r.moves_left, ml),
        rot=put(r.rot, rot), col=put(r.col, col),
        reward=put(r.reward, reward), done=put(r.done, done),
        n_cols=put(r.n_cols, n_cols),
        n_cur=put(r.n_cur, n_cur), n_nxt=put(r.n_nxt, n_nxt),
        n_lines_left=put(r.n_lines_left, n_ll),
        n_moves_left=put(r.n_moves_left, n_ml),
        n_status=put(r.n_status, n_st),
        priority=put(r.priority, jnp.full((n,), r.max_prio, jnp.float32)),
        max_prio=r.max_prio,
        pos=jnp.mod(pos + n, cap),
        size=jnp.minimum(r.size + n, cap),
    )


def _obs_from_fields(cols, cur, nxt, lines_left, moves_left, status) -> jax.Array:
    """Reconstruct the 217-float observation (engine.observe encoding) from
    packed fields."""
    board = unpack_board(cols).astype(jnp.float32)
    status_f = jnp.where(
        status == WIN, 1.0, jnp.where(status == LOSS, -1.0, 0.0)
    )
    return jnp.concatenate(
        [
            board.reshape(board.shape[0], -1),
            jax.nn.one_hot(cur.astype(jnp.int32), tables.NUM_PIECES, dtype=jnp.float32),
            jax.nn.one_hot(nxt.astype(jnp.int32), tables.NUM_PIECES, dtype=jnp.float32),
            jnp.stack(
                [
                    lines_left.astype(jnp.float32),
                    moves_left.astype(jnp.float32),
                    status_f,
                ],
                axis=1,
            ),
        ],
        axis=1,
    )


def replay_sample(r: ReplayState, key: jax.Array, batch_size: int) -> Batch:
    """Uniform sample of ``batch_size`` transitions (with replacement), per
    the intended BATCH_SIZE=128 sampling (reference model/train.py:8, 15).
    Observations are reconstructed here — 128 unpacks, not 4096 packs."""
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(r.size, 1))
    running = jnp.zeros((batch_size,), jnp.int8)
    obs = _obs_from_fields(
        r.cols[idx], r.cur[idx], r.nxt[idx],
        r.lines_left[idx], r.moves_left[idx], running,
    )
    next_obs = _obs_from_fields(
        r.n_cols[idx], r.n_cur[idx], r.n_nxt[idx],
        r.n_lines_left[idx], r.n_moves_left[idx], r.n_status[idx],
    )
    return Batch(
        obs=obs,
        rot=r.rot[idx].astype(jnp.int32),
        col=r.col[idx].astype(jnp.int32),
        reward=r.reward[idx],
        next_obs=next_obs,
        done=r.done[idx],
    )


def replay_sample_ext(
    r: ReplayState,
    key: jax.Array,
    batch_size: int,
    *,
    gamma: float,
    n_step: int = 1,
    step_gap: int = 1,
    prioritized: bool = False,
    alpha: float = 0.6,
    beta: float = 0.4,
) -> tuple[Batch, jax.Array]:
    """n-step / prioritized sampler. Returns ``(batch, base_indices)``; the
    indices feed :func:`replay_update_priority` after the TD update.

    Exploits the ring layout: writes are contiguous blocks of ``step_gap``
    (= num_envs) transitions and capacity % step_gap == 0, so the *next*
    transition of the same env slot always sits exactly ``step_gap`` slots
    ahead (mod capacity). The n-step chain for base index ``i`` is therefore
    the pure gather ``i, i+g, ..., i+(n-1)g`` — no per-env episode bookkeeping.
    Returns are truncated at the first ``done`` in the chain (the auto-reset
    successor belongs to a new episode); ``batch.discount`` carries
    gamma^(k*+1) so the TD target bootstraps from the right horizon.

    Base indices are restricted to transitions whose full chain has been
    written (the newest ``(n-1)*step_gap`` logical slots are excluded).
    Prioritized mode samples bases ∝ priority^alpha (Gumbel/categorical over
    the masked buffer) and returns max-normalized importance weights
    (Schaul et al. 2015 proportional variant).
    """
    cap = r.cols.shape[0]
    n_step = int(n_step)
    oldest = jnp.mod(r.pos - r.size, cap)
    valid = jnp.maximum(r.size - (n_step - 1) * step_gap, 1)

    if prioritized:
        # logical age of each physical slot; mask slots without a full chain
        logical = jnp.mod(jnp.arange(cap, dtype=jnp.int32) - oldest, cap)
        ok = logical < valid
        logp = alpha * jnp.log(jnp.maximum(r.priority, 1e-12))
        logits = jnp.where(ok, logp, -jnp.inf)
        idx0 = jax.random.categorical(key, logits, shape=(batch_size,)).astype(
            jnp.int32
        )
        log_z = jax.nn.logsumexp(logits)
        log_p_sel = (
            alpha * jnp.log(jnp.maximum(r.priority[idx0], 1e-12)) - log_z
        )
        w = jnp.exp(-beta * (jnp.log(valid.astype(jnp.float32)) + log_p_sel))
        weight = w / jnp.maximum(w.max(), 1e-12)
    else:
        j = jax.random.randint(key, (batch_size,), 0, valid)
        idx0 = jnp.mod(oldest + j, cap).astype(jnp.int32)
        weight = jnp.ones((batch_size,), jnp.float32)

    ks = jnp.arange(n_step, dtype=jnp.int32)
    idx = jnp.mod(idx0[:, None] + ks[None, :] * step_gap, cap)  # [B, n]
    rew = r.reward[idx]
    dn = r.done[idx]
    # include transition k iff no done strictly before it in the chain
    done_before = jnp.cumsum(dn, axis=1) - dn.astype(jnp.int32)
    include = (done_before == 0).astype(jnp.float32)
    gammas = jnp.float32(gamma) ** ks.astype(jnp.float32)
    returns = jnp.sum(include * gammas[None, :] * rew, axis=1)

    rows = jnp.arange(batch_size)
    k_star = jnp.where(dn.any(axis=1), jnp.argmax(dn, axis=1), n_step - 1)
    idx_last = idx[rows, k_star]
    done_out = dn[rows, k_star]
    discount = jnp.float32(gamma) ** (k_star.astype(jnp.float32) + 1.0)

    running = jnp.zeros((batch_size,), jnp.int8)
    obs = _obs_from_fields(
        r.cols[idx0], r.cur[idx0], r.nxt[idx0],
        r.lines_left[idx0], r.moves_left[idx0], running,
    )
    next_obs = _obs_from_fields(
        r.n_cols[idx_last], r.n_cur[idx_last], r.n_nxt[idx_last],
        r.n_lines_left[idx_last], r.n_moves_left[idx_last],
        r.n_status[idx_last],
    )
    batch = Batch(
        obs=obs,
        rot=r.rot[idx0].astype(jnp.int32),
        col=r.col[idx0].astype(jnp.int32),
        reward=returns,
        next_obs=next_obs,
        done=done_out,
        discount=discount,
        weight=weight,
    )
    return batch, idx0


def replay_update_priority(
    r: ReplayState, idx: jax.Array, td_abs: jax.Array, eps: float
) -> ReplayState:
    """Write |td| + eps back at the sampled base indices (scatter; duplicate
    indices keep the last write, as in reference PER implementations)."""
    new_p = td_abs + jnp.float32(eps)
    return r._replace(
        priority=r.priority.at[idx].set(new_p),
        max_prio=jnp.maximum(r.max_prio, new_p.max()),
    )
