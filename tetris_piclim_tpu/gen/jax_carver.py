"""On-device vectorized carving generator (JAX, packed bitboards).

The reverse-carving construction of the reference (game/tetris.py:226-352)
re-designed for lockstep generation of THOUSANDS of winnable configurations
per call on the accelerator — the "on-device fallback so resets never stall
on the host" from SURVEY.md §7. All envs carve in parallel inside one jitted
``lax.while_loop``; each iteration proposes a random (piece, rotation,
location), evaluates all candidate carve depths simultaneously on packed
uint32 column bitmasks, and accepts the first valid one.

Semantic contract kept from the reference (these make the output provably
winnable): a carve is accepted only when a fresh forward hard drop after the
carve lands exactly in the carved hole (game/tetris.py:341-349); the first
carve may be partial (game/tetris.py:257, 303-311), later carves must
overlap fully (game/tetris.py:320-329); carving ends when the bottom row has
<= 8 filled cells (game/tetris.py:234); the piece list is padded to M+1
(game/tetris.py:281-284).

Designed differences from the host carver (decide-and-document — the
on-device generator is a throughput device, not a parity target; the host
:mod:`.carver` keeps bit-exact reference parity):

* pieces are sampled uniformly iid instead of from a 7-bag — winnability is
  unaffected (any carved sequence replays to a win), only the piece mix;
* instead of the checkpoint/backtrack stack (game/tetris.py:111-137), an
  env that stalls (> 40 consecutive failed carves, the reference's own
  attempt budget) restarts from the solid-L board — restart is cheap in
  lockstep, and no inter-env synchronization is needed.

The generated solutions replay to WIN through the engine — enforced by
tests/test_jax_carver.py.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import tables
from ..ops.bitboard import _COLMASK10, _HEIGHT, _NROT, _RTOPO10, _WIDTH, _ctz20

H, W = tables.BOARD_H, tables.BOARD_W
_MAX_FAILS = 40  # reference CheckpointManager.max_attempts (game/tetris.py:116)


class CarveBatch(NamedTuple):
    boards: jax.Array      # uint32[N, 10] — packed initial configurations
    pieces: jax.Array      # int8[N, M+1]  — piece sequence (played order)
    rotations: jax.Array   # int8[N, M]    — solution rotations (played order)
    locations: jax.Array   # int8[N, M]    — solution locations (played order)
    n_moves: jax.Array     # int32[N]      — carved prefix length (<= M)


def _bottom_row_count(cols: jax.Array) -> jax.Array:
    return jnp.sum((cols >> (H - 1)) & 1, axis=-1).astype(jnp.int32)


def generate_batch_device(
    key: jax.Array,
    n: int,
    L: int,
    M: int,
    max_iters: Optional[int] = None,
) -> CarveBatch:
    """Carve ``n`` winnable (board, sequence) configurations in lockstep.

    Returns packed boards, sequences of length M+1 and the recorded solution
    (first ``n_moves`` entries replay to a WIN clearing >= L lines).
    """
    if max_iters is None:
        max_iters = 24 * M + 512
    P = M + 1
    solid = jnp.full(
        (n, W), jnp.uint32(((1 << L) - 1) << (H - L)), dtype=jnp.uint32
    )

    def cond(carry):
        it, key, cols, seq, rots, locs, n_mv, fails, done = carry
        return (it < max_iters) & ~jnp.all(done)

    def body(carry):
        it, key, cols, seq, rots, locs, n_mv, fails, done = carry
        key, k_p, k_r, k_l = jax.random.split(key, 4)

        piece = jax.random.randint(k_p, (n,), 0, 7)
        rot_raw = jax.random.randint(k_r, (n,), 0, 4)
        r = jnp.mod(rot_raw, _NROT[piece])
        w = _WIDTH[piece, r]
        h = _HEIGHT[piece, r]
        u = jax.random.uniform(k_l, (n,))
        loc = (u * (W - w + 1).astype(jnp.float32)).astype(jnp.int32)
        loc = jnp.clip(loc, 0, W - w)

        flat = (piece * 4 + r) * 10 + loc
        mask10 = _COLMASK10[flat]            # uint32[n, 10]
        rtopo10 = _RTOPO10[flat]             # int32[n, 10]

        # forward drop on the current board (reference game/tetris.py:293-296)
        topo = _ctz20(cols)
        deltas = topo - rtopo10
        drop0 = jnp.min(deltas, axis=1) - 1
        amin = jnp.argmin(deltas, axis=1)
        push = (
            jnp.take_along_axis(rtopo10, amin[:, None], axis=1)[:, 0] + 1
        )                                     # game/tetris.py:298-301
        top_drop = drop0 + push               # deepest candidate

        allow_partial = n_mv == 0             # game/tetris.py:257

        # evaluate candidate depths top_drop - i for i in 0..3 in parallel;
        # each failed candidate would be reverted, so all see the same board
        cand = top_drop[:, None] - jnp.arange(4)[None, :]       # [n, 4]
        n_cand = jnp.where(allow_partial, h, 1)                 # [n]
        cand_ok_slot = jnp.arange(4)[None, :] < n_cand[:, None]

        shift = jnp.clip(cand, 0, H).astype(jnp.uint32)         # [n, 4]
        smask = mask10[:, None, :] << shift[:, :, None]         # [n, 4, 10]
        in_bounds = (cand >= 0) & (cand + h[:, None] <= H)
        overlap_full = jnp.all(
            (cols[:, None, :] & smask) == smask, axis=2
        )
        carved = cols[:, None, :] & ~smask                      # [n, 4, 10]
        topo_c = _ctz20(carved)                                 # [n, 4, 10]
        nd = jnp.min(topo_c - rtopo10[:, None, :], axis=2) - 1  # [n, 4]
        lands_in_hole = nd == cand                              # tetris.py:341-349
        ok = (
            cand_ok_slot
            & in_bounds
            & (allow_partial[:, None] | overlap_full)
            & lands_in_hole
        )
        any_ok = jnp.any(ok, axis=1)
        first = jnp.argmax(ok, axis=1)                          # first valid depth
        chosen = jnp.take_along_axis(
            carved, first[:, None, None], axis=1
        )[:, 0, :]

        active = ~done & (n_mv < M)
        accept = active & any_ok

        new_cols = jnp.where(accept[:, None], chosen, cols)
        slot = jnp.clip(n_mv, 0, M - 1)
        seq = jnp.where(
            (jnp.arange(M)[None, :] == slot[:, None]) & accept[:, None],
            piece[:, None].astype(jnp.int8),
            seq,
        )
        rots = jnp.where(
            (jnp.arange(M)[None, :] == slot[:, None]) & accept[:, None],
            rot_raw[:, None].astype(jnp.int8),
            rots,
        )
        locs = jnp.where(
            (jnp.arange(M)[None, :] == slot[:, None]) & accept[:, None],
            loc[:, None].astype(jnp.int8),
            locs,
        )
        n_mv = jnp.where(accept, n_mv + 1, n_mv)
        fails = jnp.where(accept, 0, jnp.where(active, fails + 1, fails))

        finished = (
            active & (_bottom_row_count(new_cols) <= 8) & (n_mv > 0)
        )  # game/tetris.py:234
        done = done | finished

        # stall (or move-budget exhaustion) -> restart from the solid board
        restart = active & ~finished & ((fails > _MAX_FAILS) | (n_mv >= M))
        new_cols = jnp.where(restart[:, None], solid, new_cols)
        n_mv = jnp.where(restart, 0, n_mv)
        fails = jnp.where(restart, 0, fails)
        return (it + 1, key, new_cols, seq, rots, locs, n_mv, fails, done)

    init = (
        jnp.int32(0),
        key,
        solid,
        jnp.zeros((n, M), jnp.int8),
        jnp.zeros((n, M), jnp.int8),
        jnp.zeros((n, M), jnp.int8),
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), bool),
    )
    it, key, cols, seq_rev, rots_rev, locs_rev, n_mv, fails, done = (
        jax.lax.while_loop(cond, body, init)
    )

    # carved order is reversed for play (reference insert(0, ...) at
    # game/tetris.py:258-260): played[i] = carved[n_mv - 1 - i]
    key, k_pad = jax.random.split(key)
    idx = n_mv[:, None] - 1 - jnp.arange(P)[None, :]
    valid = idx >= 0
    gidx = jnp.clip(idx, 0, M - 1)
    pad = jax.random.randint(k_pad, (n, P), 0, 7, dtype=jnp.int8)
    pieces = jnp.where(
        valid, jnp.take_along_axis(seq_rev, gidx, axis=1), pad
    )
    idx_m = n_mv[:, None] - 1 - jnp.arange(M)[None, :]
    valid_m = idx_m >= 0
    gidx_m = jnp.clip(idx_m, 0, M - 1)
    rotations = jnp.where(
        valid_m, jnp.take_along_axis(rots_rev, gidx_m, axis=1), 0
    )
    locations = jnp.where(
        valid_m, jnp.take_along_axis(locs_rev, gidx_m, axis=1), 0
    )
    return CarveBatch(
        boards=cols,
        pieces=pieces.astype(jnp.int8),
        rotations=rotations.astype(jnp.int8),
        locations=locations.astype(jnp.int8),
        n_moves=jnp.where(done, n_mv, 0),
    )


# one module-level jit wrapper so repeated callers (per-chunk bank refresh)
# hit the compile cache instead of re-tracing a fresh jax.jit each call
generate_batch_device_jit = jax.jit(
    generate_batch_device, static_argnames=("n", "L", "M", "max_iters")
)
