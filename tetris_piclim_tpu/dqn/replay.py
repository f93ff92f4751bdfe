"""Device-resident ring replay buffer (functional).

The reference's intended replay (model/train.py:8-9 comments) never existed
in code. Here it is a fixed-shape pytree living in device memory: adds are
batched scatter-writes at the ring head; samples are uniform gathers — both
fuse into the jitted training step, so transitions never cross the host
boundary (the actor-env-replay-learner loop the reference would have run in
one Python process becomes device-local; SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..engine import OBS_DIM


class ReplayState(NamedTuple):
    obs: jax.Array        # f32[C, OBS_DIM]
    rot: jax.Array        # int8[C]
    col: jax.Array        # int8[C]
    reward: jax.Array     # f32[C]
    next_obs: jax.Array   # f32[C, OBS_DIM]
    done: jax.Array       # bool[C]
    pos: jax.Array        # int32 — ring head
    size: jax.Array       # int32 — filled entries


class Batch(NamedTuple):
    obs: jax.Array
    rot: jax.Array
    col: jax.Array
    reward: jax.Array
    next_obs: jax.Array
    done: jax.Array


def replay_init(capacity: int) -> ReplayState:
    return ReplayState(
        obs=jnp.zeros((capacity, OBS_DIM), jnp.float32),
        rot=jnp.zeros((capacity,), jnp.int8),
        col=jnp.zeros((capacity,), jnp.int8),
        reward=jnp.zeros((capacity,), jnp.float32),
        next_obs=jnp.zeros((capacity, OBS_DIM), jnp.float32),
        done=jnp.zeros((capacity,), bool),
        pos=jnp.int32(0),
        size=jnp.int32(0),
    )


def replay_add(
    r: ReplayState,
    obs: jax.Array,
    rot: jax.Array,
    col: jax.Array,
    reward: jax.Array,
    next_obs: jax.Array,
    done: jax.Array,
) -> ReplayState:
    """Batched ring write of N transitions."""
    n = obs.shape[0]
    cap = r.obs.shape[0]
    idx = jnp.mod(r.pos + jnp.arange(n, dtype=jnp.int32), cap)
    return ReplayState(
        obs=r.obs.at[idx].set(obs),
        rot=r.rot.at[idx].set(rot.astype(jnp.int8)),
        col=r.col.at[idx].set(col.astype(jnp.int8)),
        reward=r.reward.at[idx].set(reward),
        next_obs=r.next_obs.at[idx].set(next_obs),
        done=r.done.at[idx].set(done),
        pos=jnp.mod(r.pos + n, cap),
        size=jnp.minimum(r.size + n, cap),
    )


def replay_sample(r: ReplayState, key: jax.Array, batch_size: int) -> Batch:
    """Uniform sample of ``batch_size`` transitions (with replacement), per
    the intended BATCH_SIZE=128 sampling (reference model/train.py:8, 15)."""
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(r.size, 1))
    return Batch(
        obs=r.obs[idx],
        rot=r.rot[idx].astype(jnp.int32),
        col=r.col[idx].astype(jnp.int32),
        reward=r.reward[idx],
        next_obs=r.next_obs[idx],
        done=r.done[idx],
    )
