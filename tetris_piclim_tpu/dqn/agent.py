"""Actor + learner math for the DQN (all jittable, batch-first).

Implements the algorithm the reference's constants/comments specify
(model/train.py:8-21): epsilon-greedy with exponential decay, replay-sampled
TD updates with a Polyak-averaged target network, AdamW(amsgrad).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..models.qnet import NUM_COL, NUM_ROT, FactoredQ
from ..utils.config import DQNConfig
from .replay import Batch


def eps_schedule(step: jax.Array, cfg: DQNConfig) -> jax.Array:
    """EPS_END + (EPS_START - EPS_END) * exp(-step / EPS_DECAY)
    (reference model/train.py:10-12, 17-19)."""
    return cfg.eps_end + (cfg.eps_start - cfg.eps_end) * jnp.exp(
        -step.astype(jnp.float32) / cfg.eps_decay
    )


def select_actions(
    apply_fn: Callable,
    params,
    obs: jax.Array,     # f32[N, OBS_DIM]
    eps: jax.Array,     # f32 scalar
    key: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Vmapped epsilon-greedy over the factored (rotation, column) space."""
    n = obs.shape[0]
    k_expl, k_rot, k_col = jax.random.split(key, 3)
    q = apply_fn(params, obs)
    g_rot, g_col = FactoredQ.greedy(q)
    r_rot = jax.random.randint(k_rot, (n,), 0, NUM_ROT)
    r_col = jax.random.randint(k_col, (n,), 0, NUM_COL)
    explore = jax.random.uniform(k_expl, (n,)) < eps
    rot = jnp.where(explore, r_rot, g_rot).astype(jnp.int32)
    col = jnp.where(explore, r_col, g_col).astype(jnp.int32)
    return rot, col


def td_loss(
    params,
    target_params,
    apply_fn: Callable,
    batch: Batch,
    cfg: DQNConfig,
) -> tuple[jax.Array, dict]:
    """Huber TD loss on the additive factored Q.

    ``double_dqn=True`` selects next actions with the online net and
    evaluates them with the target net; False is vanilla DQN (max over the
    target net), the literal reading of the reference's comments.
    """
    q = apply_fn(params, batch.obs)
    q_chosen = FactoredQ.gather(q, batch.rot, batch.col)

    q_next_target = apply_fn(target_params, batch.next_obs)
    if cfg.double_dqn:
        q_next_online = apply_fn(params, batch.next_obs)
        a_rot, a_col = FactoredQ.greedy(q_next_online)
        next_val = FactoredQ.gather(q_next_target, a_rot, a_col)
    else:
        next_val = FactoredQ.max_value(q_next_target)

    next_val = jax.lax.stop_gradient(next_val)
    target = batch.reward + cfg.gamma * (1.0 - batch.done.astype(jnp.float32)) * next_val
    td = q_chosen - target
    loss = jnp.mean(optax.losses.huber_loss(td, delta=cfg.huber_delta))
    aux = {
        "loss": loss,
        "q_mean": jnp.mean(q_chosen),
        "td_abs": jnp.mean(jnp.abs(td)),
    }
    return loss, aux


def make_optimizer(cfg: DQNConfig) -> optax.GradientTransformation:
    """AdamW with amsgrad (reference model/train.py:27:
    ``optim.AdamW(..., lr=LR, amsgrad=True)``; decoupled weight decay is the
    torch AdamW default 1e-2)."""
    return optax.chain(
        optax.scale_by_amsgrad(),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_learning_rate(cfg.lr),
    )


def polyak(target_params, params, tau: float):
    """target <- tau * online + (1 - tau) * target (reference
    model/train.py:13-14, 20: TAU=0.005 soft update)."""
    return jax.tree.map(
        lambda t, p: t * (1.0 - tau) + p * tau, target_params, params
    )
