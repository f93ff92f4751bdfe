"""Actor + learner math for the DQN (all jittable, batch-first).

Implements the algorithm the reference's constants/comments specify
(model/train.py:8-21): epsilon-greedy with exponential decay, replay-sampled
TD updates with a Polyak-averaged target network, AdamW(amsgrad).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.qnet import NUM_COL, NUM_ROT, q_ops
from ..utils.config import DQNConfig
from . import replay as replay_lib
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
    """Vmapped epsilon-greedy over the (rotation, column) action space.
    Works with either head — the additive factored 14-way or the joint
    40-way — dispatched on the Q output width (static under jit)."""
    n = obs.shape[0]
    k_expl, k_rot, k_col = jax.random.split(key, 3)
    q = apply_fn(params, obs)
    g_rot, g_col = q_ops(q.shape[-1]).greedy(q)
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
    ops = q_ops(q.shape[-1])
    q_chosen = ops.gather(q, batch.rot, batch.col)

    q_next_target = apply_fn(target_params, batch.next_obs)
    if cfg.double_dqn:
        q_next_online = apply_fn(params, batch.next_obs)
        a_rot, a_col = ops.greedy(q_next_online)
        next_val = ops.gather(q_next_target, a_rot, a_col)
    else:
        next_val = ops.max_value(q_next_target)

    next_val = jax.lax.stop_gradient(next_val)
    # discount is gamma for 1-step batches, gamma^(k*+1) for n-step batches
    # (see replay.replay_sample_ext)
    disc = cfg.gamma if batch.discount is None else batch.discount
    target = batch.reward + disc * (1.0 - batch.done.astype(jnp.float32)) * next_val
    td = q_chosen - target
    per_sample = optax.losses.huber_loss(td, delta=cfg.huber_delta)
    if batch.weight is not None:
        per_sample = batch.weight * per_sample
    loss = jnp.mean(per_sample)
    aux = {
        "loss": loss,
        "q_mean": jnp.mean(q_chosen),
        "td_abs": jnp.mean(jnp.abs(td)),
        "td_abs_per_sample": jax.lax.stop_gradient(jnp.abs(td)),
    }
    return loss, aux


class _AmsgradBf16State(NamedTuple):
    count: jax.Array
    mu: dict
    nu: dict
    nu_max: dict


def scale_by_amsgrad_bf16(
    b1: float = 0.9, b2: float = 0.999,
    eps: float = 1e-8, eps_root: float = 0.0,
) -> optax.GradientTransformation:
    """AMSGrad whose moment buffers (mu, nu, nu_max) are STORED in bfloat16.

    The round-4 device trace (results/trace_r4_summary.json) shows the
    learner update memory-bound on ~58MB of HBM traffic dominated by the
    flatten-Dense weight's optimizer state; bf16 moments halve the three
    largest buffers with no model/architecture change. Arithmetic is f32
    (moments are up-cast per update, the rounding happens only at the
    store), matching optax.scale_by_amsgrad semantics otherwise."""

    def init_fn(params):
        bf = lambda p: jnp.zeros(p.shape, jnp.bfloat16)
        return _AmsgradBf16State(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(bf, params),
            nu=jax.tree.map(bf, params),
            nu_max=jax.tree.map(bf, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - jnp.power(b1, count.astype(jnp.float32))
        c2 = 1.0 - jnp.power(b2, count.astype(jnp.float32))

        def upd(g, mu, nu, nu_max):
            g = g.astype(jnp.float32)
            mu_f = b1 * mu.astype(jnp.float32) + (1.0 - b1) * g
            nu_f = b2 * nu.astype(jnp.float32) + (1.0 - b2) * g * g
            nu_max_f = jnp.maximum(nu_max.astype(jnp.float32), nu_f)
            out = (mu_f / c1) / (jnp.sqrt(nu_max_f / c2 + eps_root) + eps)
            return (
                out.astype(g.dtype),
                mu_f.astype(jnp.bfloat16),
                nu_f.astype(jnp.bfloat16),
                nu_max_f.astype(jnp.bfloat16),
            )

        outs = jax.tree.map(upd, updates, state.mu, state.nu, state.nu_max)
        is_tup = lambda x: isinstance(x, tuple)
        pick = lambda i: jax.tree.map(
            lambda t: t[i], outs, is_leaf=is_tup
        )
        return pick(0), _AmsgradBf16State(
            count=count, mu=pick(1), nu=pick(2), nu_max=pick(3)
        )

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: DQNConfig) -> optax.GradientTransformation:
    """AdamW with amsgrad (reference model/train.py:27:
    ``optim.AdamW(..., lr=LR, amsgrad=True)``; decoupled weight decay is the
    torch AdamW default 1e-2). ``cfg.opt_state_bf16`` swaps in the
    bf16-moment variant (same math, half the optimizer HBM traffic)."""
    scale = (
        scale_by_amsgrad_bf16()
        if getattr(cfg, "opt_state_bf16", False)
        else optax.scale_by_amsgrad()
    )
    return optax.chain(
        scale,
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_learning_rate(cfg.lr),
    )


def per_beta_schedule(step: jax.Array, cfg: DQNConfig, total_steps: int) -> jax.Array:
    """PER importance-sampling exponent annealed linearly beta0 -> 1 over
    training (Schaul et al. 2016 §3.4 — the IS correction must reach full
    strength by convergence or the update stays permanently biased).
    ``cfg.per_beta_steps`` overrides the horizon; 0 uses ``total_steps``."""
    if not cfg.per_beta_anneal:
        return jnp.float32(cfg.per_beta)
    horizon = cfg.per_beta_steps if cfg.per_beta_steps > 0 else total_steps
    frac = jnp.minimum(step.astype(jnp.float32) / float(max(horizon, 1)), 1.0)
    return cfg.per_beta + (1.0 - cfg.per_beta) * frac


def learner_update(
    params,
    target_params,
    opt_state,
    rpl,
    key: jax.Array,
    *,
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    cfg: DQNConfig,
    step_gap: int,
    beta=None,
    demo_rpl=None,
    demo_n: int = 0,
    demo_margin: float = 0.0,
    demo_margin_weight: float = 1.0,
):
    """One replay-sampled TD update + Polyak target step (jittable).

    The single learner used by both trainers: sample (uniform or PER,
    1-step or n-step per ``cfg``), compute the weighted Huber TD loss,
    apply AdamW(amsgrad), soft-update the target, and — in PER mode —
    write the new |td| priorities back into the buffer.

    ``step_gap`` is the number of transitions written per env step
    (num_envs): the ring stride between consecutive transitions of the
    same env slot.

    ``demo_rpl``/``demo_n``: demonstration-augmented mode — ``demo_n`` of
    the ``cfg.batch_size`` samples come from a separate persistent buffer
    of proven-winning-trajectory transitions (1-step, uniform; see
    DQNTrainer._demo_rollout_impl). Incompatible with PER (priority
    updates index the env buffer only).

    ``demo_margin`` > 0 adds the DQfD large-margin supervised term on the
    demo samples (Hester et al. 2018, eq. 2):
    ``J_E = mean( max_a [Q(s,a) + margin * [a != a_E]] - Q(s, a_E) )``,
    scaled by ``demo_margin_weight`` — pushes the expert (proven-winning)
    action's Q above every alternative by at least the margin, giving the
    demonstrations a gradient even where the TD signal is silent.

    Returns ``(params, target_params, opt_state, rpl, aux)``.
    """
    demo_on = demo_rpl is not None and demo_n > 0
    if demo_on:
        k_env, k_demo = jax.random.split(key)
        n_env = cfg.batch_size - demo_n
    else:
        # demo off: consume the key exactly as before (stream-compatible
        # with pre-demo checkpoints/resumes)
        k_env, k_demo = key, key
        n_env = cfg.batch_size
    batch, idx0 = replay_lib.replay_sample_ext(
        rpl,
        k_env,
        n_env,
        gamma=cfg.gamma,
        n_step=cfg.n_step,
        step_gap=step_gap,
        prioritized=cfg.prioritized,
        alpha=cfg.per_alpha,
        beta=cfg.per_beta if beta is None else beta,
    )
    if demo_on:
        demo_batch, _ = replay_lib.replay_sample_ext(
            demo_rpl, k_demo, demo_n,
            gamma=cfg.gamma, n_step=1, step_gap=1, prioritized=False,
        )
        batch = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), batch, demo_batch
        )
    if demo_on and demo_margin > 0.0:

        def loss_fn(p):
            loss, aux = td_loss(p, target_params, apply_fn, batch, cfg)
            q_d = apply_fn(p, demo_batch.obs)
            ops = q_ops(q_d.shape[-1])
            j_e = jnp.mean(
                ops.margin_max(q_d, demo_batch.rot, demo_batch.col, demo_margin)
                - ops.gather(q_d, demo_batch.rot, demo_batch.col)
            )
            aux = dict(aux, demo_margin_loss=j_e)
            return loss + demo_margin_weight * j_e, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    else:
        (loss, aux), grads = jax.value_and_grad(td_loss, has_aux=True)(
            params, target_params, apply_fn, batch, cfg
        )
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = jax.tree.map(lambda p, u: p + u, params, updates)
    target_params = polyak(target_params, params, cfg.tau)
    if cfg.prioritized:
        rpl = replay_lib.replay_update_priority(
            rpl, idx0, aux["td_abs_per_sample"], cfg.per_eps
        )
    return params, target_params, opt_state, rpl, aux


def polyak(target_params, params, tau: float):
    """target <- tau * online + (1 - tau) * target (reference
    model/train.py:13-14, 20: TAU=0.005 soft update)."""
    return jax.tree.map(
        lambda t, p: t * (1.0 - tau) + p * tau, target_params, params
    )
