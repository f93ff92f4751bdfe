"""Q-network for Tetris-piclim DQN.

The reference declares — but never working-implements — a 5-layer MLP
``Model(217, 14)``: Linear 217->128->128->128->128->14 with ReLU (reference:
model/model.py:5-20, instantiated at model/train.py:26; model.py:7 has a
``__init`` typo that makes the class unconstructable). The 217/14 dims are the
only evidence of the intended obs/action encodings; this module defines and
documents them (decide-and-document per SURVEY.md §2.8):

* **obs (217)** — the flattening of the reference ``get_state`` tuple
  (game/tetris.py:435-436): 200 board cells + 7 one-hot current piece +
  7 one-hot next piece + lines-left + moves-left + status. Produced by
  :func:`tetris_piclim_tpu.engine.observe`.
* **actions (14)** — a FACTORED action space: 4 rotation Q-values + 10
  column Q-values (an action is a (rotation, column) hard drop —
  reference game/tetris.py:354). The joint Q is additive,
  ``Q(s, (r, c)) = Q_rot[r] + Q_col[c]`` (action-branching à la
  "Action Branching Architectures for Deep RL", Tavakoli et al. 2018),
  so the 14 declared outputs cover the 40 joint actions and both argmax and
  max decompose per branch — TPU-friendly (no 40-way head needed, though
  ``joint=True`` offers one for ablation).

Matmul shapes are padded-friendly: 217->128 hits the MXU as a single tile;
computation in float32 (the network is tiny; bf16 buys nothing here and
costs reproducibility).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..engine import OBS_DIM

NUM_ROT = 4
NUM_COL = 10
ACTION_DIM = NUM_ROT + NUM_COL  # 14, per reference model/train.py:26
JOINT_DIM = NUM_ROT * NUM_COL   # 40, the non-factored ablation head


def dueling_combine(v: jax.Array, adv: jax.Array) -> jax.Array:
    """Combine a state value ``v[..., 1]`` with branch advantages
    ``adv[..., 14]`` into a factored Q (dueling networks, Wang et al. 2016,
    adapted to the two-branch action space: each branch's advantages are
    mean-centered and the value is split evenly across branches, so the
    joint ``Q(s,(r,c)) = V(s) + Ar(s,r) - mean(Ar) + Ac(s,c) - mean(Ac)``
    and :class:`FactoredQ`'s additive semantics are unchanged)."""
    a_rot, a_col = adv[..., :NUM_ROT], adv[..., NUM_ROT:]
    half_v = v * 0.5
    a_rot = a_rot - jnp.mean(a_rot, axis=-1, keepdims=True) + half_v
    a_col = a_col - jnp.mean(a_col, axis=-1, keepdims=True) + half_v
    return jnp.concatenate([a_rot, a_col], axis=-1)


def dueling_combine_joint(v: jax.Array, adv: jax.Array) -> jax.Array:
    """Standard dueling combine (Wang et al. 2016) for the 40-way joint
    head: ``Q(s,a) = V(s) + A(s,a) - mean_a A(s,a)``."""
    return v + adv - jnp.mean(adv, axis=-1, keepdims=True)


class QNetwork(nn.Module):
    """MLP 217 -> 4x128 -> action_dim (reference model/model.py:9-13).

    ``dueling=True`` replaces the flat head with a value head + centered
    advantage head (extension beyond the reference; default off keeps the
    declared architecture literal)."""

    hidden: Sequence[int] = (128, 128, 128, 128)
    action_dim: int = ACTION_DIM
    dueling: bool = False
    joint: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for width in self.hidden:
            x = nn.relu(nn.Dense(width)(x))
        out_dim = JOINT_DIM if self.joint else self.action_dim
        if self.dueling:
            combine = dueling_combine_joint if self.joint else dueling_combine
            return combine(nn.Dense(1)(x), nn.Dense(out_dim)(x))
        return nn.Dense(out_dim)(x)


class FactoredQ:
    """Helpers for the additive factored Q over (rotation, column)."""

    @staticmethod
    def split(q: jax.Array) -> tuple[jax.Array, jax.Array]:
        return q[..., :NUM_ROT], q[..., NUM_ROT:]

    @staticmethod
    def greedy(q: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Joint argmax decomposes per branch for an additive Q."""
        q_rot, q_col = FactoredQ.split(q)
        return jnp.argmax(q_rot, axis=-1), jnp.argmax(q_col, axis=-1)

    @staticmethod
    def max_value(q: jax.Array) -> jax.Array:
        q_rot, q_col = FactoredQ.split(q)
        return jnp.max(q_rot, axis=-1) + jnp.max(q_col, axis=-1)

    @staticmethod
    def gather(q: jax.Array, rot: jax.Array, col: jax.Array) -> jax.Array:
        q_rot, q_col = FactoredQ.split(q)
        return (
            jnp.take_along_axis(q_rot, rot[..., None], axis=-1)[..., 0]
            + jnp.take_along_axis(q_col, col[..., None], axis=-1)[..., 0]
        )

    @staticmethod
    def margin_max(
        q: jax.Array, rot: jax.Array, col: jax.Array, margin: float
    ) -> jax.Array:
        """max over all 40 joint actions of ``Q(a) + margin * [a != a_E]``
        — the inner max of the DQfD large-margin term (Hester et al. 2018,
        eq. 2) with the additive Q expanded to the 4x10 joint grid."""
        q_rot, q_col = FactoredQ.split(q)
        joint = q_rot[..., :, None] + q_col[..., None, :]
        is_e = (
            jax.nn.one_hot(rot, NUM_ROT, dtype=q.dtype)[..., :, None]
            * jax.nn.one_hot(col, NUM_COL, dtype=q.dtype)[..., None, :]
        )
        aug = joint + margin * (1.0 - is_e)
        return jnp.max(aug, axis=(-2, -1))


class JointQ:
    """Helpers for the 40-way joint Q over (rotation, column), row-major
    ``a = rot * NUM_COL + col``. Same interface as :class:`FactoredQ`; the
    joint head can represent rotation-column interactions the additive
    factorization cannot (at 40 outputs instead of 14)."""

    @staticmethod
    def greedy(q: jax.Array) -> tuple[jax.Array, jax.Array]:
        flat = jnp.argmax(q, axis=-1)
        return flat // NUM_COL, flat % NUM_COL

    @staticmethod
    def max_value(q: jax.Array) -> jax.Array:
        return jnp.max(q, axis=-1)

    @staticmethod
    def gather(q: jax.Array, rot: jax.Array, col: jax.Array) -> jax.Array:
        a = rot * NUM_COL + col
        return jnp.take_along_axis(q, a[..., None], axis=-1)[..., 0]

    @staticmethod
    def margin_max(
        q: jax.Array, rot: jax.Array, col: jax.Array, margin: float
    ) -> jax.Array:
        """max over all 40 actions of ``Q(a) + margin * [a != a_E]`` (the
        inner max of the DQfD large-margin term, Hester et al. 2018 eq. 2)."""
        a = rot * NUM_COL + col
        is_e = jax.nn.one_hot(a, JOINT_DIM, dtype=q.dtype)
        return jnp.max(q + margin * (1.0 - is_e), axis=-1)


def q_ops(q_dim: int):
    """Dispatch the Q-helper class on the (static) head width: 14 ->
    additive factored, 40 -> joint. Shapes are static under jit, so this
    costs nothing at runtime and needs no config threading."""
    if q_dim == ACTION_DIM:
        return FactoredQ
    if q_dim == JOINT_DIM:
        return JointQ
    raise ValueError(f"unrecognized Q head width {q_dim} (expected 14 or 40)")


def init_qnet(key: jax.Array, action_dim: int = ACTION_DIM):
    net = QNetwork(action_dim=action_dim)
    params = net.init(key, jnp.zeros((1, OBS_DIM), jnp.float32))
    return net, params
