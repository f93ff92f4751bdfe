"""Convolutional Q-network variant (extension beyond the reference).

The reference declares only the 5-layer MLP (model/model.py:9-13). The board
half of the observation is spatial, so a small conv torso is the natural
second model family: Conv(3x3) stacks over the 20x10 board, concatenated
with the 17 scalar/one-hot features, then the same factored 14-way head.

Channel counts are kept lane-friendly (multiples of 8/16) so XLA tiles the
convs onto the MXU via implicit GEMM. Drop-in replacement for
``QNetwork`` anywhere an ``apply(params, obs[N, 217])`` is expected
(``DQNTrainer(..., net=ConvQNetwork())`` via the ``net`` attribute or
manual wiring).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..engine import OBS_DIM
from ..models.qnet import (
    ACTION_DIM,
    JOINT_DIM,
    dueling_combine,
    dueling_combine_joint,
)


class ConvQNetwork(nn.Module):
    """Conv torso over the 20x10 board + MLP over aux features."""

    channels: Sequence[int] = (32, 64)
    hidden: int = 128
    action_dim: int = ACTION_DIM
    dueling: bool = False
    joint: bool = False
    # compute dtype for the torso matmuls (params stay float32). bf16 is
    # MXU-native on TPU: the conv torso + 12800-wide flatten Dense are the
    # FLOP bulk of the flagship recipe, and halving their width roughly
    # doubles matmul throughput. The Q head always computes in float32 —
    # TD-target regression is precision-sensitive where ReLU torsos aren't.
    dtype: Any = jnp.float32
    # "conv": XLA conv_general_dilated on the [B, 20, 10, C] image. The
    # 20x10 spatial dims are tiny against the TPU's (8, 128) tiles, so the
    # conv runs layout-bound at ~10% MXU efficiency (measured,
    # results/bench_decomp_conv_*.json — bf16 doesn't move it).
    # "im2col": extract the 3x3 patches explicitly and fold the 200 board
    # positions into the matmul ROW dimension — [B*200, 9*C] @ [9*C, ch] is
    # a shape the MXU actually tiles. Same math, same receptive field;
    # different param tree (Dense kernels instead of Conv kernels), so
    # checkpoints don't transfer between impls.
    impl: str = "conv"
    # Learner-traffic knobs (round-4 profile: each learner update spends
    # ~190 of its 222us moving the 12817x128 flatten Dense weight and its
    # AdamW m/v state through HBM — the network's FLOPs are a ~33us
    # sideshow). Both shrink the flatten width, cutting that traffic:
    # bottleneck: 1x1 conv to N channels before flatten (learned
    #   projection, full spatial resolution kept; 64 -> 16 cuts W1 4x).
    # pool: max-pool (pool x pool, stride pool) before flatten (loses
    #   spatial precision; cheaper but blunter).
    bottleneck: int = 0
    pool: int = 1

    def _narrow(self, x: jax.Array) -> jax.Array:
        """Shrink the pre-flatten feature map (see bottleneck/pool above).
        Called from the compact __call__, so submodule creation is legal."""
        if self.pool > 1:
            x = nn.max_pool(
                x, (self.pool, self.pool), strides=(self.pool, self.pool)
            )
        if self.bottleneck:
            x = nn.relu(
                nn.Conv(self.bottleneck, (1, 1), dtype=self.dtype)(x)
            )
        return x

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        assert obs.shape[-1] == OBS_DIM
        board = obs[..., :200].reshape(obs.shape[:-1] + (20, 10, 1))
        aux = obs[..., 200:]
        x = board.astype(self.dtype)
        if self.impl == "im2col":
            lead = x.shape[:-3]
            x = x.reshape((-1, 20, 10, x.shape[-1]))
            for ch in self.channels:
                patches = jax.lax.conv_general_dilated_patches(
                    x, filter_shape=(3, 3), window_strides=(1, 1),
                    padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )                                  # [B, 20, 10, 9*C]
                flat = patches.reshape((-1, patches.shape[-1]))  # rows=B*200
                h = nn.relu(nn.Dense(ch, dtype=self.dtype)(flat))
                x = h.reshape((-1, 20, 10, ch))
            x = self._narrow(x)
            x = x.reshape(lead + (-1,))
        else:
            for ch in self.channels:
                x = nn.relu(
                    nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype)(x)
                )
            x = self._narrow(x)
            x = x.reshape(obs.shape[:-1] + (-1,))
        x = jnp.concatenate([x, aux.astype(self.dtype)], axis=-1)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = x.astype(jnp.float32)
        out_dim = JOINT_DIM if self.joint else self.action_dim
        if self.dueling:
            combine = dueling_combine_joint if self.joint else dueling_combine
            return combine(nn.Dense(1)(x), nn.Dense(out_dim)(x))
        return nn.Dense(out_dim)(x)
