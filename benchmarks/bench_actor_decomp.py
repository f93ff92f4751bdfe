"""Where does training throughput go? Decomposition of the fused chunk.

VERDICT #4 asked either for >= 20M env-steps/s with the learner on, or a
written measurement showing what dominates. This measures, on one chip,
cumulative variants of the same 4096-env lockstep loop:

  env        random actions -> step+auto-reset            (no net, no replay)
  act        Q forward + eps-greedy -> step+auto-reset    (the actor)
  act+rpl    ... + replay ring writes
  full-u1    ... + 1 learner update/step (TD + AdamW + Polyak)
  full-u4    ... + 4 learner updates/step (the joint-recipe setting)

Each is one jitted lax.scan of SCAN steps; best of REPEATS. Prints one JSON
line with all variants + derived costs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tetris_piclim_tpu.dqn.train import DQNTrainer
from tetris_piclim_tpu.gen.bank import ConfigBank
from tetris_piclim_tpu.utils.config import DQNConfig, EnvConfig, TrainConfig
from tetris_piclim_tpu.ops import bitboard
from tetris_piclim_tpu.dqn import agent as agent_lib
from tetris_piclim_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import argparse

_ap = argparse.ArgumentParser()
_ap.add_argument("--model", choices=["mlp", "conv"], default="mlp")
_ap.add_argument("--dueling", action="store_true")
_ap.add_argument("--joint", action="store_true")
_ap.add_argument("--bf16", action="store_true")
_ap.add_argument("--impl", choices=["conv", "im2col"], default="conv")
_ap.add_argument("--num-envs", type=int, default=4096)
_ap.add_argument("--batch", type=int, default=128)
_ap.add_argument("--updates", type=int, nargs="*", default=[1, 4],
                 help="updates-per-step variants to time")
_ARGS = _ap.parse_args()

NUM_ENVS = _ARGS.num_envs
SCAN = 512
REPEATS = 3
L, M = 2, 20


def _net():
    """Same construction as cli._build_net, so the bench measures the
    recipe the trainer actually runs."""
    if _ARGS.model == "conv":
        from tetris_piclim_tpu.models.convnet import ConvQNetwork

        return ConvQNetwork(
            dueling=_ARGS.dueling, joint=_ARGS.joint,
            dtype=jnp.bfloat16 if _ARGS.bf16 else jnp.float32,
            impl=_ARGS.impl,
        )
    if _ARGS.dueling or _ARGS.joint:
        from tetris_piclim_tpu.models.qnet import QNetwork

        return QNetwork(dueling=_ARGS.dueling, joint=_ARGS.joint)
    return None


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, time.time() - t0)
    return NUM_ENVS * SCAN / best


def main() -> None:
    bank = ConfigBank(L, M, capacity=1024, seed=0).fill_device()
    bank_cols = bitboard.pack_board(bank.boards)
    idx = jnp.arange(NUM_ENVS) % bank.capacity
    states = bitboard.make_state_batch(bank_cols[idx], bank.pieces[idx], L, M)

    def mk_cfg(updates):
        return TrainConfig(
            env=EnvConfig(L=L, M=M),
            dqn=DQNConfig(batch_size=_ARGS.batch),
            num_envs=NUM_ENVS, bank_capacity=bank.capacity,
            replay_capacity=262144, warmup_steps=1,
            updates_per_step=updates, seed=0,
        )

    trainer = DQNTrainer(mk_cfg(1), bank=bank, net=_net())
    params = trainer.state.params
    apply_fn = trainer.apply_fn

    @jax.jit
    def env_only(states, key):
        def body(carry, _):
            states, key = carry
            k1, k2, k3, key = jax.random.split(key, 4)
            rots = jax.random.randint(k1, (NUM_ENVS,), 0, 4)
            locs = jax.random.randint(k2, (NUM_ENVS,), 0, 10)
            states, _ = bitboard.step_autoreset_batch(
                states, rots, locs, bank_cols, bank.pieces, k3
            )
            return (states, key), None
        (states, key), _ = jax.lax.scan(body, (states, key), None, length=SCAN)
        return states

    @jax.jit
    def actor(params, states, key):
        def body(carry, _):
            states, key = carry
            k1, k2, key = jax.random.split(key, 3)
            obs = bitboard.observe_batch(states)
            rot, col = agent_lib.select_actions(
                apply_fn, params, obs, jnp.float32(0.05), k1
            )
            states, _ = bitboard.step_autoreset_batch(
                states, rot, col, bank_cols, bank.pieces, k2
            )
            return (states, key), None
        (states, key), _ = jax.lax.scan(body, (states, key), None, length=SCAN)
        return states

    key = jax.random.PRNGKey(0)
    res = {"num_envs": NUM_ENVS, "scan": SCAN,
           "backend": jax.default_backend(),
           "model": _ARGS.model, "dueling": _ARGS.dueling,
           "joint": _ARGS.joint, "bf16": _ARGS.bf16, "impl": _ARGS.impl,
           "batch": _ARGS.batch}
    res["env_only"] = round(timed(env_only, states, key), 1)
    res["actor"] = round(timed(actor, params, states, key), 1)

    def full(updates):
        tr = DQNTrainer(mk_cfg(updates), bank=bank, net=_net())
        def run():
            ts, _ = tr._chunk(
                tr.state, tr._bank_boards(), tr.bank.pieces, n_steps=SCAN
            )
            return ts
        return timed(run)

    for u in _ARGS.updates:
        res[f"full_u{u}"] = round(full(u), 1)

    # derived per-step costs (us per env-step consumed by each stage)
    def us(v):
        return round(1e6 / v, 4)
    res["cost_us"] = {
        "env": us(res["env_only"]),
        "net_forward+obs": round(us(res["actor"]) - us(res["env_only"]), 4),
    }
    if "full_u1" in res:
        res["cost_us"]["replay+learn_u1"] = round(
            us(res["full_u1"]) - us(res["actor"]), 4
        )
    if "full_u1" in res and "full_u4" in res:
        res["cost_us"]["extra_3_updates"] = round(
            us(res["full_u4"]) - us(res["full_u1"]), 4
        )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
