"""MFU of the flagship training recipe (VERDICT r3 #3: ground the ceiling).

Times three compiled programs at the flagship shapes and reports each one's
MFU (utils/mfu.py). FLOP counts come from XLA's cost model of UNLOOPED
single-call programs (actor forward; one learner update), multiplied by the
known trip counts — because XLA's cost_analysis counts a scan body once,
not x trip-count (verified; see utils/mfu.py). Env-step FLOPs are bitwise
ops, ~zero model FLOPs, and are excluded (standard MFU convention: model
FLOPs only).

  chunk    the full jitted training chunk (act + step + auto-reset +
           replay + UPDATES learner updates, scanned SCAN steps);
           model FLOPs = SCAN x (actor_fwd + UPDATES x learner_update)
  actor    the Q-network forward alone at the actor batch (NUM_ENVS)
  learner  SCAN x UPDATES learner updates alone (TD + AdamW + Polyak)
           on a warmed replay — the stage round-3 measured at ~71% of
           per-step cost

Prints one JSON line. Run on the real chip; on CPU the peak table returns
None and MFU fields are null (times/flops still reported).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tetris_piclim_tpu.dqn import agent as agent_lib
from tetris_piclim_tpu.dqn.train import DQNTrainer
from tetris_piclim_tpu.gen.bank import ConfigBank
from tetris_piclim_tpu.models.convnet import ConvQNetwork
from tetris_piclim_tpu.utils import mfu as mfu_lib
from tetris_piclim_tpu.utils.cache import enable_compilation_cache
from tetris_piclim_tpu.utils.config import DQNConfig, EnvConfig, TrainConfig
from tetris_piclim_tpu import engine

enable_compilation_cache()

REPEATS = 3
L, M = 5, 25


def _timed(fn, *args):
    """(best seconds, last output) over REPEATS post-warmup calls."""
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, time.time() - t0)
    return best, out


def measure(num_envs: int = 2048, scan: int = 512, updates: int = 4,
            bf16: bool = False) -> dict:
    NUM_ENVS, SCAN, UPDATES = num_envs, scan, updates
    cfg = TrainConfig(
        env=EnvConfig(L=L, M=M),
        dqn=DQNConfig(),
        num_envs=NUM_ENVS,
        bank_capacity=1024,
        replay_capacity=131072,
        warmup_steps=1000,
        total_steps=SCAN,
        log_every=SCAN,
        updates_per_step=UPDATES,
        seed=0,
    )
    net = ConvQNetwork(
        dueling=True, joint=True,
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )
    bank = ConfigBank(L, M, capacity=1024, seed=0).fill_device()
    tr = DQNTrainer(cfg, bank=bank, net=net)

    out = {
        "bench": "flagship_mfu",
        "num_envs": NUM_ENVS,
        "scan": SCAN,
        "updates": UPDATES,
        "dtype": "bf16" if bf16 else "f32",
        "backend": jax.default_backend(),
        "flop_accounting": (
            "XLA cost_analysis of unlooped programs x known trip counts; "
            "model FLOPs only (env bitwise step excluded)"
        ),
    }

    # -- FLOP sources (unlooped programs) -------------------------------------
    obs = jnp.zeros((NUM_ENVS, engine.OBS_DIM), jnp.float32)
    fwd = jax.jit(tr.apply_fn).lower(tr.state.params, obs).compile()
    f_act = mfu_lib.compiled_flops(fwd)  # actor forward, full env batch

    # -- full training chunk: time, then MFU from composed FLOPs --------------
    chunk = tr._chunk.lower(
        tr.state, tr._bank_boards(), tr.bank.pieces, n_steps=SCAN
    ).compile()

    def run_chunk(ts):
        ts, m = chunk(ts, tr._bank_boards(), tr.bank.pieces)
        return ts

    t_chunk, warm_state = _timed(run_chunk, tr.state)
    out["chunk_env_steps_per_s"] = round(NUM_ENVS * SCAN / t_chunk, 1)

    # -- learner: one-update program for FLOPs, scanned program for time ------
    dqn = cfg.dqn
    st = warm_state

    def one_update(params, target_params, opt_state, rpl, key):
        params, target_params, opt_state, rpl, _ = agent_lib.learner_update(
            params, target_params, opt_state, rpl, key,
            apply_fn=tr.apply_fn, optimizer=tr.optimizer, cfg=dqn,
            step_gap=NUM_ENVS, beta=jnp.float32(1.0),
        )
        return params, target_params, opt_state, rpl

    upd1 = jax.jit(one_update).lower(
        st.params, st.target_params, st.opt_state, st.replay, st.key
    ).compile()
    f_upd = mfu_lib.compiled_flops(upd1)

    def learn_many(params, target_params, opt_state, rpl, key):
        def body(carry, i):
            params, target_params, opt_state, rpl = carry
            k = jax.random.fold_in(key, i)
            params, target_params, opt_state, rpl, _ = (
                agent_lib.learner_update(
                    params, target_params, opt_state, rpl, k,
                    apply_fn=tr.apply_fn, optimizer=tr.optimizer, cfg=dqn,
                    step_gap=NUM_ENVS, beta=jnp.float32(1.0),
                )
            )
            return (params, target_params, opt_state, rpl), None

        carry = (params, target_params, opt_state, rpl)
        carry, _ = jax.lax.scan(
            body, carry, jnp.arange(SCAN * UPDATES, dtype=jnp.int32)
        )
        return carry[0]

    learner = jax.jit(learn_many).lower(
        st.params, st.target_params, st.opt_state, st.replay, st.key
    ).compile()

    def run_learner():
        return learner(
            st.params, st.target_params, st.opt_state, st.replay, st.key
        )

    t_learn, _ = _timed(run_learner)

    # -- actor timing ----------------------------------------------------------
    # A single eager dispatch over the remote tunnel measures ~ms of DISPATCH
    # latency, not device compute (the r4 artifact's actor_mfu=0.0036 read
    # wrong in isolation — VERDICT r4 #5). Time a SCANNED actor program in
    # ONE dispatch and divide by the trip count: per-call device time with
    # the dispatch amortized. The per-iteration obs perturbation stops XLA
    # hoisting the loop-invariant forward out of the scan.
    def fwd_many(params, obs):
        def body(acc, i):
            o = obs * (1.0 + 1e-6 * i.astype(jnp.float32))
            q = tr.apply_fn(params, o)
            return acc + q.sum(), None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(SCAN, dtype=jnp.int32)
        )
        return acc

    fwd_scanned = jax.jit(fwd_many).lower(tr.state.params, obs).compile()
    t_fwd_total, _ = _timed(fwd_scanned, tr.state.params, obs)
    t_fwd = t_fwd_total / SCAN

    # -- compose ---------------------------------------------------------------
    out["actor_forward_us"] = round(t_fwd * 1e6, 1)
    out["actor_timing"] = (
        f"scanned x{SCAN} in one dispatch / {SCAN} — device time, "
        "dispatch amortized (a single eager dispatch over the remote "
        "tunnel measures ~ms of RPC latency instead)"
    )
    out["actor_gflops_per_call"] = (
        None if f_act is None else round(f_act / 1e9, 4)
    )
    m = None if f_act is None else mfu_lib.mfu_from_flops(f_act, t_fwd)
    out["actor_mfu"] = None if m is None else round(m["mfu"], 4)

    out["learner_s_per_chunk_equiv"] = round(t_learn, 4)
    out["learner_share_of_chunk"] = round(t_learn / t_chunk, 3)
    out["learner_gflops_per_update"] = (
        None if f_upd is None else round(f_upd / 1e9, 4)
    )
    m = (
        None if f_upd is None
        else mfu_lib.mfu_from_flops(SCAN * UPDATES * f_upd, t_learn)
    )
    out["learner_mfu"] = None if m is None else round(m["mfu"], 4)

    if f_act is not None and f_upd is not None:
        chunk_flops = SCAN * (f_act + UPDATES * f_upd)
        out["chunk_tflops"] = round(chunk_flops / 1e12, 3)
        m = mfu_lib.mfu_from_flops(chunk_flops, t_chunk)
        if m is not None:
            out["chunk_mfu"] = round(m["mfu"], 4)
            out["device_kind"] = m["device_kind"]
            out["peak_tflops_bf16"] = m["peak_flops"] / 1e12
        else:
            out["chunk_mfu"] = None
    else:
        out["chunk_mfu"] = None

    out["value"] = out["chunk_mfu"]
    return out


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=2048)
    ap.add_argument("--updates", type=int, default=4)
    ap.add_argument("--scan", type=int, default=512)
    ap.add_argument("--bf16", action="store_true")
    a = ap.parse_args()
    print(json.dumps(
        measure(a.num_envs, a.scan, a.updates, a.bf16)
    ))


if __name__ == "__main__":
    main()
