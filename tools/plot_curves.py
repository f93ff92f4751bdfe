"""Render learning curves from training logs to results/curves.png."""

from __future__ import annotations

import re
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

PAT = re.compile(
    r"\[\s*(\d+)\] env_steps=(\S+) win_rate=(\S+) loss=(\S+) eps=(\S+) sps=(\S+)"
)


def parse(path):
    steps, wr = [], []
    for line in open(path):
        m = PAT.match(line)
        if m:
            steps.append(float(m.group(2)))
            wr.append(float(m.group(3)))
    return steps, wr


def main(out="results/curves.png"):
    runs = [
        ("results/train_L2M20_joint.log", "L=2 M=20 (joint recipe)", "tab:blue"),
        ("results/train_L5M25_conv_duel_joint.log", "L=5 M=25 (joint recipe)", "tab:red"),
        ("results/train_L10M30_joint.log", "L=10 M=30 (joint recipe)", "tab:purple"),
        ("results/train_L3M20_joint_long.log", "L=3 M=20 (joint recipe)", "tab:orange"),
        ("results/train_L2M20_flagship.log", "L=2 M=20 (reference MLP, 4.1B)", "tab:cyan"),
        ("results/train_L5M25.log", "L=5 M=25 (reference MLP)", "tab:gray"),
    ]
    fig, ax = plt.subplots(figsize=(8, 5))
    for path, label, color in runs:
        try:
            steps, wr = parse(path)
        except FileNotFoundError:
            continue
        if steps:
            ax.plot(steps, wr, label=label, color=color)
    ax.axhline(0.026, ls="--", lw=1, color="gray",
               label="random policy (L=2 M=20)")
    ax.set_xscale("log")
    ax.set_xlabel("environment steps")
    ax.set_ylabel("training win rate")
    ax.set_title("Tetris-piclim DQN on one TPU v5e chip")
    ax.legend(loc="upper left", fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


def main_r2(out="results/curves_r2.png"):
    """Round-2 curves: training win rate under per-chunk device bank refresh
    is itself a generalization number (the policy never repeats a config), so
    these curves are directly comparable to the held-out final evals.

    Colors: validated categorical palette slots 1-4 in fixed order
    (dataviz reference palette, light surface)."""
    palette = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
    runs = [  # fixed slot order: task difficulty ascending
        ("results/train_r2_L2M20.log", "L=2 M=20"),
        ("results/train_r2_L3M20.log", "L=3 M=20"),
        ("results/train_r2_L5M25.log", "L=5 M=25"),
        ("results/train_r2_L10M30.log", "L=10 M=30"),
    ]
    fig, ax = plt.subplots(figsize=(8, 5))
    for (path, label), color in zip(runs, palette):
        try:
            steps, wr = parse(path)
        except FileNotFoundError:
            continue
        if steps:
            ax.plot(steps, wr, label=label, color=color, lw=2)
            ax.annotate(
                f" {label}: {wr[-1]:.2f}",
                (steps[-1], wr[-1]),
                fontsize=8,
                color="#444444",
                va="center",
            )
    ax.set_xscale("log")
    ax.set_xlim(right=ax.get_xlim()[1] * 3)  # room for end labels
    ax.set_xlabel("environment steps")
    ax.set_ylabel("training win rate (ε-greedy, ε→0.05; fresh configs every chunk)")
    ax.set_title("Round-2 DQN runs — infinite config distribution, one TPU v5e chip")
    ax.legend(loc="upper left", fontsize=8)
    ax.grid(alpha=0.25, lw=0.5)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


def main_r3(out="results/curves_r3.png"):
    """Round-3 curves: the device-forward ablation arms. Same fixed
    task->hue slots as the round-2 figure (validated categorical palette,
    color follows the task entity); arms of the same task differ by
    linestyle, so identity is never carried by color alone."""
    SLOT = {"L2": "#2a78d6", "L3": "#eb6834", "L10": "#eda100"}
    runs = [
        ("results/train_r3_L2df50.log", "L=2 df=0.5 beam (500k)", SLOT["L2"], "-"),
        ("results/train_r3_L2M20df.log", "L=2 df=0.25 beam", SLOT["L2"], "--"),
        ("results/train_r3_L2df25bw1.log", "L=2 df=0.25 greedy", SLOT["L2"], ":"),
        ("results/train_r3_L3M20df.log", "L=3 df=0.25 beam", SLOT["L3"], "-"),
        ("results/train_r3_L10M30df.log", "L=10 df=0.25 beam", SLOT["L10"], "-"),
    ]
    fig, ax = plt.subplots(figsize=(8, 5))
    for path, label, color, ls in runs:
        try:
            steps, wr = parse(path)
        except FileNotFoundError:
            continue
        if steps:
            ax.plot(steps, wr, label=label, color=color, lw=2, ls=ls)
            ax.annotate(
                f" {wr[-1]:.2f}",
                (steps[-1], wr[-1]),
                fontsize=8,
                color="#444444",
                va="center",
            )
    ax.set_xscale("log")
    ax.set_xlim(right=ax.get_xlim()[1] * 1.6)
    ax.set_xlabel("environment steps")
    ax.set_ylabel("training win rate (ε-greedy, ε→0.05; fresh configs every chunk)")
    ax.set_title(
        "Round-3 device-forward arms — mixed carve+forward infinite distribution"
    )
    ax.legend(loc="upper left", fontsize=8)
    ax.grid(alpha=0.25, lw=0.5)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


def main_r4(out="results/curves_r4.png"):
    """Round-4 figure. Left: the L=10/M=30 budget ladder as ONE curve —
    the scratch run and its three +500k resumes concatenated at their true
    cumulative env-step offsets (each resume's log restarts at step 0).
    Right: the adaptive-share arms (one default recipe, four tasks). Fixed
    task->hue slots as in the r2/r3 figures."""
    SLOT = {"L2": "#2a78d6", "L3": "#eb6834", "L5": "#3d9970",
            "L10": "#eda100"}
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(13, 5))

    ladder = [
        ("results/train_r3_L10M30df.log", 0.0),
        ("results/train_r3_L10cont.log", 1.024e9),
        ("results/train_r4_L10cont.log", 1.638e9),
        ("results/train_r4_L10cont2.log", 2.662e9),
        ("results/train_r4_L10cont3.log", 3.686e9),
    ]
    xs, ys = [], []
    marks = []
    for path, off in ladder:
        try:
            steps, wr = parse(path)
        except FileNotFoundError:
            continue
        if steps:
            xs.extend(s + off for s in steps)
            ys.extend(wr)
            marks.append(xs[-1] / 1e9)
    ax1.plot([x / 1e9 for x in xs], ys, color=SLOT["L10"], lw=1.5)
    for m in marks[:-1]:
        ax1.axvline(m, color="#bbbbbb", lw=0.8, ls=":")
    # held-out evals at each cutoff (holdout / forward-family)
    evals = [(1.024, 0.535, 0.213), (1.638, 0.626, 0.351),
             (2.662, 0.675, 0.448), (3.686, 0.742, 0.549),
             (4.710, 0.748, 0.561)]
    ax1.scatter([e[0] for e in evals], [e[1] for e in evals],
                color="#444444", zorder=5, s=22, label="held-out (mixed)")
    ax1.scatter([e[0] for e in evals], [e[2] for e in evals],
                color="#444444", zorder=5, s=22, marker="^",
                label="held-out (forward family)")
    ax1.set_xlabel("cumulative environment steps (billions)")
    ax1.set_ylabel("win rate")
    ax1.set_title("L=10/M=30 budget ladder — training curve + resume evals")
    ax1.legend(loc="upper left", fontsize=8)
    ax1.grid(alpha=0.25, lw=0.5)

    arms = [
        ("results/train_r4_L2ad.log", "L=2 adaptive", SLOT["L2"]),
        ("results/train_r4_L3ad.log", "L=3 adaptive", SLOT["L3"]),
        ("results/train_r4_L5ad.log", "L=5 adaptive", SLOT["L5"]),
        ("results/train_r4_L10ad.log", "L=10 adaptive", SLOT["L10"]),
    ]
    for path, label, color in arms:
        try:
            steps, wr = parse(path)
        except FileNotFoundError:
            continue
        if steps:
            ax2.plot(steps, wr, label=label, color=color, lw=1.8)
    ax2.set_xscale("log")
    ax2.set_xlabel("environment steps")
    ax2.set_ylabel("training win rate (ε→0.05, fresh configs every chunk)")
    ax2.set_title("Adaptive forward share — one recipe, four tasks")
    ax2.legend(loc="upper left", fontsize=8)
    ax2.grid(alpha=0.25, lw=0.5)

    for ax in (ax1, ax2):
        for spine in ("top", "right"):
            ax.spines[spine].set_visible(False)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


def main_r5(out="results/curves_r5.png"):
    """Round-5 figure. Left: the L=10/M=30 matched-500k scratch cells —
    the narrow budget ladder (r3/r4, gray, for context), the wide torso
    (--channels 64,128, h8:4), the narrow h8:4 isolation cell, and the two
    demo-augmented arms (TD-bootstrapped = diverged; MC-return + margin).
    The planned wide/demo RESUME arms died with the mid-round checkpoint
    wipe (docs/ROUND5_NOTES.md). Right: the matched-500k adapt-rule-v2
    arms (one recipe, four tasks)."""
    SLOT = {"L2": "#2a78d6", "L3": "#eb6834", "L5": "#3d9970",
            "L10": "#eda100"}
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(13, 5))

    def ladder_xy(stages):
        xs, ys = [], []
        for path, off in stages:
            try:
                steps, wr = parse(path)
            except FileNotFoundError:
                continue
            if steps:
                xs.extend(s + off for s in steps)
                ys.extend(wr)
        return xs, ys

    narrow = ladder_xy([
        ("results/train_r3_L10M30df.log", 0.0),
        ("results/train_r3_L10cont.log", 1.024e9),
        ("results/train_r4_L10cont.log", 1.638e9),
        ("results/train_r4_L10cont2.log", 2.662e9),
        ("results/train_r4_L10cont3.log", 3.686e9),
    ])
    if narrow[0]:
        ax1.plot([x / 1e9 for x in narrow[0]], narrow[1],
                 color="#bbbbbb", lw=1.0, label="narrow ladder (r3/r4, context)")
    scratch_arms = [
        ("results/train_r5_L10wide.log", "wide 64,128 h8:4", SLOT["L10"], "-"),
        ("results/train_r5_L10h84.log", "narrow h8:4 (G1)", "#3d9970", "-"),
        ("results/train_r5_L10demo.log", "TD-demo (diverged)", "#d64545", "--"),
        ("results/train_r5_L10demo2.log", "MC-demo + margin h8:4", "#9b59b6", "-"),
    ]
    demo_ladder = ladder_xy([
        ("results/train_r5_L10demoh4.log", 0.0),
        ("results/train_r5_L10demoh4c.log", 1.024e9),
    ])
    if demo_ladder[0]:
        ax1.plot([x / 1e9 for x in demo_ladder[0]], demo_ladder[1],
                 color="#6c3483", lw=1.4, label="MC-demo + margin h4 (+resume)")
    for path, label, color, ls in scratch_arms:
        try:
            steps, wr = parse(path)
        except FileNotFoundError:
            continue
        if steps:
            ax1.plot([s / 1e9 for s in steps], wr, color=color, lw=1.5,
                     ls=ls, label=label)
    ax1.set_xlabel("cumulative environment steps (billions)")
    ax1.set_ylabel("training win rate (infinite device distribution)")
    ax1.set_title("L=10/M=30 matched-500k scratch: capacity, curriculum, demos")
    ax1.legend(loc="lower right", fontsize=8)
    ax1.grid(alpha=0.3)

    arms = [
        ("results/train_r5_L2adv2.log", "L=2 v2", SLOT["L2"]),
        ("results/train_r5_L3adv2.log", "L=3 v2", SLOT["L3"]),
        ("results/train_r4_L5adv2.log", "L=5 v2 (r4)", SLOT["L5"]),
        ("results/train_r5_L10adv2.log", "L=10 v2", SLOT["L10"]),
    ]
    for path, label, color in arms:
        try:
            steps, wr = parse(path)
        except FileNotFoundError:
            continue
        if steps:
            ax2.plot([s / 1e9 for s in steps], wr, label=label, color=color)
    ax2.set_xlabel("environment steps (billions)")
    ax2.set_title("adapt-rule v2: one recipe, matched 500k, four tasks")
    ax2.legend(loc="lower right", fontsize=8)
    ax2.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "r2":
        main_r2(*sys.argv[2:])
    elif len(sys.argv) > 1 and sys.argv[1] == "r3":
        main_r3(*sys.argv[2:])
    elif len(sys.argv) > 1 and sys.argv[1] == "r4":
        main_r4(*sys.argv[2:])
    elif len(sys.argv) > 1 and sys.argv[1] == "r5":
        main_r5(*sys.argv[2:])
    else:
        main(*sys.argv[1:])
