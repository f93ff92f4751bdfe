"""On-device forward generator + greedy prover (gen/jax_forward.py).

Contract mirrors the host forward pipeline's (reference
game/tetris_algo_main/): prefill boards respect the height cap, sequences
are true 7-bags, and every config flagged winnable replays its recorded
solution to a WIN through the production engine.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tetris_piclim_tpu.gen import jax_forward
from tetris_piclim_tpu.gen.bank import ConfigBank, FAMILY_FORWARD
from tetris_piclim_tpu.ops import bitboard

N, L, M = 128, 2, 20


def _batch(seed=0, n=N, L=L, M=M, cap=4):
    return jax.jit(
        jax_forward.generate_batch_device,
        static_argnames=("n", "L", "M", "initial_height_max"),
    )(jax.random.PRNGKey(seed), n=n, L=L, M=M, initial_height_max=cap)


def test_prefill_respects_height_cap():
    for cap in (4, 7):
        cols = jax.jit(
            jax_forward.prefill_boards_device,
            static_argnames=("n", "initial_height_max"),
        )(jax.random.PRNGKey(3), n=64, initial_height_max=cap)
        boards = np.asarray(bitboard.unpack_board(cols))
        # stack height = 20 - topmost filled row index, per column
        padded = np.concatenate([boards, np.ones((64, 1, 10), bool)], axis=1)
        height = 20 - np.argmax(padded, axis=1)
        assert height.max() <= cap
        # boards are non-trivial (prefill actually placed pieces)
        assert (np.asarray(cols) != 0).any(axis=1).all()


def test_sequences_are_seven_bags():
    b = _batch(seed=4)
    seqs = np.asarray(b.pieces)
    n_bags = seqs.shape[1] // 7
    for row in seqs[:16]:
        for k in range(n_bags):
            window = row[7 * k : 7 * (k + 1)]
            assert sorted(window.tolist()) == list(range(7))


def test_winners_replay_to_win():
    b = _batch(seed=0)
    win = np.asarray(b.winnable)
    assert win.mean() > 0.5, f"yield collapsed: {win.mean():.2f}"
    idx = jnp.asarray(np.flatnonzero(win))
    states = bitboard.make_state_batch(
        b.boards[idx], b.pieces[idx], L, M
    )
    jstep = jax.jit(bitboard.step)
    for i in range(M):
        res = jstep(
            states,
            b.rotations[idx, i].astype(jnp.int32),
            b.locations[idx, i].astype(jnp.int32),
        )
        frozen = states.status != 0
        states = jax.tree.map(
            lambda a, c: jnp.where(
                frozen.reshape((-1,) + (1,) * (a.ndim - 1)), a, c
            ),
            states, res.state,
        )
    status = np.asarray(states.status)
    assert (status == 1).all(), f"{(status != 1).sum()} winners did not win"
    assert (np.asarray(states.lines_cleared) >= L).all()
    # losers really are unproven, not mislabeled winners: n_moves == 0
    assert (np.asarray(b.n_moves)[~win] == 0).all()


def test_hard_task_yield_nonzero():
    # beam-8 proves ~97% of L=10/M=30 candidates (greedy-1 managed ~35%)
    b = _batch(seed=2, L=10, M=30)
    assert float(np.asarray(b.winnable).mean()) > 0.8


def test_beam_beats_greedy_and_replays():
    """The beam prover's whole point: materially higher yield than greedy on
    the long-horizon task, while every winner still replays to WIN."""
    key = jax.random.PRNGKey(11)
    L, M, n = 10, 30, 96
    run = jax.jit(
        jax_forward.generate_batch_device,
        static_argnames=("n", "L", "M", "initial_height_max", "beam_width"),
    )
    greedy = run(key, n=n, L=L, M=M, initial_height_max=4, beam_width=1)
    beam = run(key, n=n, L=L, M=M, initial_height_max=4, beam_width=8)
    gy = float(np.asarray(greedy.winnable).mean())
    by = float(np.asarray(beam.winnable).mean())
    assert by > gy + 0.2, f"beam {by:.2f} vs greedy {gy:.2f}"

    win = np.asarray(beam.winnable)
    idx = jnp.asarray(np.flatnonzero(win))
    states = bitboard.make_state_batch(beam.boards[idx], beam.pieces[idx], L, M)
    jstep = jax.jit(bitboard.step)
    for i in range(M):
        res = jstep(
            states,
            beam.rotations[idx, i].astype(jnp.int32),
            beam.locations[idx, i].astype(jnp.int32),
        )
        frozen = states.status != 0
        states = jax.tree.map(
            lambda a, c: jnp.where(
                frozen.reshape((-1,) + (1,) * (a.ndim - 1)), a, c
            ),
            states, res.state,
        )
    assert (np.asarray(states.status) == 1).all()
    # solution lengths are recorded and within budget for winners
    n_moves = np.asarray(beam.n_moves)[win]
    assert ((n_moves >= L) & (n_moves <= M)).all()


def test_bank_fill_device_forward_fraction():
    bank = ConfigBank(L, M, capacity=64, seed=0).fill_device(
        forward_fraction=0.25
    )
    fams = bank.family_counts
    assert fams["forward"] >= 8  # target 16, prover yield > 50% at L=2
    assert fams["forward"] + fams["carve"] == 64
    # forward rows look forward-family: height <= cap, not a carved slab
    fwd = bank.subset(FAMILY_FORWARD)
    boards = np.asarray(fwd.boards)
    padded = np.concatenate(
        [boards, np.ones((boards.shape[0], 1, 10), bool)], axis=1
    )
    height = 20 - np.argmax(padded, axis=1)
    assert height.max() <= 4


def test_bank_refresh_device_forward_churns_both_families():
    bank = ConfigBank(L, M, capacity=64, seed=0).fill_device(
        forward_fraction=0.25
    )
    before = bank.row_keys()
    bank.refresh_device(jax.random.PRNGKey(7), forward_fraction=0.25)
    after = bank.row_keys()
    assert bank.family_counts["forward"] >= 8
    # the whole bank turned over (infinite-distribution property)
    assert len(before & after) <= 2


def test_holdout_device_forward_fallback():
    """Hard tasks (L=10/M=30) yield zero HOST forward games, which made the
    round-2 L=10 holdout silently 100% carve-family. The beam-prover device
    fallback must supply forward rows so the holdout is mixed-family."""
    from tetris_piclim_tpu.gen.bank import make_holdout_bank

    bank = make_holdout_bank(
        10, 30, capacity=64,
        forward_seed_budget=0,      # force the host path to yield nothing
        forward_time_budget_s=0.0,
    )
    fams = bank.family_counts
    assert fams["forward"] >= 16, fams   # target 32 (forward_fraction=0.5)
    assert fams["forward"] + fams["carve"] == 64
