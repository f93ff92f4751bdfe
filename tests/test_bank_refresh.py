"""Async bank refresh: both reference producers feed the live bank.

The reference runs TWO warm-reset producers forever — a carving worker and a
forward generate+prove worker (game/tetris.py:473-488). ConfigBank's refresh
must do the same: carve workers plus a forward worker over rotating seed
windows, swapping rows in-place while training reads the device arrays."""

import time

from tetris_piclim_tpu.dqn.train import DQNTrainer
from tetris_piclim_tpu.gen.bank import ConfigBank
from tetris_piclim_tpu.utils.config import EnvConfig, TrainConfig


def test_mixed_fill_families():
    bank = ConfigBank(1, 8, capacity=16, seed=0).fill(carve_fraction=0.75)
    fc = bank.family_counts
    assert fc["carve"] == 12
    assert fc["forward"] == 4


def test_trainer_default_bank_is_mixed():
    cfg = TrainConfig(
        env=EnvConfig(L=1, M=8),
        num_envs=8, bank_capacity=16, replay_capacity=256,
        warmup_steps=4, total_steps=4, log_every=4, seed=0,
    )
    trainer = DQNTrainer(cfg)
    fc = trainer.bank.family_counts
    assert fc["forward"] > 0 and fc["carve"] > 0


def test_refresh_includes_forward_family():
    """Rows written by the async refresh must include forward-family configs
    (round-1 regression: start_refresh spawned carving workers only, so a
    device-carved bank stayed single-family forever)."""
    bank = ConfigBank(1, 8, capacity=32, seed=1).fill_device()
    assert bank.family_counts == {"carve": 32, "forward": 0}
    bank.start_refresh(n_threads=1, batch_per_cycle=4)
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            fc = bank.family_counts
            if fc["forward"] > 0 and bank.refresh_writes > 0:
                break
            time.sleep(0.2)
    finally:
        bank.stop_refresh()
    assert bank.family_counts["forward"] > 0
    assert bank.refresh_writes > 0
    # device arrays were re-uploaded (rebinding) and stay consistent
    assert bank.boards.shape == (32, 20, 10)
    assert bank.pieces.shape == (32, 9)


def test_device_refresh_preserves_forward_rows():
    """refresh_device regenerates carve rows with fresh configs but must not
    touch host-produced forward-family rows."""
    import jax
    import numpy as np

    bank = ConfigBank(1, 8, capacity=16, seed=0).fill(carve_fraction=0.5)
    before = np.array(bank._host_boards)
    fam = bank._family.copy()
    bank.refresh_device(jax.random.PRNGKey(42))
    after = np.array(bank._host_boards)
    fwd = fam == 1
    np.testing.assert_array_equal(after[fwd], before[fwd])
    assert (after[~fwd] != before[~fwd]).any()  # carve rows turned over
    np.testing.assert_array_equal(np.asarray(bank.boards), after)


def test_trainer_device_refresh_loop():
    """The trainer's per-chunk device refresh must run and keep learning."""
    import numpy as np

    cfg = TrainConfig(
        env=EnvConfig(L=1, M=8),
        num_envs=16, bank_capacity=16, replay_capacity=512,
        warmup_steps=8, total_steps=12, log_every=4, seed=0,
    )
    trainer = DQNTrainer(cfg)
    before = np.asarray(trainer.bank.boards).copy()
    out = trainer.train(log_fn=None, device_refresh_every=1)
    assert len(out["history"]) == 3
    assert (np.asarray(trainer.bank.boards) != before).any()


def test_swap_rows_family_targeting():
    """Carve writes must never evict forward rows (the carve producer is
    ~1000x faster and would wash them out — measured 4091/5 at steady
    state); forward writes grow to the share cap then recycle."""
    import numpy as np

    from tetris_piclim_tpu.gen._producers import FAMILY_CARVE, FAMILY_FORWARD

    bank = ConfigBank(
        1, 8, capacity=8, seed=0, forward_share_cap=0.25
    ).fill_device()
    fwd_board = np.zeros((20, 10), bool)
    fwd_board[19, 0] = True
    bank._swap_rows([(fwd_board, [1] * 9)] * 2, FAMILY_FORWARD)
    assert bank.family_counts["forward"] == 2  # cap = 0.25 * 8
    # at the cap: further forward writes recycle forward rows
    bank._swap_rows([(fwd_board, [1] * 9)] * 2, FAMILY_FORWARD)
    assert bank.family_counts["forward"] == 2
    # carve writes target carve rows only
    marked = bank._family.copy()
    carve_board = np.zeros((20, 10), bool)
    carve_board[19, 1] = True
    for _ in range(5):
        bank._swap_rows([(carve_board, [2] * 9)] * 4, FAMILY_CARVE)
    assert bank.family_counts["forward"] == 2
    fwd_idx = np.flatnonzero(marked == FAMILY_FORWARD)
    assert (bank._host_pieces[fwd_idx] == 1).all()  # untouched by carve


def test_dead_producer_is_restarted():
    """Failure detection (reference gap, SURVEY.md §5.3): a producer process
    that dies must be restarted by the consumer."""
    bank = ConfigBank(1, 8, capacity=16, seed=3).fill_device()
    bank.start_refresh(n_threads=1, batch_per_cycle=4, forward=False)
    try:
        deadline = time.time() + 30
        while time.time() < deadline and not bank._procs[0].is_alive():
            time.sleep(0.1)
        victim = bank._procs[0]
        victim.terminate()
        victim.join(timeout=10)
        deadline = time.time() + 60
        while time.time() < deadline:
            p = bank._procs[0]
            if p.pid != victim.pid and p.is_alive():
                break
            time.sleep(0.2)
        assert bank._procs[0].pid != victim.pid, "producer never restarted"
        assert bank._restarts >= 1
    finally:
        bank.stop_refresh()
    assert not any(p.is_alive() for p in getattr(bank, "_procs", []))


def test_refresh_rows_stay_winnable_shape():
    """Forward rows are padded/truncated to M+1 like carver rows."""
    bank = ConfigBank(2, 10, capacity=8, seed=2).fill(carve_fraction=0.5)
    assert bank._host_pieces.shape == (8, 11)
    assert (bank._host_pieces >= 0).all() and (bank._host_pieces < 7).all()


def test_fwd_chunk_sizing():
    """Small banks prove a right-sized power-of-two chunk, not the full
    1024-candidate fixed batch (ADVICE r2: capacity-256 tests paid 4x+
    extra prove work); large banks stay capped for compile-size safety."""
    from tetris_piclim_tpu.gen.bank import _FWD_CHUNK, _fwd_chunk_for

    assert _fwd_chunk_for(1) == 1
    assert _fwd_chunk_for(3) == 4
    assert _fwd_chunk_for(192) == 256
    assert _fwd_chunk_for(1024) == _FWD_CHUNK
    assert _fwd_chunk_for(50_000) == _FWD_CHUNK
