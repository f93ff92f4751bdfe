"""Adaptive forward share + graduated-height curriculum (round 4).

The reference hardcodes its generator mix (two fixed producer processes,
tetris.py:473-488) and its forward prefill cap (initial_height_max=4,
tetris_algo_main/main.py:38). The TPU build turns both into runtime
controllers; these tests pin the controller math and the end-to-end wiring.
"""

import numpy as np
import pytest

from tetris_piclim_tpu.cli import _parse_height
from tetris_piclim_tpu.dqn.train import adapt_share, height_at


class TestParseHeight:
    def test_fixed(self):
        assert _parse_height("4") == (4, 4)
        assert _parse_height("8") == (8, 8)

    def test_anneal(self):
        assert _parse_height("8:4") == (8, 4)

    def test_bad(self):
        with pytest.raises(ValueError):
            _parse_height("8:4:2")


class TestHeightSchedule:
    def test_none_is_reference_default(self):
        # tetris_algo_main/main.py:38 — canonical cap is 4
        assert height_at(None, 0, 100) == 4
        assert height_at(None, 100, 100) == 4

    def test_linear_anneal(self):
        hs = [height_at((8, 4), s, 100) for s in (0, 25, 50, 75, 100)]
        assert hs == [8, 7, 6, 5, 4]

    def test_constant(self):
        assert all(height_at((4, 4), s, 100) == 4 for s in range(0, 101, 10))

    def test_monotone_nonincreasing(self):
        hs = [height_at((8, 4), s, 1000) for s in range(0, 1001, 10)]
        assert all(a >= b for a, b in zip(hs, hs[1:]))


class TestAdaptShare:
    def test_weak_forward_raises_share(self):
        # forward failing, carve mastered -> share moves toward forward
        s = 0.5
        for _ in range(10):
            s = adapt_share(s, win_carve=0.95, win_forward=0.10)
        assert s > 0.8

    def test_weak_carve_lowers_share(self):
        s = 0.5
        for _ in range(10):
            s = adapt_share(s, win_carve=0.10, win_forward=0.95)
        assert s < 0.2

    def test_balanced_stays_half(self):
        s = adapt_share(0.5, win_carve=0.6, win_forward=0.6)
        assert abs(s - 0.5) < 1e-9

    def test_clipped(self):
        assert adapt_share(1.0, 1.0, 0.0) <= 0.9
        assert adapt_share(0.0, 0.0, 1.0) >= 0.1

    def test_both_saturated_keeps_both_sampled(self):
        # the +0.05 floor: even at 100%/100% the target is 0.5, not NaN
        s = adapt_share(0.5, 1.0, 1.0)
        assert abs(s - 0.5) < 1e-9

    def test_ema_smoothing(self):
        # one step moves at most halfway to the target
        s = adapt_share(0.5, win_carve=1.0, win_forward=0.0)
        target = 1.05 / 1.10
        assert abs(s - (0.5 * 0.5 + 0.5 * target)) < 1e-9


@pytest.mark.slow
class TestTrainerIntegration:
    def test_adaptive_run_logs_share_and_probes(self):
        """A tiny end-to-end adaptive run: shares logged, probes measured,
        bank refreshed with the annealed height (smoke; CPU)."""
        from tetris_piclim_tpu.dqn.train import DQNTrainer
        from tetris_piclim_tpu.gen.bank import ConfigBank
        from tetris_piclim_tpu.utils.config import (
            DQNConfig, EnvConfig, TrainConfig,
        )

        cfg = TrainConfig(
            env=EnvConfig(L=1, M=8),
            dqn=DQNConfig(),
            num_envs=32, bank_capacity=64, replay_capacity=4096,
            warmup_steps=64, total_steps=300, log_every=100, seed=3,
        )
        bank = ConfigBank(1, 8, capacity=64, seed=3).fill_device(
            forward_fraction=0.5
        )
        tr = DQNTrainer(cfg, bank=bank)
        out = tr.train(
            log_fn=None,
            device_refresh_every=1,
            device_forward_fraction=0.5,
            adaptive_share=True,
            adapt_every=2,
            adapt_episodes=64,
            device_height=(8, 4),
        )
        hist = out["history"]
        assert all("forward_share" in row for row in hist)
        probed = [r for r in hist if "probe_carve" in r]
        assert probed, "controller never ran a probe evaluation"
        for r in probed:
            assert 0.0 <= r["probe_carve"] <= 1.0
            assert 0.0 <= r["probe_forward"] <= 1.0
            assert 0.1 <= r["forward_share"] <= 0.9


class TestBeamDedupValidity:
    def test_dedup_ignores_invalid_slots(self):
        """The beam prover must not let a dead/invalid slot suppress the
        only valid copy of a successor (ADVICE r3: hashes were compared
        before validity). Proxy check at the batch level: beam-2 yield on
        a candidate batch is >= greedy yield (a completeness regression
        from bad dedup would show up here first)."""
        import jax

        from tetris_piclim_tpu.gen.jax_forward import generate_batch_device

        key = jax.random.PRNGKey(11)
        g1 = generate_batch_device(key, n=64, L=2, M=12, beam_width=1)
        g2 = generate_batch_device(key, n=64, L=2, M=12, beam_width=2)
        w1 = int(np.asarray(g1.winnable).sum())
        w2 = int(np.asarray(g2.winnable).sum())
        assert w2 >= w1


class TestDeviceRowsPoolClamp:
    def test_pool_smaller_than_n_fwd(self, monkeypatch):
        """Regression (round-4 stage B2 crash): with ~100% prover yield and
        n_fwd just over a chunk multiple, the early-stop leaves the
        candidate pool SMALLER than n_fwd (have >= n_fwd - slack, pool <
        n_fwd) and the device assembly must clamp to the pool instead of
        shape-mismatching."""
        import jax

        from tetris_piclim_tpu.gen import bank as bank_mod

        monkeypatch.setattr(bank_mod, "_FWD_CHUNK", 128)
        b = bank_mod.ConfigBank(1, 6, capacity=260, seed=5)
        boards, pieces, n_got = b._device_rows_on_device(
            jax.random.PRNGKey(0), forward_fraction=0.5,
            initial_height_max=4, oversample=3, beam_width=8,
        )
        # n_fwd = 130 > chunk 128; at ~100% yield the loop breaks after one
        # chunk (have >= 130 - 2) with a 128-candidate pool
        assert boards.shape == (260, 20, 10)
        assert pieces.shape[0] == 260
        assert 0 < n_got <= 130


class TestAdaptShareV2:
    def test_raises_only_on_absolute_weakness(self):
        from tetris_piclim_tpu.dqn.train import adapt_share_v2

        # forward < half of carve -> failure-proportional raise
        assert adapt_share_v2(0.25, 0.55, 0.15) > 0.3
        # forward healthy -> decays to the 0.25 prior
        s = 0.6
        for _ in range(10):
            s = adapt_share_v2(s, 0.9, 0.8)
        assert abs(s - 0.25) < 0.01
        # clipping still applies
        assert adapt_share_v2(1.0, 1.0, 0.0) <= 0.9
