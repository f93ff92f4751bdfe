"""CLI subcommands (in-process) + metrics/profiling utilities."""

import json

import numpy as np

from tetris_piclim_tpu.cli import main as cli_main
from tetris_piclim_tpu.utils.metrics import MetricsLogger
from tetris_piclim_tpu.utils.profiling import SectionTimer


def test_cli_play_solution(capsys):
    rc = cli_main(["play", "-L", "2", "-M", "10", "--policy", "solution",
                   "--seed", "3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["result"] == "win"
    assert out["lines_cleared"] >= 2


def test_cli_generate_carve(capsys):
    rc = cli_main(["generate", "--family", "carve", "-L", "1", "-M", "8",
                   "--count", "5"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["generated"] == 5


def test_cli_generate_forward(capsys):
    rc = cli_main(["generate", "--family", "forward", "-L", "1", "-M", "10",
                   "--seed-end", "10"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["attempted"] == 10
    assert 0 < out["winnable"] <= 10


def test_cli_train_smoke(capsys, tmp_path):
    rc = cli_main([
        "train", "--smoke", "--eval-episodes", "64",
        "--checkpoint", str(tmp_path / "ck"),
        "--log-file", str(tmp_path / "m.jsonl"),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["train_bank"]["unfinished"] == 0.0
    assert (tmp_path / "m.jsonl").exists()


def test_cli_config_merges_cli_overrides(tmp_path, monkeypatch):
    """--config must not silently discard explicitly-passed CLI flags
    (regression: '--config x.json --no-double' used to train double DQN)."""
    import pytest

    import tetris_piclim_tpu.dqn.train as train_mod
    from tetris_piclim_tpu.utils.config import TrainConfig

    captured = {}

    class FakeTrainer:
        def __init__(self, cfg, bank=None, backend="bitboard", net=None):
            captured["cfg"] = cfg
            raise RuntimeError("stop after config capture")

    monkeypatch.setattr(train_mod, "DQNTrainer", FakeTrainer)
    cfg_file = tmp_path / "cfg.json"
    cfg_file.write_text(TrainConfig(total_steps=123, num_envs=64).to_json())
    with pytest.raises(RuntimeError, match="stop after"):
        cli_main([
            "train", "--config", str(cfg_file),
            "--no-double", "--num-envs", "32",
        ])
    cfg = captured["cfg"]
    assert cfg.total_steps == 123           # JSON value kept
    assert cfg.dqn.double_dqn is False      # CLI override survives
    assert cfg.num_envs == 32               # CLI override beats JSON


def test_metrics_logger(tmp_path):
    path = tmp_path / "log.jsonl"
    with MetricsLogger(path=str(path), echo=False) as log:
        log.log({"a": 1})
        log.log({"a": 2, "b": "x"})
    rows = [json.loads(l) for l in path.read_text().splitlines()]
    assert [r["a"] for r in rows] == [1, 2]
    assert all("t" in r for r in rows)


def test_section_timer():
    timer = SectionTimer()
    with timer.section("gen"):
        np.zeros(10)
    with timer.section("gen"):
        np.zeros(10)
    s = timer.summary()
    assert s["gen"]["count"] == 2
    assert s["gen"]["total_s"] >= 0


def test_device_trace_writes_artifacts(tmp_path):
    import jax
    import jax.numpy as jnp
    from tetris_piclim_tpu.utils.profiling import device_trace

    logdir = tmp_path / "trace"
    with device_trace(str(logdir)):
        x = jax.jit(lambda a: a * 2)(jnp.arange(16.0))
        jax.block_until_ready(x)
    files = list(logdir.rglob("*"))
    assert files, "no profiler artifacts written"
