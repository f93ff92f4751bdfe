"""Sharded training over a virtual 8-device mesh (multi-chip path on CPU)."""

import sys

import jax
import numpy as np
import pytest

from tetris_piclim_tpu.dqn.train import DQNTrainer
from tetris_piclim_tpu.parallel import make_mesh, shard_bank, shard_train_state
from tetris_piclim_tpu.utils.config import DQNConfig, EnvConfig, TrainConfig


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def _tiny_cfg(n_dev: int) -> TrainConfig:
    return TrainConfig(
        env=EnvConfig(L=1, M=6),
        dqn=DQNConfig(batch_size=32),
        num_envs=8 * n_dev,
        bank_capacity=16,
        replay_capacity=64 * n_dev,
        warmup_steps=1,
        total_steps=4,
        log_every=2,
        seed=0,
    )


def test_sharded_chunk_runs_and_learns(mesh):
    trainer = DQNTrainer(_tiny_cfg(8))
    shard_bank(mesh, trainer.bank)
    trainer.state = shard_train_state(mesh, trainer.state)

    ts, metrics = trainer._chunk(
        trainer.state, trainer._bank_boards(), trainer.bank.pieces, n_steps=4
    )
    jax.block_until_ready(ts.params)
    assert int(ts.updates_done) == 4  # learner path ran (grad all-reduce)
    assert int(ts.global_step) == 4
    # env states remain sharded over the mesh
    env_leaf = jax.tree.leaves(ts.env)[0]
    assert len(env_leaf.sharding.device_set) == 8


def test_sharded_equals_single_device_numerics(mesh):
    """The sharded chunk must compute the same result as unsharded (GSPMD
    partitioning is numerics-preserving for this program)."""
    t1 = DQNTrainer(_tiny_cfg(8))
    t2 = DQNTrainer(_tiny_cfg(8))
    t2.state = shard_train_state(mesh, t2.state)

    ts1, m1 = t1._chunk(
        t1.state, t1._bank_boards(), t1.bank.pieces, n_steps=3
    )
    ts2, m2 = t2._chunk(
        t2.state, t2._bank_boards(), t2.bank.pieces, n_steps=3
    )
    np.testing.assert_allclose(
        np.asarray(m1.reward), np.asarray(m2.reward), rtol=1e-5
    )
    assert int(m1.episodes) == int(m2.episodes)
    p1 = jax.tree.leaves(ts1.params)[0]
    p2 = jax.tree.leaves(ts2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_sharded_episode_boundary(mesh):
    """Envs must terminate AND auto-reset from the bank while sharded —
    the one place GSPMD could insert a surprise collective (the
    replicated-bank -> sharded-env gather)."""
    cfg = TrainConfig(
        env=EnvConfig(L=1, M=2),  # every env terminates within 2 moves
        dqn=DQNConfig(batch_size=32),
        num_envs=32,
        bank_capacity=16,
        replay_capacity=512,
        warmup_steps=1,
        total_steps=6,
        log_every=6,
        seed=0,
    )
    trainer = DQNTrainer(cfg)
    shard_bank(mesh, trainer.bank)
    trainer.state = shard_train_state(mesh, trainer.state)
    ts, m = trainer._chunk(
        trainer.state, trainer._bank_boards(), trainer.bank.pieces, n_steps=6
    )
    jax.block_until_ready(ts.params)
    assert int(m.episodes) >= 32  # every env crossed >= 1 episode boundary
    env_leaf = jax.tree.leaves(ts.env)[0]
    assert len(env_leaf.sharding.device_set) == 8  # still sharded after reset


def test_reset_path_has_no_collectives(mesh):
    """The compiled HLO of step+auto-reset over sharded envs with a
    REPLICATED bank must contain zero cross-device collectives: the
    bank-row gather is device-local by construction (parallel/mesh.py
    layout contract)."""
    from tetris_piclim_tpu.ops import bitboard
    from tetris_piclim_tpu.parallel import batch_sharding, replicate

    n, bank_n, P = 64, 16, 9
    key = jax.random.PRNGKey(0)
    boards = jax.random.uniform(key, (bank_n, 20, 10)) < 0.2
    boards = boards.at[:, :10].set(False)
    bank_cols = replicate(mesh, bitboard.pack_board(boards))
    bank_pieces = replicate(
        mesh,
        jax.random.randint(key, (bank_n, P), 0, 7, dtype=jax.numpy.int8),
    )
    row = batch_sharding(mesh)
    idx = jax.numpy.arange(n) % bank_n
    states = bitboard.make_state_batch(bank_cols[idx], bank_pieces[idx], 1, 2)
    states = jax.tree.map(lambda a: jax.device_put(a, row), states)
    rots = jax.device_put(jax.numpy.zeros((n,), jax.numpy.int32), row)
    locs = jax.device_put(jax.numpy.zeros((n,), jax.numpy.int32), row)

    fn = jax.jit(bitboard.step_autoreset_batch)
    hlo = fn.lower(
        states, rots, locs, bank_cols, bank_pieces, replicate(mesh, key)
    ).compile().as_text()
    for op in ("all-reduce", "all-gather", "all-to-all",
               "collective-permute", "reduce-scatter", "ragged-all-to-all"):
        assert op not in hlo, f"unexpected collective on the reset path: {op}"


def test_divisibility_contract(mesh):
    trainer = DQNTrainer(
        TrainConfig(
            env=EnvConfig(L=1, M=6),
            num_envs=12,  # not divisible by 8
            bank_capacity=8,
            replay_capacity=64,
            seed=0,
        )
    )
    with pytest.raises(ValueError, match="divisible"):
        shard_train_state(mesh, trainer.state)


def test_graft_entry_dryrun():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_distributed_helpers_single_process():
    from tetris_piclim_tpu.parallel.distributed import init_distributed, sync_hosts

    info = init_distributed()  # single-process: no-op, just reports
    assert info["process_count"] == 1
    assert info["global_devices"] >= 8
    sync_hosts()  # must not deadlock on a single host


def test_fused_actor_under_shard_map_single_device():
    """The fused Pallas actor is opaque to GSPMD; with a mesh the trainer
    wraps it in jax.shard_map. A 1-device mesh exercises the whole wrapped
    path END TO END in interpret mode (specs, axis_index seed fold, psum
    metrics) at the cost of one shard; the 8-device case is validated by
    lowering (below) — executing 8 interpreter shards takes tens of
    minutes on CPU."""
    import dataclasses

    mesh1 = make_mesh(1)
    cfg = dataclasses.replace(_tiny_cfg(1), actor_fusion=2)
    trainer = DQNTrainer(cfg, mesh=mesh1)
    shard_bank(mesh1, trainer.bank)
    trainer.state = shard_train_state(mesh1, trainer.state)
    ts, metrics = trainer._chunk(
        trainer.state, trainer._bank_boards(), trainer.bank.pieces, n_steps=4
    )
    jax.block_until_ready(ts.params)
    assert int(metrics.episodes) > 0
    assert int(ts.global_step) == 4


def test_fused_actor_shard_map_lowers_on_8_devices(mesh):
    """Trace-time validation of the 8-shard fused program: in_specs/out_specs
    shapes, per-shard tile sizing, psum axis — everything but the (CPU-
    impractical) interpreter execution."""
    import dataclasses

    cfg = dataclasses.replace(_tiny_cfg(8), actor_fusion=2)
    trainer = DQNTrainer(cfg, mesh=mesh)
    shard_bank(mesh, trainer.bank)
    trainer.state = shard_train_state(mesh, trainer.state)
    trainer._chunk.lower(
        trainer.state, trainer._bank_boards(), trainer.bank.pieces, n_steps=4
    )
    # per-shard batch 8 -> minimum tile
    assert trainer._fused_tile == 8


def test_fused_actor_mesh_divisibility_contract():
    import dataclasses

    mesh1 = make_mesh(8)
    cfg = dataclasses.replace(
        _tiny_cfg(8), num_envs=12, actor_fusion=2  # 12 % 8 != 0
    )
    with pytest.raises(ValueError, match="divisible"):
        DQNTrainer(cfg, mesh=mesh1)


@pytest.mark.slow
def test_fused_actor_executes_on_two_devices():
    """EXECUTE (not just lower) the shard_map-wrapped fused actor at n>1
    (VERDICT r3 #5): 2 virtual devices, 16 envs (8 per shard = minimum
    tile), K=1 kernel phases, interpret mode. Partitioning bugs that only
    manifest at execution — per-shard PRNG folding, psum placement — are
    exactly what lowering-only validation (the 8-device test above) cannot
    catch. Kept to 2 shards because each interpreter shard runs serially
    on CPU (tens of minutes at 8 shards)."""
    import dataclasses

    mesh2 = make_mesh(2)
    # bank of ONE config: every env starts identical, so if the per-shard
    # PRNG seed fold (axis_index) were broken the two shards would take
    # identical exploration actions and evolve identical boards
    cfg = dataclasses.replace(
        _tiny_cfg(2), num_envs=16, bank_capacity=1, actor_fusion=1
    )
    trainer = DQNTrainer(cfg, mesh=mesh2)
    assert trainer._fused_tile == 8
    shard_bank(mesh2, trainer.bank)
    trainer.state = shard_train_state(mesh2, trainer.state)

    ts, metrics = trainer._chunk(
        trainer.state, trainer._bank_boards(), trainer.bank.pieces, n_steps=4
    )
    jax.block_until_ready(ts.params)

    # executed, stepped, and psum-reduced metrics are in range
    assert int(ts.global_step) == 4
    episodes = int(metrics.episodes)
    assert 0 <= episodes <= 16 * 4
    assert 0 <= int(metrics.wins) <= episodes

    # env states still sharded over both devices
    env_leaf = jax.tree.leaves(ts.env)[0]
    assert len(env_leaf.sharding.device_set) == 2

    # Per-shard PRNG decorrelation CANNOT be observed through interpret-mode
    # exploration: pltpu.prng_random_bits returns ALL ZEROS in the CPU
    # interpreter (verified directly — any seed gives zeros), so every
    # interpret-mode env "explores" deterministically and shards evolve
    # identically regardless of the seed fold. On hardware the fold is
    # live; here we verify the fold itself delivers distinct per-shard
    # seeds through the same shard_map machinery the trainer uses.
    import jax.numpy as jnp

    def fold(seed):
        return seed + jax.lax.axis_index("dp") * 7919

    seeds = jax.shard_map(
        lambda s: fold(s)[None],
        mesh=mesh2,
        in_specs=jax.sharding.PartitionSpec(),
        out_specs=jax.sharding.PartitionSpec("dp"),
    )(jnp.int32(1234))
    seeds = np.asarray(seeds)
    assert seeds.shape == (2,) and seeds[0] != seeds[1], seeds
