"""vmap consistency: batched lockstep step must equal per-env stepping."""

import jax
import jax.numpy as jnp
import numpy as np

from tetris_piclim_tpu import engine


def test_vmapped_step_equals_single_step():
    key = jax.random.PRNGKey(0)
    n = 64
    kb, kp, ka1, ka2 = jax.random.split(key, 4)
    boards = jax.random.uniform(kb, (n, 20, 10)) < 0.3
    boards = boards.at[:, :4].set(False)
    pieces = jax.random.randint(kp, (n, 12), 0, 7, dtype=jnp.int8)
    states = engine.make_state_batch(boards, pieces, 2, 11)

    jstep = jax.jit(engine.step)
    jbatch = jax.jit(engine.step_batch)

    for it in range(6):
        ka1, ka2, k = jax.random.split(ka1, 3)
        rots = jax.random.randint(ka1, (n,), 0, 4)
        locs = jax.random.randint(ka2, (n,), 0, 10)
        batch_res = jbatch(states, rots, locs)
        for i in (0, 7, 31, 63):
            single = jstep(
                jax.tree.map(lambda a: a[i], states), rots[i], locs[i]
            )
            np.testing.assert_array_equal(
                np.asarray(batch_res.state.board[i]), np.asarray(single.state.board)
            )
            assert int(batch_res.state.status[i]) == int(single.state.status)
            assert int(batch_res.state.lines_cleared[i]) == int(single.state.lines_cleared)
        states = batch_res.state


def test_autoreset_swaps_terminal_envs():
    bank_boards = jnp.zeros((4, 20, 10), bool)
    bank_pieces = jnp.tile(jnp.arange(6, dtype=jnp.int8), (4, 1))
    # env that will lose immediately: M=1, no clears possible on empty board
    boards = jnp.zeros((8, 20, 10), bool)
    pieces = jnp.zeros((8, 6), jnp.int8)
    states = engine.make_state_batch(boards, pieces, 5, 1)
    rots = jnp.zeros((8,), jnp.int32)
    locs = jnp.zeros((8,), jnp.int32)
    next_states, res = jax.jit(engine.step_autoreset_batch)(
        states, rots, locs, bank_boards, bank_pieces, jax.random.PRNGKey(0)
    )
    assert bool(res.done.all())  # every env lost (M=1)
    # after auto-reset every env is fresh: running, zero counters, bank pieces
    assert bool((next_states.status == 0).all())
    assert bool((next_states.moves_used == 0).all())
    assert bool((next_states.cursor == 0).all())
    np.testing.assert_array_equal(
        np.asarray(next_states.pieces), np.tile(np.arange(6), (8, 1))
    )


def test_scan_rollout_runs():
    """A jitted lax.scan over the batched auto-reset step — the minimum
    end-to-end slice of SURVEY.md §7."""
    n, steps = 128, 32
    bank_boards = jnp.zeros((16, 20, 10), bool)
    bank_pieces = jnp.broadcast_to(
        jnp.arange(21, dtype=jnp.int8) % 7, (16, 21)
    )
    states = engine.make_state_batch(
        bank_boards[:n % 16 or 16].repeat(n // 16, 0),
        bank_pieces[: n % 16 or 16].repeat(n // 16, 0), 2, 20
    )

    @jax.jit
    def rollout(states, key):
        def body(carry, _):
            states, key = carry
            k1, k2, k3, key = jax.random.split(key, 4)
            rots = jax.random.randint(k1, (n,), 0, 4)
            locs = jax.random.randint(k2, (n,), 0, 10)
            states, res = engine.step_autoreset_batch(
                states, rots, locs, bank_boards, bank_pieces, k3
            )
            return (states, key), (res.done.sum(), res.lines_delta.sum())
        (states, _), (dones, lines) = jax.lax.scan(
            body, (states, key), None, length=steps
        )
        return states, dones.sum(), lines.sum()

    states, dones, lines = rollout(states, jax.random.PRNGKey(0))
    assert states.board.shape == (n, 20, 10)
    assert int(dones) > 0  # episodes terminated and auto-reset
