"""Device-resident bank of winnable start configurations + async host refresh.

The TPU-native replacement for the reference's warm-reset pipeline
(reference: game/tetris.py:190-214, 445-449, 473-488): instead of two worker
*processes* feeding a bounded ``multiprocessing.Queue`` that ``reset()``
blocks on, the bank keeps B winnable (board, piece-sequence) pairs resident
in device memory; a vectorized auto-reset samples rows from it with zero host
involvement (engine.step_autoreset_batch), and background host threads
continuously regenerate fresh configs and swap them in, double-buffered, off
the hot path.

Producers (mirroring the reference's two workers):
* carving generator (fast, reference game/tetris.py:473-479 equivalent),
* forward generate+prove pipeline (slow but diverse, reference
  game/tetris.py:482-488 equivalent).
"""

from __future__ import annotations

import multiprocessing
import random
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..tables import BOARD_H, BOARD_W
from ._producers import FAMILY_CARVE, FAMILY_FORWARD
from .carver import CarvingGenerator
from .pipeline import generate_batch, translate_batch

# Device-forward generation batch cap: one fixed-shape prove program
# regardless of bank size (XLA program size — and remote-tunnel compile
# time — scales with n, so big single-shot batches are a compile-time trap).
# Small banks use the next power of two covering their own need instead of
# paying the full 1024-candidate cost (see _fwd_chunk_for).
_FWD_CHUNK = 1024


def _fwd_chunk_for(n_needed: int) -> int:
    """Prove-chunk size for a bank needing ``n_needed`` forward candidates:
    the smallest power of two covering the need, capped at _FWD_CHUNK.
    Powers of two keep the set of distinct compiled program shapes tiny."""
    n = 1
    while n < n_needed and n < _FWD_CHUNK:
        n <<= 1
    return n


class ConfigBank:
    """Fixed-capacity bank of initial configurations.

    ``boards``: bool[B, 20, 10] and ``pieces``: int8[B, M+1] device arrays.
    ``refresh_async`` swaps fresh host-generated configs into random rows.
    """

    def __init__(
        self,
        L: int,
        M: int,
        capacity: int = 1024,
        seed: int = 0,
        device=None,
        parity_translate: bool = False,
        forward_share_cap: float = 0.25,
    ) -> None:
        self.L = L
        self.M = M
        # reproduce the reference's prepended-random-first-piece quirk in
        # forward-family rows (game/tetris.py:19-20)? SURVEY.md §7 policy.
        self.parity_translate = parity_translate
        # async refresh: ceiling on the forward-family share of the bank
        self.forward_share_cap = forward_share_cap
        self.capacity = capacity
        self.P = M + 1
        self._rng = random.Random(seed)
        self._np_rng = np.random.default_rng(seed)
        self._device = device
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._mb = np.zeros((capacity, BOARD_H, BOARD_W), dtype=bool)
        self._mp = np.zeros((capacity, self.P), dtype=np.int8)
        # the host mirror goes STALE after an all-device refresh (the fast
        # path never pulls the bank over the device link); any host-side
        # consumer re-materializes it lazily via the properties below
        self._mirror_stale = False
        # per-row provenance: FAMILY_CARVE or FAMILY_FORWARD
        self._family = np.zeros(capacity, dtype=np.int8)
        self._fill_count = 0
        self._refresh_writes = 0
        self.boards: Optional[jax.Array] = None
        self.pieces: Optional[jax.Array] = None

    # -- host mirror (lazy) --------------------------------------------------

    def _materialize_mirror(self) -> None:
        self._mb = np.array(self.boards)
        self._mp = np.array(self.pieces)
        self._mirror_stale = False

    @property
    def _host_boards(self) -> np.ndarray:
        if self._mirror_stale:
            self._materialize_mirror()
        return self._mb

    @_host_boards.setter
    def _host_boards(self, v: np.ndarray) -> None:
        self._mb = v
        self._mirror_stale = False

    @property
    def _host_pieces(self) -> np.ndarray:
        if self._mirror_stale:
            self._materialize_mirror()
        return self._mp

    @_host_pieces.setter
    def _host_pieces(self, v: np.ndarray) -> None:
        self._mp = v
        self._mirror_stale = False

    # -- producers ----------------------------------------------------------

    def _carve_one(self) -> tuple[np.ndarray, list[int]]:
        gen = CarvingGenerator(self.L, self.M, rng=self._rng)
        return gen.generate()

    def fill(
        self,
        carve_fraction: float = 1.0,
        seed_start: int = 0,
        forward_seed_budget: int = 10_000,
    ) -> "ConfigBank":
        """Synchronously fill the bank. ``carve_fraction`` of rows come from
        the carving generator; the rest from the forward+prove pipeline.
        On hard tasks where the forward prover's yield collapses, the seed
        budget bounds the search and carving fills the shortfall."""
        n_carve = int(self.capacity * carve_fraction)
        for i in range(n_carve):
            b, p = self._carve_one()
            self._host_boards[i] = b
            self._host_pieces[i] = np.asarray(p[: self.P], dtype=np.int8)
            self._family[i] = FAMILY_CARVE
        i = n_carve
        seed = seed_start
        while i < self.capacity and seed < seed_start + forward_seed_budget:
            games = generate_batch(self.L, self.M, seed_start=seed, seed_end=seed + 100)
            seed += 100
            for b, p in translate_batch(
                games, self.M, rng=self._rng, parity=self.parity_translate
            ):
                if i >= self.capacity:
                    break
                self._host_boards[i] = b
                seq = (p + [0] * self.P)[: self.P]
                self._host_pieces[i] = np.asarray(seq, dtype=np.int8)
                self._family[i] = FAMILY_FORWARD
                i += 1
        while i < self.capacity:  # forward shortfall -> carve
            b, p = self._carve_one()
            self._host_boards[i] = b
            self._host_pieces[i] = np.asarray(p[: self.P], dtype=np.int8)
            self._family[i] = FAMILY_CARVE
            i += 1
        self._fill_count = self.capacity
        self._upload()
        return self

    @property
    def family_counts(self) -> dict:
        """How many bank rows come from each generator family."""
        return {
            "carve": int((self._family == FAMILY_CARVE).sum()),
            "forward": int((self._family == FAMILY_FORWARD).sum()),
        }

    @property
    def refresh_writes(self) -> int:
        """Total rows replaced by the async refresh since start_refresh."""
        return self._refresh_writes

    def _upload(self) -> None:
        kwargs = {"device": self._device} if self._device is not None else {}
        self.boards = jax.device_put(jnp.asarray(self._host_boards), **kwargs)
        self.pieces = jax.device_put(jnp.asarray(self._host_pieces), **kwargs)

    def _device_batch(self, key):
        from ..ops.bitboard import unpack_board
        from .jax_carver import generate_batch_device_jit

        batch = generate_batch_device_jit(
            key, n=self.capacity, L=self.L, M=self.M
        )
        return unpack_board(batch.boards), batch.pieces

    def _device_rows(
        self,
        key,
        forward_fraction: float,
        initial_height_max: int,
        oversample: int,
        beam_width: int = 8,
    ):
        """Host arrays (boards, pieces, family) for a full device-generated
        bank: carve rows from gen/jax_carver plus up to
        ``capacity * forward_fraction`` PROVEN forward-family rows from
        gen/jax_forward (the on-device generate+prove path). The forward
        generator oversamples ``oversample``x and keeps winners; any
        shortfall (low prover yield on hard tasks) stays carve-family."""
        from ..ops.bitboard import unpack_board
        from .jax_carver import generate_batch_device_jit

        k_carve, k_fwd = jax.random.split(key)
        batch = generate_batch_device_jit(
            k_carve, n=self.capacity, L=self.L, M=self.M
        )
        boards = np.array(unpack_board(batch.boards))
        pieces = np.array(batch.pieces)
        family = np.full(self.capacity, FAMILY_CARVE, dtype=np.int8)

        n_fwd = int(self.capacity * forward_fraction)
        if n_fwd > 0:
            from .jax_forward import generate_batch_device_jit as fwd_jit

            # Fixed-size chunks: the prove program's XLA size scales with n
            # (the remote tunnel took 20+ min to compile n=3072 for a 4096
            # bank), so compile ONE n=chunk program and call it repeatedly —
            # same winners, bank-size-independent compile. Small banks
            # (tests, capacity << 1024) size the chunk to their own need
            # rather than paying the full 1024-candidate prove cost.
            chunk = _fwd_chunk_for(oversample * n_fwd)
            got_b: list[np.ndarray] = []
            got_p: list[np.ndarray] = []
            remaining = n_fwd
            # don't burn a whole extra prove chunk to top up the last <=2%
            # of rows (beam yields run 97-100%, so the first chunk routinely
            # leaves a handful short); the shortfall stays carve-family
            slack = int(0.02 * n_fwd)
            k = k_fwd
            for _ in range(-(-oversample * n_fwd // chunk)):
                if remaining <= slack:
                    break
                k, kc = jax.random.split(k)
                fb = fwd_jit(
                    kc, n=chunk, L=self.L, M=self.M,
                    initial_height_max=initial_height_max,
                    beam_width=beam_width,
                )
                win = np.flatnonzero(np.asarray(fb.winnable))[:remaining]
                if len(win):
                    sel = jnp.asarray(win)
                    got_b.append(np.asarray(unpack_board(fb.boards[sel])))
                    got_p.append(np.asarray(fb.pieces[sel]))
                    remaining -= len(win)
            if got_b:
                fwd_boards = np.concatenate(got_b)
                fwd_pieces = np.concatenate(got_p)
                n_got = len(fwd_boards)
                boards[:n_got] = fwd_boards
                pieces[:n_got] = fwd_pieces
                family[:n_got] = FAMILY_FORWARD
        return boards, pieces, family

    def fill_device(
        self,
        key=None,
        forward_fraction: float = 0.0,
        initial_height_max: int = 4,
        oversample: int = 3,
        beam_width: int = 8,
    ) -> "ConfigBank":
        """Fill the whole bank ON DEVICE — no host generation at all. Carve
        rows come from the vectorized JAX carver (gen/jax_carver.py);
        ``forward_fraction > 0`` additionally fills that share with PROVEN
        forward-family configs from the on-device generate+prove pipeline
        (gen/jax_forward.py). Orders of magnitude faster than :meth:`fill`;
        use :meth:`fill` when bit-exact host parity is wanted."""
        if key is None:
            key = jax.random.PRNGKey(self._rng.randint(0, 2**31 - 1))
        boards, pieces, family = self._device_rows(
            key, forward_fraction, initial_height_max, oversample,
            beam_width,
        )
        kwargs = {"device": self._device} if self._device is not None else {}
        self.boards = jax.device_put(jnp.asarray(boards), **kwargs)
        self.pieces = jax.device_put(jnp.asarray(pieces), **kwargs)
        # np.array (copy): np.asarray of a jax array is a READ-ONLY view,
        # which would break later in-place refresh writes
        self._host_boards = boards
        self._host_pieces = pieces
        self._family[:] = family
        self._fill_count = self.capacity
        return self

    def _device_rows_on_device(
        self,
        key,
        forward_fraction: float,
        initial_height_max: int,
        oversample: int,
        beam_width: int,
    ):
        """All-device variant of :meth:`_device_rows`: carve + proven
        forward rows assembled as DEVICE arrays — the only host syncs are
        per-chunk scalar winner counts. The host-array path pulls the whole
        bank over the device link and pushes it back every refresh
        (~2MB/refresh through the remote-device tunnel, the dominant host
        cost of per-chunk regeneration in the round-4 profile); this path
        transfers nothing. Returns (boards, pieces, n_forward_rows)."""
        from ..ops.bitboard import unpack_board
        from .jax_carver import generate_batch_device_jit as carve_jit

        k_carve, k_fwd = jax.random.split(key)
        batch = carve_jit(k_carve, n=self.capacity, L=self.L, M=self.M)
        boards = unpack_board(batch.boards)
        pieces = jnp.asarray(batch.pieces, jnp.int8)

        n_fwd = int(self.capacity * forward_fraction)
        n_got = 0
        if n_fwd > 0:
            from .jax_forward import generate_batch_device_jit as fwd_jit

            chunk = _fwd_chunk_for(oversample * n_fwd)
            slack = int(0.02 * n_fwd)
            wins, fbs, fps = [], [], []
            have = 0
            k = k_fwd
            for _ in range(-(-oversample * n_fwd // chunk)):
                if have >= n_fwd - slack:
                    break
                k, kc = jax.random.split(k)
                fb = fwd_jit(
                    kc, n=chunk, L=self.L, M=self.M,
                    initial_height_max=initial_height_max,
                    beam_width=beam_width,
                )
                wins.append(fb.winnable)
                fbs.append(fb.boards)
                fps.append(fb.pieces)
                have += int(fb.winnable.sum())  # scalar sync only
            win = jnp.concatenate(wins)
            # the early-stop above can leave the candidate pool SMALLER
            # than n_fwd (high yield + n_fwd just over a chunk multiple:
            # have >= n_fwd - slack with pool < n_fwd) — clamp the slice
            # to the pool or the where() below shape-mismatches
            n_take = min(n_fwd, int(win.shape[0]))
            order = jnp.argsort(~win)           # stable: winners first
            take = order[:n_take]
            fwd_b = unpack_board(jnp.concatenate(fbs)[take])
            fwd_p = jnp.asarray(jnp.concatenate(fps)[take], jnp.int8)
            n_got = min(have, n_take)
            use = (jnp.arange(n_take) < n_got)
            boards = boards.at[:n_take].set(
                jnp.where(use[:, None, None], fwd_b, boards[:n_take])
            )
            pieces = pieces.at[:n_take].set(
                jnp.where(use[:, None], fwd_p, pieces[:n_take])
            )
        return boards, pieces, n_got

    def refresh_device(
        self,
        key=None,
        forward_fraction: float = 0.0,
        initial_height_max: int = 4,
        oversample: int = 3,
        beam_width: int = 8,
    ) -> "ConfigBank":
        """Regenerate bank rows on device with fresh configs.

        Called between training chunks this makes the training distribution
        effectively infinite — the TPU-native answer to bank memorization
        (the carver emits tens of thousands of configs/s on chip, so the
        whole bank turns over every chunk for ~ms of device time).

        ``forward_fraction == 0`` (default): carve-family rows are
        regenerated, rows owned by the host forward producer are preserved.
        ``forward_fraction > 0``: the WHOLE bank is regenerated as a
        carve + proven-device-forward mixture (gen/jax_forward.py) — both
        families become infinite distributions, so the host producers are
        redundant (they may still run; their rows simply churn too)."""
        if key is None:
            key = jax.random.PRNGKey(self._rng.randint(0, 2**31 - 1))
        with self._lock:
            if self.boards is None:  # refresh before any fill: seed device
                self._upload()
            kwargs = {"device": self._device} if self._device is not None else {}
            if forward_fraction > 0:
                if not any(t.is_alive() for t in self._threads):
                    # no async host producers own the mirror -> stay fully
                    # on device; the mirror goes stale (lazy re-pull)
                    boards, pieces, n_got = self._device_rows_on_device(
                        key, forward_fraction, initial_height_max,
                        oversample, beam_width,
                    )
                    self.boards = jax.device_put(boards, **kwargs)
                    self.pieces = jax.device_put(pieces, **kwargs)
                    self._family[:n_got] = FAMILY_FORWARD
                    self._family[n_got:] = FAMILY_CARVE
                    self._mirror_stale = True
                    return self
                boards_np, pieces_np, family = self._device_rows(
                    key, forward_fraction, initial_height_max, oversample,
                    beam_width,
                )
                self.boards = jax.device_put(jnp.asarray(boards_np), **kwargs)
                self.pieces = jax.device_put(jnp.asarray(pieces_np), **kwargs)
                self._host_boards = boards_np
                self._host_pieces = pieces_np
                self._family[:] = family
                return self
            boards_new, pieces_new = self._device_batch(key)
            carve = jnp.asarray(self._family == FAMILY_CARVE)
            # current rows come from the DEVICE copy (authoritative); the
            # host mirror may be lazily stale after a fast refresh
            boards = jnp.where(
                carve[:, None, None], boards_new, jnp.asarray(self.boards)
            )
            pieces = jnp.where(
                carve[:, None], pieces_new, jnp.asarray(self.pieces)
            )
            self.boards = jax.device_put(boards, **kwargs)
            self.pieces = jax.device_put(pieces, **kwargs)
            if any(t.is_alive() for t in self._threads):
                # host mirror stays authoritative for async host producers
                self._host_boards = np.array(boards)
                self._host_pieces = np.array(pieces)
            else:
                self._mirror_stale = True
        return self

    # -- async refresh ------------------------------------------------------

    def _swap_rows(self, fresh: list, family: int) -> None:
        """Replace rows with fresh configs and re-upload (host double-buffer;
        device arrays replaced atomically by rebinding).

        Family-aware targeting: the carve producer is orders of magnitude
        faster than the forward prover, so uniform-random targets would wash
        the forward rows out of the bank within seconds (measured: 4091/5 at
        steady state). Carve writes only replace carve rows; forward writes
        replace carve rows until the forward share reaches
        ``forward_share_cap`` of capacity, then recycle forward rows."""
        with self._lock:
            if family == FAMILY_FORWARD:
                cap_rows = int(self.capacity * self.forward_share_cap)
                n_fwd = int((self._family == FAMILY_FORWARD).sum())
                pool_family = (
                    FAMILY_FORWARD if n_fwd >= cap_rows else FAMILY_CARVE
                )
            else:
                pool_family = FAMILY_CARVE
            pool = np.flatnonzero(self._family == pool_family)
            if len(pool) == 0:
                pool = np.arange(self.capacity)
            rows = self._np_rng.choice(
                pool, size=len(fresh), replace=len(pool) < len(fresh)
            )
            for row, (b, p) in zip(rows, fresh):
                self._host_boards[row] = b
                seq = (list(p) + [0] * self.P)[: self.P]
                self._host_pieces[row] = np.asarray(seq, dtype=np.int8)
                self._family[row] = family
            self._refresh_writes += len(fresh)
            self._upload()

    def start_refresh(
        self,
        n_threads: int = 1,
        batch_per_cycle: int = 32,
        forward: bool = True,
        forward_seed_start: int = 0,
        forward_window: int = 100,
    ) -> None:
        """Background producer PROCESSES keep swapping fresh configs into
        random rows — the reference's two-producer design
        (game/tetris.py:473-488), bank-resident instead of queue-fed:

        * ``n_threads`` carving producers (reference warm_reset_worker);
        * one forward generate+prove producer (reference
          forward_warm_reset_worker) over ROTATING seed windows — unlike the
          reference, which pins seeds 0..99 and reproduces the same 100
          boards forever (SURVEY.md §3.5). ``forward=False`` disables it.

        Processes, not threads: the generators are GIL-bound Python, and as
        threads they stall the training dispatch loop (measured: training
        sps dropped 4-6x under thread producers). A lightweight consumer
        thread drains the queue and swaps rows (cheap numpy writes + device
        re-upload). Spawn context — the parent holds live JAX threads.

        Failure handling (the reference has none — a dead warm-reset worker
        silently starves reset() forever, SURVEY.md §5.3): a producer process
        that dies is restarted by the consumer, up to 5 times total."""
        from . import _producers

        ctx = multiprocessing.get_context("spawn")
        self._stop.clear()
        self._restarts = 0
        self._mp_stop = ctx.Event()
        self._mp_queue = ctx.Queue(maxsize=8)
        self._proc_specs = []
        for t in range(n_threads):
            self._proc_specs.append((
                _producers.carve_producer,
                (self._mp_queue, self._mp_stop, self.L, self.M,
                 self._rng.randint(0, 2**31 - 1), batch_per_cycle),
            ))
        if forward:
            self._proc_specs.append((
                _producers.forward_producer,
                (self._mp_queue, self._mp_stop, self.L, self.M,
                 self.parity_translate, forward_seed_start, forward_window,
                 self._rng.randint(0, 2**31 - 1)),
            ))
        self._procs = []
        for fn, args in self._proc_specs:
            p = ctx.Process(target=fn, args=args, daemon=True)
            p.start()
            self._procs.append(p)

        def consumer() -> None:
            import queue as queue_mod

            while not self._stop.is_set():
                try:
                    fam, items = self._mp_queue.get(timeout=0.2)
                except queue_mod.Empty:
                    # failure detection + restart (SURVEY.md §5.3 gap)
                    for i, p in enumerate(self._procs):
                        if (
                            not p.is_alive()
                            and not self._stop.is_set()
                            and self._restarts < 5
                        ):
                            self._restarts += 1
                            fn, args = self._proc_specs[i]
                            np_ = ctx.Process(target=fn, args=args, daemon=True)
                            np_.start()
                            self._procs[i] = np_
                    continue
                self._swap_rows(items, fam)

        th = threading.Thread(target=consumer, daemon=True)
        th.start()
        self._threads.append(th)

    def stop_refresh(self) -> None:
        """Clean shutdown — the reference's Event + drain + join protocol
        (game/tetris.py:451-466): signal both stop events, drain the queue so
        producers blocked on put() can exit, join everything."""
        self._stop.set()
        if getattr(self, "_mp_stop", None) is not None:
            self._mp_stop.set()
            try:
                while True:
                    self._mp_queue.get_nowait()
            except Exception:
                pass
        for th in self._threads:
            th.join(timeout=30)
        self._threads.clear()
        for p in getattr(self, "_procs", []):
            p.join(timeout=10)
            if p.is_alive():
                p.terminate()
                p.join(timeout=5)  # reap — terminate alone leaves a zombie
        self._procs = []

    def subset(self, family: int) -> Optional["ConfigBank"]:
        """A new bank holding only this family's rows (None if empty) —
        used for per-family evaluation breakdowns."""
        idx = np.flatnonzero(self._family == family)
        if len(idx) == 0:
            return None
        sub = ConfigBank(self.L, self.M, capacity=len(idx), seed=0,
                         device=self._device)
        sub._host_boards = self._host_boards[idx].copy()
        sub._host_pieces = self._host_pieces[idx].copy()
        sub._family[:] = family
        sub._fill_count = len(idx)
        sub._upload()
        return sub

    # -- identity -------------------------------------------------------------

    def row_keys(self) -> set[bytes]:
        """One hashable key per (board, piece-sequence) row — the config's
        full identity. Used to prove train/holdout disjointness."""
        keys = set()
        for i in range(self.capacity):
            keys.add(
                np.packbits(self._host_boards[i]).tobytes()
                + self._host_pieces[i].tobytes()
            )
        return keys


def make_holdout_bank(
    L: int,
    M: int,
    capacity: int,
    train_bank: Optional[ConfigBank] = None,
    *,
    seed: int = 1_000_003,
    forward_fraction: float = 0.5,
    forward_seed_start: int = 100_000,
    forward_seed_budget: int = 4_000,
    forward_time_budget_s: float = 120.0,
    device=None,
) -> ConfigBank:
    """Build an evaluation bank PROVABLY DISJOINT from ``train_bank``.

    The round-1 headline win rates were measured on the training bank — the
    same finite config set the agent revisited ~1e6 times — so they could
    reflect memorization. This builds a fresh bank from BOTH config families:

    * forward generate+prove games from seeds >= ``forward_seed_start``
      (the reference's own pipeline only ever uses seeds 0..99,
      game/tetris_algo_main/main.py:39-40, and training banks use either
      the same low windows or the device carver, so these seeds are new);
    * device-carved configs from a fresh PRNG key derived from ``seed``
      (never used for training banks, which derive keys from cfg.seed).

    Disjointness is then *checked*, not assumed: every row's
    (board, sequence) identity is hashed and any row colliding with the
    training bank is dropped and replaced by a freshly-carved one. Forward
    generation is bounded by ``forward_seed_budget`` seeds; any shortfall
    (hard tasks where the greedy prover's yield is low) is filled by carving.
    """
    bank = ConfigBank(L, M, capacity=capacity, seed=seed, device=device)
    P = bank.P
    taken: set[bytes] = set(train_bank.row_keys()) if train_bank is not None else set()

    def key_of(board: np.ndarray, pieces: np.ndarray) -> bytes:
        return np.packbits(board).tobytes() + pieces.tobytes()

    rows: list[tuple[np.ndarray, np.ndarray]] = []

    # forward family first (seeds provably outside any training window);
    # bounded by seed AND wall-clock budget — on hard tasks the greedy
    # prover's yield collapses and carving fills the shortfall
    n_forward = int(capacity * forward_fraction)
    s = forward_seed_start
    t_end = time.time() + forward_time_budget_s
    while (
        len(rows) < n_forward
        and s < forward_seed_start + forward_seed_budget
        and time.time() < t_end
    ):
        games = generate_batch(L, M, seed_start=s, seed_end=s + 100)
        s += 100
        for b, p in translate_batch(games, M, rng=bank._rng, parity=False):
            if len(rows) >= n_forward:
                break
            board = np.asarray(b, dtype=bool)
            pieces = np.asarray((p + [0] * P)[:P], dtype=np.int8)
            k = key_of(board, pieces)
            if k in taken:
                continue
            taken.add(k)
            rows.append((board, pieces))
    # host-forward shortfall: on hard tasks the host DFS prover's yield
    # collapses (L=10/M=30 yields ZERO games inside any realistic budget, so
    # round 2's L=10 holdout was silently 100% carve-family). Top up with
    # DEVICE forward-family rows from the beam prover under a holdout-only
    # PRNG key: still provably winnable (replay contract), still hash-checked
    # disjoint — the holdout stays fresh-unseen-configs, only the
    # forward-row *generator* differs (beam-proven device rows vs host DFS).
    from ..ops.bitboard import unpack_board

    key = jax.random.PRNGKey(seed)
    if len(rows) < n_forward:
        from .jax_forward import generate_batch_device_jit as fwd_jit

        for _ in range(8):
            if len(rows) >= n_forward:
                break
            key, k_fwd = jax.random.split(key)
            fb = fwd_jit(k_fwd, n=_fwd_chunk_for(n_forward), L=L, M=M)
            win = np.flatnonzero(np.asarray(fb.winnable))
            fboards = np.asarray(unpack_board(fb.boards[jnp.asarray(win)]))
            fpieces = np.asarray(fb.pieces[jnp.asarray(win)])
            for i in range(len(win)):
                if len(rows) >= n_forward:
                    break
                board = fboards[i].astype(bool)
                pieces = fpieces[i].astype(np.int8)
                k = key_of(board, pieces)
                if k in taken:
                    continue
                taken.add(k)
                rows.append((board, pieces))
    n_forward_got = len(rows)

    # fill the rest by carving on device from a fresh key (fast), replacing
    # any row that collides with the training bank
    from .jax_carver import generate_batch_device
    while len(rows) < capacity:
        key, k_gen = jax.random.split(key)
        n_need = capacity - len(rows)
        n_gen = max(64, n_need)
        batch = jax.jit(
            generate_batch_device, static_argnames=("n", "L", "M")
        )(k_gen, n=n_gen, L=L, M=M)
        boards = np.asarray(unpack_board(batch.boards))
        pieces = np.asarray(batch.pieces)
        for i in range(n_gen):
            if len(rows) >= capacity:
                break
            k = key_of(boards[i], pieces[i])
            if k in taken:
                continue
            taken.add(k)
            rows.append((boards[i], pieces[i]))

    for i, (b, p) in enumerate(rows):
        bank._host_boards[i] = b
        bank._host_pieces[i] = p
        bank._family[i] = FAMILY_FORWARD if i < n_forward_got else FAMILY_CARVE
    bank._fill_count = capacity
    bank._upload()

    if train_bank is not None:
        overlap = bank.row_keys() & train_bank.row_keys()
        assert not overlap, f"holdout/train overlap: {len(overlap)} rows"
    return bank
