"""Initial-configuration generators for Tetris-piclim.

Every generator produces *provably winnable* (board, piece-sequence) start
states. Two families, mirroring the reference:

* :mod:`.forward` + :mod:`.solver` — seeded forward construction + greedy-DFS
  winnability prover (reference: game/tetris_algo_main/). Host-side numpy:
  backtracking DFS is hostile to XLA; results are batched to the device bank.
* :mod:`.carver` — reverse "carving" construction (reference:
  game/tetris.py:226-352). Host parity version here; the on-device vectorized
  JAX variant lives in :mod:`.jax_carver`.
* :mod:`.bank` — the device-resident config bank + asynchronous host refresh,
  the TPU-native replacement for the reference's multiprocessing warm-reset
  queue (reference: game/tetris.py:190-214, 473-488).
"""

from .forward import ForwardGenerator, generate_board_and_sequence
from .solver import GreedyDFSSolver
from .carver import CarvingGenerator
from .pipeline import generate_batch, translate_batch
from .bank import ConfigBank
