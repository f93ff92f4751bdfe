"""tetris_piclim_tpu — a TPU-native framework for Tetris-piclim.

Tetris with a Prescribed Initial Configuration and LIMited moves: clear L
lines within M moves starting from a provably-winnable configuration.

A from-scratch JAX/XLA re-design (not a port) of
dtee1/reinforcement-learning-for-playing-tetris-with-prescribed-initial-
configuration-and-limited-moves: the single-env numpy ``Tetris`` becomes a
pure-functional jit+vmap engine; the multiprocessing warm-reset queue becomes
a device-resident bank of winnable configurations; the unfinished PyTorch DQN
stub becomes a working on-device actor-learner sharded over a TPU mesh.
"""

from . import tables
from .engine import (
    EnvState,
    StepResult,
    OBS_DIM,
    RUNNING,
    WIN,
    LOSS,
    make_state,
    make_state_batch,
    observe,
    observe_batch,
    step,
    step_batch,
    step_autoreset_batch,
)

__version__ = "0.1.0"
