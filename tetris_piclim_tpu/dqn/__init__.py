"""Working DQN for Tetris-piclim — the trainer the reference declares but
never implements (reference model/train.py ends after creating the optimizer
at :27; see SURVEY.md §2.9). Algorithm reconstructed from the reference's
constants and comments (model/train.py:8-21): replay sampling (BATCH_SIZE),
epsilon-greedy with exponential decay (EPS_*), discounting (GAMMA), Polyak
soft target updates (TAU), AdamW(amsgrad, LR).

Everything on-device: vmapped epsilon-greedy actor over N envs, device-
resident ring replay buffer, jitted TD update. One fused jit per training
chunk; the host only logs and refreshes the config bank.
"""

from .replay import (
    ReplayState,
    replay_init,
    replay_add,
    replay_sample,
    replay_sample_ext,
    replay_update_priority,
)
from .agent import (
    select_actions,
    td_loss,
    make_optimizer,
    eps_schedule,
    learner_update,
)
from .train import DQNTrainer, TrainState

__all__ = [
    "ReplayState",
    "replay_init",
    "replay_add",
    "replay_sample",
    "replay_sample_ext",
    "replay_update_priority",
    "select_actions",
    "td_loss",
    "make_optimizer",
    "eps_schedule",
    "learner_update",
    "DQNTrainer",
    "TrainState",
]
