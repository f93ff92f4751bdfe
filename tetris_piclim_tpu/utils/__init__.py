from .config import DQNConfig, EnvConfig, TrainConfig

__all__ = ["DQNConfig", "EnvConfig", "TrainConfig"]
