"""On-device PPO actor-learner (replaces Ray RLLib in the reference)."""

from .config import PPOConfig, RunConfig
from .ppo import TrainState, init_train_state, train_iter
from .train import Trainer, load_run_config

__all__ = ("PPOConfig", "RunConfig", "TrainState", "init_train_state",
           "train_iter", "Trainer", "load_run_config")
