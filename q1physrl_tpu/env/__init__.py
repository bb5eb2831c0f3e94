"""Batched Quake-movement environment (functional core + gym shims)."""

from .config import (INITIAL_STATE, INITIAL_YAW_ZERO, MAX_YAW_SPEED, Config,
                     Key, Obs, get_obs_scale)
from .core import EnvState, StepResult, compute_obs, reset, step, step_autoreset
from .gym_compat import PhysEnv, VectorPhysEnv, encode_actions

__all__ = (
    "Config", "Key", "Obs", "INITIAL_STATE", "INITIAL_YAW_ZERO",
    "MAX_YAW_SPEED", "get_obs_scale",
    "EnvState", "StepResult", "compute_obs", "reset", "step", "step_autoreset",
    "PhysEnv", "VectorPhysEnv", "encode_actions",
)
