"""Batched Quake-movement environment (functional core + gym shims)."""

from .config import (INITIAL_STATE, INITIAL_YAW_ZERO, MAX_YAW_SPEED, Config,
                     Key, Obs, get_obs_scale)
from .core import EnvState, StepResult, compute_obs, reset, step, step_autoreset
from .gym_compat import PhysEnv, VectorPhysEnv, encode_actions

try:  # register Q1PhysEnv-v0 with gymnasium when available
    from . import gymnasium_env  # noqa: F401
except Exception:  # pragma: no cover
    pass

__all__ = (
    "Config", "Key", "Obs", "INITIAL_STATE", "INITIAL_YAW_ZERO",
    "MAX_YAW_SPEED", "get_obs_scale",
    "EnvState", "StepResult", "compute_obs", "reset", "step", "step_autoreset",
    "PhysEnv", "VectorPhysEnv", "encode_actions",
)
