"""Gymnasium adapter + registration of ``Q1PhysEnv-v0``.

The reference registers ``Q1PhysEnv-v0`` with classic gym on import
(reference env.py:516-521).  This module provides the modern gymnasium
equivalent (5-tuple step, ``reset() -> (obs, info)``) and registers the id
when gymnasium is importable.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from .config import Config
from .gym_compat import VectorPhysEnv

__all__ = ("GymnasiumPhysEnv", "register")

try:
    import gymnasium
except ImportError:  # pragma: no cover
    gymnasium = None


class GymnasiumPhysEnv(*([gymnasium.Env] if gymnasium else [object])):
    """Single-env gymnasium.Env over the functional core."""

    metadata = {"render_modes": []}

    def __init__(self, config: Union[Config, dict, None] = None,
                 render_mode: Optional[str] = None):
        if config is None:
            config = Config.get_default()
        elif isinstance(config, dict):
            config = Config(**config)
        import dataclasses

        config = dataclasses.replace(config, num_envs=1)
        self._env = VectorPhysEnv(config, float_dtype=np.float32)
        self.observation_space = self._env.observation_space
        self.action_space = self._env.action_space
        self.render_mode = render_mode

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            import jax

            self._env._key = jax.random.key(seed)
        (obs,) = self._env.vector_reset()
        return np.asarray(obs, np.float32), {}

    def step(self, action):
        (obs,), (reward,), (done,), (info,) = self._env.vector_step([action])
        # The episode ends only by time limit -> truncation in gymnasium
        # terms; there is no terminal failure state.
        return (np.asarray(obs, np.float32), float(reward), False, bool(done),
                info)


def register():
    """Register ``Q1PhysEnv-v0`` with gymnasium (idempotent)."""
    if gymnasium is None:
        return False
    if "Q1PhysEnv-v0" in gymnasium.registry:
        return True
    gymnasium.register(
        id="Q1PhysEnv-v0",
        entry_point="q1physrl_tpu.env.gymnasium_env:GymnasiumPhysEnv",
        nondeterministic=False,
    )
    return True


register()
