"""Gym-style compatibility shims over the functional env core.

Mirrors the reference's ``PhysEnv`` / ``VectorPhysEnv`` classes
(reference env.py:299-513) for users coming from the reference API and for
parity tests.  These are host-side conveniences — training never goes
through them; it uses the pure functions in :mod:`q1physrl_tpu.env.core`
directly inside one jitted program.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import core
from .config import Config, get_obs_scale

__all__ = ("PhysEnv", "VectorPhysEnv", "encode_actions")


def encode_actions(actions, cfg: Config):
    """Reference-format actions -> (key_actions (K, N) i32, yaw_action (N,)).

    Accepts the ragged formats the reference's ``_fix_actions`` normalizes
    (env.py:221-223): a sequence over envs of sequences over action
    components, each component a scalar or length-1 array.
    """
    flat = np.array([[np.ravel(x)[0] for x in a] for a in actions])
    nk = cfg.num_keys
    key_actions = flat[:, :nk].astype(np.int32).T  # (K, N)
    if cfg.allow_yaw:
        yaw_action = flat[:, nk].astype(np.float64)
    else:
        yaw_action = np.zeros(flat.shape[0])
    return key_actions, yaw_action


def _spaces(cfg: Config):
    """(observation_space, action_space) via gymnasium, if available."""
    try:
        import gymnasium.spaces as sp
    except ImportError:  # pragma: no cover
        return None, None
    obs_space = sp.Box(low=-np.inf, high=np.inf, shape=(6,), dtype=np.float32)
    parts = [sp.Discrete(2) for _ in range(cfg.num_keys)]
    if cfg.allow_yaw:
        if cfg.discrete_yaw_steps == -1:
            parts.append(sp.Box(low=-cfg.action_range, high=cfg.action_range,
                                shape=(1,), dtype=np.float32))
        else:
            parts.append(sp.Discrete(2 * cfg.discrete_yaw_steps + 1))
    return obs_space, sp.Tuple(parts)


class VectorPhysEnv:
    """Vectorized env with the reference's VectorEnv-style interface
    (env.py:369-513): ``vector_reset`` / ``reset_at`` / ``vector_step``.

    ``float_dtype=np.float64`` reproduces the reference's mixed
    float32/float64 arithmetic exactly; float32 is the TPU-native mode.
    """

    def __init__(self, config: Union[Config, dict], seed: int = 0,
                 float_dtype=None):
        if isinstance(config, dict):
            config = Config(**config)
        self._config = config
        self.num_envs = config.num_envs
        if float_dtype is None:
            # float64 parity mode needs jax_enable_x64; fall back cleanly.
            float_dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
        self._float_dtype = jnp.dtype(float_dtype)
        self._key = jax.random.key(seed)

        self.reward_range = (-1000 * config.time_delta, 1000 * config.time_delta)
        self.metadata = {}
        self.observation_space, self.action_space = _spaces(config)
        self._obs_scale = get_obs_scale(config)

        self._step_fn = functools.partial(
            jax.jit, static_argnums=0)(core.step)
        # Jit reset too: eager op-by-op dispatch is pathologically slow on
        # first call (each tiny op compiles separately).
        self._reset_fn = functools.partial(
            jax.jit, static_argnums=(0, 2, 3))(core.reset)
        self._state: Optional[core.EnvState] = None
        self.vector_reset()

    # -- introspection used by analysis tools (mirrors reference attributes)
    @property
    def player_state(self):
        return self._state.player

    @property
    def _yaw(self):
        return np.asarray(self._state.yaw)

    @property
    def _time_remaining(self):
        return np.asarray(self._state.time_remaining)

    @property
    def _zero_start(self):
        return np.asarray(self._state.zero_start)

    def _split(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _get_obs(self):
        return np.asarray(core.compute_obs(
            self._config, self._state.player, self._state.yaw,
            self._state.time_remaining))

    def vector_reset(self):
        self._state = self._reset_fn(self._config, self._split(),
                                     self.num_envs, self._float_dtype)
        return self._get_obs()

    def reset_at(self, index: int):
        fresh = self._reset_fn(self._config, self._split(), 1,
                               self._float_dtype)
        put = lambda cur, new, axis=0: jnp.asarray(cur).at[
            (index,) if axis == 0 else (slice(None), index)].set(
                jnp.asarray(new)[0] if axis == 0 else jnp.asarray(new)[:, 0])
        s, f = self._state, fresh
        self._state = core.EnvState(
            player=jax.tree.map(lambda c, n: put(c, n), s.player, f.player),
            yaw=put(s.yaw, f.yaw),
            time_remaining=put(s.time_remaining, f.time_remaining),
            zero_start=put(s.zero_start, f.zero_start),
            last_keys=put(s.last_keys, f.last_keys, axis=1),
            last_key_press_time=put(s.last_key_press_time,
                                    f.last_key_press_time, axis=1),
            rng=s.rng,
        )
        return self._get_obs()[index]

    def vector_step(self, actions):
        key_actions, yaw_action = encode_actions(actions, self._config)
        self._state, out = self._step_fn(
            self._config, self._state,
            jnp.asarray(key_actions),
            jnp.asarray(yaw_action, self._float_dtype))
        infos = [{"zero_start": bool(z)} for z in np.asarray(out.zero_start)]
        return (np.asarray(out.obs), np.asarray(out.reward),
                np.asarray(out.done), infos)

    def get_unwrapped(self):
        return []


class PhysEnv:
    """Single-env facade over :class:`VectorPhysEnv` (reference env.py:299-357)."""

    def __init__(self, config: Union[Config, dict], **kwargs):
        if isinstance(config, dict):
            config = Config(**config)
        if config.num_envs is not None:
            raise ValueError("num_envs must be None for PhysEnv")
        config = dataclasses.replace(config, num_envs=1)
        self._env = VectorPhysEnv(config, **kwargs)
        self.observation_space = self._env.observation_space
        self.action_space = self._env.action_space

    def step(self, action):
        (obs,), (reward,), (done,), (info,) = self._env.vector_step([action])
        return obs, reward, done, info

    def reset(self):
        (obs,) = self._env.vector_reset()
        return obs
