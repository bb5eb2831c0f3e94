"""Functional batched Quake-movement environment.

This is the TPU-native redesign of the reference's stateful
``VectorPhysEnv`` + ``ActionDecoder`` pair (reference env.py:183-513).  All
mutable state — player physics state, integrated yaw, episode clock,
zero-start flag, and the decoder's key-latch state — is folded into one
explicit :class:`EnvState` pytree, and every transition is a pure function:

    reset(cfg, key, n)                  -> EnvState
    step(cfg, state, keys, yaw_action)  -> (EnvState, StepResult)
    step_autoreset(...)                 -> same, with done envs re-drawn

so the whole rollout compiles to a single ``lax.scan`` under ``jit`` and
shards over a device mesh along the env axis with no host involvement.

TPU-first layout choices:

- all per-env quantities are flat ``(N,)`` arrays (SoA — see phys.py);
- per-key decoder state is ``(K, N)`` (key axis leading) so the env axis
  stays the minor, lane-mapped dimension;
- the config is a static (hashable) argument: every ``if cfg.x`` below is
  resolved at trace time, so each config compiles to straight-line XLA with
  no runtime branches.

Auto-reset replaces the reference's RLLib-driven ``reset_at`` calls
(env.py:457-480): envs whose episode ends are re-drawn *inside* the step,
which keeps per-env episode phase staggered within the lockstep batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import phys
from .config import (INITIAL_STATE, INITIAL_YAW_ZERO, MAX_YAW_SPEED, Config,
                     Key, get_obs_scale)

__all__ = ("EnvState", "StepResult", "reset", "step", "step_autoreset",
           "compute_obs", "decode_actions")


@struct.dataclass
class EnvState:
    """All environment state for N lockstep envs.

    Folds together the reference's ``VectorPhysEnv`` fields (env.py:375-379)
    and ``ActionDecoder`` fields (env.py:200-202).
    """

    player: phys.PlayerState
    yaw: jnp.ndarray              # (N,) integrated view yaw, degrees
    time_remaining: jnp.ndarray   # (N,) seconds
    zero_start: jnp.ndarray       # (N,) bool
    last_keys: jnp.ndarray        # (K, N) int32 — decoder key latch
    last_key_press_time: jnp.ndarray  # (K, N) — decoder rate-limit clock
    rng: jnp.ndarray              # PRNG key used for auto-resets

    @property
    def num_envs(self) -> int:
        return self.yaw.shape[0]


@struct.dataclass
class StepResult:
    obs: jnp.ndarray | None       # (N, 6) normalized observation (optional)
    reward: jnp.ndarray           # (N,)
    done: jnp.ndarray             # (N,) bool
    zero_start: jnp.ndarray       # (N,) bool — flag of the episode just stepped


def _round_vel(v):
    """Protocol velocity quantization: multiples of 16, truncated toward zero
    (sv_main.c:SV_WriteClientdataToMessage; reference env.py:381-383)."""
    return jnp.trunc(v / 16.0) * 16.0


def _round_origin(o):
    """Protocol coordinate quantization: nearest 1/8, ties-to-even
    (common.c:MSG_WriteCoord; reference env.py:385-390)."""
    return jnp.round(o * 8.0) / 8.0


def compute_obs(cfg: Config, player: phys.PlayerState, yaw, time_remaining,
                dtype=None):
    """Build the normalized (N, 6) observation (reference env.py:392-400).

    The agent sees exactly what a real Quake client would see on the wire:
    velocities quantized to multiples of 16 and origins to 1/8 units.
    """
    if dtype is None:
        dtype = jnp.result_type(jnp.asarray(yaw).dtype, jnp.float32)
    cols = [
        jnp.asarray(time_remaining, dtype),
        jnp.asarray(yaw, dtype),
        _round_origin(jnp.asarray(player.z_pos, dtype)),
        _round_vel(jnp.asarray(player.vel_x, dtype)),
        _round_vel(jnp.asarray(player.vel_y, dtype)),
        _round_vel(jnp.asarray(player.vel_z, dtype)),
    ]
    scale = jnp.asarray(get_obs_scale(cfg), dtype)
    return jnp.stack(cols, axis=-1) / scale


def _decode(cfg: Config, last_keys, last_key_press_time, yaw, key_actions,
            yaw_action, z_vel, time_remaining):
    """Map raw actions to a move command (reference ActionDecoder.map,
    env.py:225-269), functionally.

    Args:
        key_actions: (K, N) int32 in {0, 1}.
        yaw_action: (N,) float — continuous mouse value, or (when
            ``cfg.discrete_yaw_steps >= 0``) the discrete step index.

    Returns:
        (new_last_keys, new_last_key_press_time, new_yaw,
         smove, fmove, jump) — smove/fmove already truncated to integers
        (reference env.py:269 ``astype(int)``) but returned as floats.
    """
    # The reference computes this as np.float32(720) * time_delta -> a
    # float32 scalar (env.py:230); keep that exact value for parity.
    max_yaw_delta = float(np.float32(MAX_YAW_SPEED) * cfg.time_delta)
    yaw_steps = cfg.discrete_yaw_steps

    if not cfg.allow_yaw:
        mouse_x = jnp.zeros_like(yaw)
    elif yaw_steps == -1:
        mouse_x = yaw_action * max_yaw_delta / cfg.action_range
    else:
        mouse_x = (yaw_action - yaw_steps) * max_yaw_delta / yaw_steps

    # Rate-limit key presses: a 0->1 transition is suppressed unless
    # key_press_delay has elapsed since the last registered press
    # (reference env.py:240-248).  current_time counts up from episode start.
    current_time = cfg.time_limit - time_remaining  # (N,)
    elapsed = current_time >= last_key_press_time + cfg.key_press_delay
    keys = key_actions & (elapsed | (last_keys > 0))
    pressed = (keys > 0) & (last_keys == 0)
    new_last_key_press_time = jnp.where(
        pressed, current_time.astype(last_key_press_time.dtype),
        last_key_press_time)

    # Half-strength press on transition frames, per cl_input.c:CL_KeyState()
    # (reference env.py:250-254).
    if cfg.smooth_keys:
        smoothed = (keys + last_keys) * 0.5
    else:
        smoothed = keys

    new_yaw = yaw + mouse_x
    strafe = smoothed[Key.STRAFE_RIGHT] - smoothed[Key.STRAFE_LEFT]
    fdtype = jnp.asarray(yaw).dtype
    # The reference truncates move magnitudes to whole units (env.py:269).
    smove = (cfg.smove_max * strafe).astype(jnp.int32).astype(fdtype)
    fmove = (cfg.fmove_max * smoothed[Key.FORWARD]).astype(jnp.int32).astype(fdtype)

    if cfg.auto_jump:
        jump = z_vel <= 16  # (reference env.py:262-263)
    elif cfg.allow_jump:
        jump = keys[Key.JUMP] > 0
    else:
        jump = jnp.zeros(keys.shape[1], dtype=bool)

    return keys, new_last_key_press_time, new_yaw, smove, fmove, jump


def decode_actions(cfg: Config, state: EnvState, key_actions, yaw_action):
    """Pure view of the decoded move command for the given state+action —
    what :func:`step` will send to the physics (yaw, smove, fmove, jump).
    Mirrors the reference's external-ActionDecoder usage in analysis code
    (reference analyse.py:215-216).  Does not advance any state."""
    _, _, yaw, smove, fmove, jump = _decode(
        cfg, state.last_keys, state.last_key_press_time, state.yaw,
        key_actions, yaw_action, state.player.vel_z, state.time_remaining)
    return yaw, smove, fmove, jump


def reset_from_uniforms(cfg: Config, u_zs, u_yaw, u_time, u_speed, u_angle,
                        float_dtype=None, rng=None, flag_dtype=bool) -> EnvState:
    """Build fresh episode-start state from five uniform-[0,1) draw arrays
    (reference env.py:428-455).

    This is the single implementation of the reset distribution: the XLA
    path (:func:`_draw_reset`) feeds it ``jax.random`` draws, the Pallas
    rollout kernels feed it in-kernel TPU-PRNG or HBM-streamed draws — so
    the kernels can be tested elementwise against :func:`step_autoreset`
    rather than only statistically.

    ``flag_dtype`` controls the dtype of the boolean state leaves
    (``on_ground``/``jump_released``/``zero_start``).  The XLA path uses
    the default ``bool``; the Pallas kernels request ``int32`` because
    Mosaic cannot lower bool-valued (i8/i1) vector constants and selects —
    masks derived from fresh comparisons (i1) are fine, *stored* bool
    vectors are not.

    Faithfully reproduces a reference quirk: the randomized draws call
    ``np.random.uniform(x, size=...)`` — i.e. low=x, high=1.0 — so
    time_remaining / speed / move_angle are drawn from (1, x], *not* (0, x].
    """
    if float_dtype is None:
        float_dtype = u_yaw.dtype
    shape = jnp.shape(u_zs)

    zero_start = u_zs < cfg.zero_start_prob

    lo, hi = cfg.initial_yaw_range
    yaw = jnp.where(zero_start, INITIAL_YAW_ZERO, lo + (hi - lo) * u_yaw)
    time_remaining = jnp.where(
        zero_start, cfg.time_limit,
        cfg.time_limit + (1.0 - cfg.time_limit) * u_time)
    speed = jnp.where(zero_start, 0.0,
                      cfg.max_initial_speed + (1.0 - cfg.max_initial_speed) * u_speed)
    move_angle = 2 * jnp.pi + (1.0 - 2 * jnp.pi) * u_angle
    if cfg.hover:
        speed = jnp.full(shape, 320.0, float_dtype)
        move_angle = jnp.full(shape, jnp.pi / 2, float_dtype)

    f32 = jnp.float32
    player = phys.PlayerState(
        z_pos=jnp.full(shape, INITIAL_STATE["z_pos"], float_dtype),
        vel_x=(speed * jnp.cos(move_angle)).astype(f32),
        vel_y=(speed * jnp.sin(move_angle)).astype(f32),
        vel_z=jnp.full(shape, INITIAL_STATE["vel"][2], f32),
        on_ground=jnp.zeros(shape, flag_dtype),
        jump_released=jnp.ones(shape, flag_dtype),
    )

    nk = cfg.num_keys
    return EnvState(
        player=player,
        yaw=yaw.astype(float_dtype),
        time_remaining=time_remaining.astype(float_dtype),
        zero_start=zero_start.astype(flag_dtype),
        last_keys=jnp.zeros((nk,) + shape, jnp.int32),
        last_key_press_time=jnp.full((nk,) + shape, -cfg.key_press_delay,
                                     float_dtype),
        rng=rng,
    )


def _draw_reset(cfg: Config, key, n: int, float_dtype):
    """Draw fresh episode-start state for n envs (reference env.py:428-455)."""
    k_zs, k_yaw, k_time, k_speed, k_angle, k_rng = jax.random.split(key, 6)
    u = lambda k: jax.random.uniform(k, (n,), float_dtype)
    return reset_from_uniforms(cfg, u(k_zs), u(k_yaw), u(k_time), u(k_speed),
                               u(k_angle), float_dtype, rng=k_rng)


def reset(cfg: Config, key, n: int, float_dtype=jnp.float32) -> EnvState:
    """Reset all n envs (reference VectorPhysEnv.vector_reset, env.py:428-455).

    ``float_dtype=float64`` gives the reference-parity mode (the reference
    keeps yaw/time/z_pos in float64); float32 is the TPU production mode.
    """
    return _draw_reset(cfg, key, n, jnp.dtype(float_dtype))


def step(cfg: Config, state: EnvState, key_actions, yaw_action,
         compute_observation: bool = True):
    """Advance all envs one frame (reference vector_step, env.py:482-510).

    No auto-reset — done envs keep their terminal state (callers either
    reset externally, as the reference's RLLib does via ``reset_at``, or use
    :func:`step_autoreset`).

    Args:
        key_actions: (K, N) int32 in {0, 1} — pressed keys.
        yaw_action: (N,) float — mouse action (see :func:`_decode`).
        compute_observation: skip the obs build (quantize + stack) when the
            caller recomputes obs from the carried state anyway, as the
            training rollout does.
    """
    player = state.player
    if cfg.hover:  # (reference env.py:483-485)
        player = player.replace(
            vel_z=jnp.zeros_like(player.vel_z),
            z_pos=jnp.full_like(player.z_pos, 100.0))

    (last_keys, last_kpt, yaw, smove, fmove, jump) = _decode(
        cfg, state.last_keys, state.last_key_press_time, state.yaw,
        key_actions, yaw_action, player.vel_z, state.time_remaining)

    fdtype = yaw.dtype
    inputs = phys.Inputs(
        yaw=yaw,
        pitch=jnp.zeros_like(yaw),
        roll=jnp.zeros_like(yaw),
        fmove=fmove,
        smove=smove,
        button2=jump,
        time_delta=jnp.asarray(cfg.time_delta, fdtype),
    )
    player = phys.apply(inputs, player)

    if cfg.speed_reward:
        reward = cfg.time_delta * jnp.sqrt(
            player.vel_x * player.vel_x + player.vel_y * player.vel_y)
    else:
        reward = cfg.time_delta * player.vel_y

    time_remaining = state.time_remaining - cfg.time_delta
    done = time_remaining < 0

    new_state = state.replace(
        player=player, yaw=yaw, time_remaining=time_remaining,
        last_keys=last_keys, last_key_press_time=last_kpt)

    obs = (compute_obs(cfg, player, yaw, time_remaining)
           if compute_observation else None)
    return new_state, StepResult(obs=obs, reward=reward, done=done,
                                 zero_start=state.zero_start)


def merge_reset(done, fresh: EnvState, current: EnvState, rng=None) -> EnvState:
    """Select ``fresh`` episode-start state where ``done``, else ``current``.

    (N,) ``done`` broadcasts against both (N,) and (K, N) leaves; the rng
    key is shared by the whole batch and carried forward unconditionally.
    Shared by :func:`step_autoreset` and the Pallas rollout kernels.
    """
    merge = lambda f, c: jnp.where(done, f, c)
    return EnvState(
        player=jax.tree.map(merge, fresh.player, current.player),
        yaw=merge(fresh.yaw, current.yaw),
        time_remaining=merge(fresh.time_remaining, current.time_remaining),
        zero_start=merge(fresh.zero_start, current.zero_start),
        last_keys=merge(fresh.last_keys, current.last_keys),
        last_key_press_time=merge(fresh.last_key_press_time,
                                  current.last_key_press_time),
        rng=rng if rng is not None else current.rng,
    )


def step_autoreset(cfg: Config, state: EnvState, key_actions, yaw_action,
                   compute_observation: bool = True, reset_uniforms=None):
    """Step, then re-draw any env whose episode finished.

    Replaces the reference's host-side ``reset_at`` path (env.py:457-480):
    episode boundaries stay staggered across the batch, and the returned
    ``StepResult`` carries the *pre-reset* reward/done/zero_start so episode
    metrics can be accumulated on-device.

    ``reset_uniforms``: optional (5, N) uniform-[0,1) draws to use for the
    re-draw instead of splitting the carried rng — deterministic injection
    for exact-parity testing of fused rollout kernels.
    """
    new_state, out = step(cfg, state, key_actions, yaw_action,
                          compute_observation=compute_observation)
    if reset_uniforms is None:
        rng, reset_key = jax.random.split(new_state.rng)
        fresh = _draw_reset(cfg, reset_key, state.num_envs, state.yaw.dtype)
    else:
        rng = new_state.rng
        fresh = reset_from_uniforms(cfg, *reset_uniforms,
                                    float_dtype=state.yaw.dtype)
    return merge_reset(out.done, fresh, new_state, rng=rng), out
