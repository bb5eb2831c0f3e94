"""Quake 1 player-movement physics as pure JAX functions.

Semantics follow the original Quake engine code (sv_user.c, sv_phys.c,
client.qc, mathlib.c) as mirrored by the reference implementation
(/root/reference/q1physrl_env/q1physrl_env/phys.py:47-197), but the design is
TPU-first:

- **Structure-of-arrays**: velocity is stored as three separate ``(N,)``
  arrays instead of an ``(N, 3)`` array.  On TPU a minor dimension of 3 wastes
  125/128 vector lanes; flat per-component arrays vectorize perfectly on the
  VPU and shard trivially over a device mesh.
- **Dtype-polymorphic**: every op computes in the dtype of its operands and
  only casts where the reference's in-place NumPy assignments truncate
  (``vel`` stays float32 while intermediates may be float64).  This gives two
  modes from one code path: a float64 "parity" mode that reproduces the
  reference bit-for-bit-modulo-libm, and a pure-float32 TPU mode.
- **Pure functions**: ``apply(inputs, state) -> state`` has no hidden state,
  so it composes with ``jit`` / ``vmap`` / ``lax.scan`` / ``shard_map``.

All functions operate on a leading env axis (or on scalars — they are
shape-polymorphic elementwise ops).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = (
    "Inputs",
    "PlayerState",
    "apply",
    "MAX_SPEED",
    "ACCELERATE",
    "FRICTION",
    "STOP_SPEED",
    "JUMP_SPEED",
    "GRAVITY",
    "FLOOR_HEIGHT",
)


# Quake engine physics constants (see reference phys.py:47-53; originally from
# quakespasm's sv_user.c / sv_phys.c cvar defaults and the 100m map geometry).
# Python floats are weakly typed in JAX: they adopt the dtype of the array
# they combine with, which is what keeps this module dtype-polymorphic.
MAX_SPEED = 320.0
ACCELERATE = 10.0
FRICTION = 4.0
STOP_SPEED = 100.0
JUMP_SPEED = 270.0
GRAVITY = 800.0
FLOOR_HEIGHT = 24.03125  # 24 + DIST_EPSILON; exactly representable in binary.


@struct.dataclass
class Inputs:
    """Per-frame player inputs, as sent over the Quake network layer.

    Mirrors reference phys.py:135-153 but in SoA form.  ``time_delta`` may be
    a scalar (broadcast) or a per-env array.
    """

    yaw: jnp.ndarray
    pitch: jnp.ndarray
    roll: jnp.ndarray
    fmove: jnp.ndarray
    smove: jnp.ndarray
    button2: jnp.ndarray  # bool: jump held
    time_delta: jnp.ndarray

    @classmethod
    def from_df(cls, df):
        return cls(
            yaw=np.asarray(df.yaw), pitch=np.asarray(df.pitch), roll=np.asarray(df.roll),
            fmove=np.asarray(df.fmove), smove=np.asarray(df.smove),
            button2=np.asarray(df.button2) > 0,
            time_delta=np.asarray(df.host_frametime),
        )

    def to_df(self):
        import pandas as pd

        return pd.DataFrame({
            "yaw": np.asarray(self.yaw), "pitch": np.asarray(self.pitch),
            "roll": np.asarray(self.roll), "fmove": np.asarray(self.fmove),
            "smove": np.asarray(self.smove), "button2": np.asarray(self.button2),
            "host_frametime": np.broadcast_to(np.asarray(self.time_delta), np.shape(self.yaw)),
        })


@struct.dataclass
class PlayerState:
    """Player movement state (SoA).  Mirrors reference phys.py:156-181.

    ``vel_x``/``vel_y``/``vel_z`` replace the reference's ``vel (N, 3)``
    array; use :meth:`vel3` / :meth:`from_vel3` to convert.
    """

    z_pos: jnp.ndarray
    vel_x: jnp.ndarray
    vel_y: jnp.ndarray
    vel_z: jnp.ndarray
    on_ground: jnp.ndarray  # bool
    jump_released: jnp.ndarray  # bool

    def vel3(self):
        """Velocity as an (N, 3) array (host-side convenience)."""
        return np.stack([np.asarray(self.vel_x), np.asarray(self.vel_y),
                         np.asarray(self.vel_z)], axis=-1)

    @classmethod
    def from_vel3(cls, z_pos, vel, on_ground, jump_released):
        vel = jnp.asarray(vel)
        return cls(z_pos=jnp.asarray(z_pos), vel_x=vel[..., 0], vel_y=vel[..., 1],
                   vel_z=vel[..., 2], on_ground=jnp.asarray(on_ground),
                   jump_released=jnp.asarray(jump_released))

    @classmethod
    def from_df(cls, df):
        return cls(
            z_pos=np.asarray(df.z),
            vel_x=np.asarray(df.velx), vel_y=np.asarray(df.vely), vel_z=np.asarray(df.velz),
            on_ground=np.asarray(df.onground) > 0,
            jump_released=np.asarray(df.jumpreleased) > 0,
        )

    def to_df(self):
        import pandas as pd

        return pd.DataFrame({
            "z": np.asarray(self.z_pos),
            "velx": np.asarray(self.vel_x), "vely": np.asarray(self.vel_y),
            "velz": np.asarray(self.vel_z),
            "onground": np.asarray(self.on_ground),
            "jumpreleased": np.asarray(self.jump_released),
        })

    @classmethod
    def concatenate(cls, states):
        return cls(*(jnp.concatenate([getattr(s, f) for s in states])
                     for f in ("z_pos", "vel_x", "vel_y", "vel_z", "on_ground",
                               "jump_released")))


def angle_vectors(yaw, pitch, roll):
    """View angles (degrees) -> forward/right basis vectors, z row dropped.

    Port of mathlib.c:AngleVectors semantics (reference phys.py:56-66).
    Returns ``(f_x, f_y, r_x, r_y)`` where wish velocity is
    ``(f_x*fmove + r_x*smove, f_y*fmove + r_y*smove)``.
    """
    rad = jnp.pi / 180.0
    sy, cy = jnp.sin(yaw * rad), jnp.cos(yaw * rad)
    sp, cp = jnp.sin(pitch * rad), jnp.cos(pitch * rad)
    sr, cr = jnp.sin(roll * rad), jnp.cos(roll * rad)
    f_x = cp * cy
    f_y = cp * sy
    r_x = -sr * sp * cy + cr * sy
    r_y = -sr * sp * sy - cr * cy
    return f_x, f_y, r_x, r_y


def accelerate(vel_x, vel_y, wish_speed, wish_dir_x, wish_dir_y, on_ground, time_delta):
    """sv_user.c:SV_Accelerate / SV_AirAccelerate (reference phys.py:69-80).

    Airborne wish speed is clipped to 30 — the strafe-jumping exploit core:
    the *acceleration magnitude* still uses the unclipped wish speed, so a
    wish direction nearly perpendicular to the velocity keeps
    ``current_speed`` below the 30-unit clip and lets speed grow unboundedly.
    """
    current_speed = vel_x * wish_dir_x + vel_y * wish_dir_y
    clipped_wish_speed = jnp.where((wish_speed > 30) & ~on_ground, 30, wish_speed)
    add_speed = jnp.maximum(0, clipped_wish_speed - current_speed)
    accel_speed = jnp.minimum(ACCELERATE * time_delta * wish_speed, add_speed)
    return vel_x + accel_speed * wish_dir_x, vel_y + accel_speed * wish_dir_y


def user_friction(vel_x, vel_y, time_delta):
    """sv_user.c:SV_UserFriction (reference phys.py:83-90)."""
    speed = jnp.sqrt(vel_x * vel_x + vel_y * vel_y)
    control = jnp.maximum(speed, STOP_SPEED)
    new_speed = jnp.maximum(0, speed - time_delta * control * FRICTION)
    ratio = new_speed / speed
    keep = speed > 0
    return jnp.where(keep, vel_x * ratio, vel_x), jnp.where(keep, vel_y * ratio, vel_y)


def air_move(yaw, pitch, roll, fmove, smove, on_ground, time_delta, vel_x, vel_y):
    """sv_user.c:SV_AirMove (reference phys.py:93-109): horizontal update."""
    f_x, f_y, r_x, r_y = angle_vectors(yaw, pitch, roll)
    wish_x = f_x * fmove + r_x * smove
    wish_y = f_y * fmove + r_y * smove
    unclipped_wish_speed = jnp.sqrt(wish_x * wish_x + wish_y * wish_y)
    nonzero = unclipped_wish_speed > 0
    wish_dir_x = jnp.where(nonzero, wish_x / unclipped_wish_speed, wish_x)
    wish_dir_y = jnp.where(nonzero, wish_y / unclipped_wish_speed, wish_y)
    wish_speed = jnp.minimum(MAX_SPEED, unclipped_wish_speed)

    fric_x, fric_y = user_friction(vel_x, vel_y, time_delta)
    vel_x = jnp.where(on_ground, fric_x, vel_x)
    vel_y = jnp.where(on_ground, fric_y, vel_y)
    return accelerate(vel_x, vel_y, wish_speed, wish_dir_x, wish_dir_y,
                      on_ground, time_delta)


def do_z_physics(jump_pressed, time_delta, z_pos, z_vel, on_ground, jump_released):
    """Jump latch + gravity + single-plane fly-move (reference phys.py:112-132).

    Jump logic from client.qc:PlayerJump; gravity from sv_phys.c:SV_AddGravity;
    floor clamp is the reference's simplified sv_phys.c:SV_FlyMove (known
    ~1e-2 deviation from the real engine's stop-above-ground behaviour).
    """
    z_dtype = jnp.asarray(z_vel).dtype
    jump_released = jump_released | ~jump_pressed
    do_jump = on_ground & jump_pressed & jump_released
    z_vel = z_vel + do_jump * jnp.asarray(JUMP_SPEED, z_dtype)
    # The reference subtracts gravity in-place into a float32 array while
    # time_delta may be float64; mirror that promotion-then-truncation.
    z_vel = (z_vel - GRAVITY * time_delta).astype(z_dtype)
    z_pos = z_pos + time_delta * z_vel
    on_ground = z_pos < FLOOR_HEIGHT
    z_pos = jnp.where(on_ground, FLOOR_HEIGHT, z_pos)
    z_vel = jnp.where(on_ground, 0, z_vel)
    return z_pos, z_vel, on_ground, jump_released


def apply(inputs: Inputs, player_state: PlayerState) -> PlayerState:
    """Advance the player state by one frame (reference phys.py:184-197).

    The horizontal update runs first using the *pre-step* ``on_ground`` flag,
    then the vertical update — matching the engine's frame ordering.
    """
    v_dtype = jnp.asarray(player_state.vel_x).dtype
    vel_x, vel_y = air_move(
        inputs.yaw, inputs.pitch, inputs.roll, inputs.fmove, inputs.smove,
        player_state.on_ground, inputs.time_delta,
        player_state.vel_x, player_state.vel_y)
    # Mirror the reference's in-place assignment into the float32 vel array.
    vel_x = vel_x.astype(v_dtype)
    vel_y = vel_y.astype(v_dtype)

    z_pos, vel_z, on_ground, jump_released = do_z_physics(
        inputs.button2, inputs.time_delta, player_state.z_pos,
        player_state.vel_z, player_state.on_ground, player_state.jump_released)

    return PlayerState(z_pos=z_pos, vel_x=vel_x, vel_y=vel_y,
                       vel_z=vel_z.astype(v_dtype), on_ground=on_ground,
                       jump_released=jump_released)
