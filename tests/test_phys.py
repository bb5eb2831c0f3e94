"""Physics-core parity tests against the reference NumPy implementation.

The reference (oracle) is imported directly from /root/reference; our JAX
implementation runs in float64 "parity" mode (mirroring the reference's
mixed float32/float64 arithmetic) and must agree to within a few ULPs —
boolean/latch logic must agree exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from q1physrl_tpu import phys
from tests._reference import load_reference

ref_phys, _ = load_reference()

import jax

jit_apply = jax.jit(phys.apply)


def random_state(rng, n, ref=True):
    z_pos = rng.uniform(24.03125, 200, n)  # float64, as after the first ref step
    vel = rng.uniform(-800, 800, (n, 3)).astype(np.float32)
    on_ground = rng.random(n) < 0.5
    # Grounded players sit exactly on the floor half the time.
    z_pos = np.where(on_ground & (rng.random(n) < 0.5), 24.03125, z_pos)
    jump_released = rng.random(n) < 0.5
    return z_pos, vel, on_ground, jump_released


def random_inputs(rng, n, with_pitch_roll=False):
    yaw = rng.uniform(-360, 720, n)  # float64
    if with_pitch_roll:
        pitch = rng.uniform(-90, 90, n)
        roll = rng.uniform(-180, 180, n)
    else:
        pitch = np.zeros(n)
        roll = np.zeros(n)
    fmove = np.float64(rng.integers(-850, 851, n))
    smove = np.float64(rng.integers(-1100, 1101, n))
    button2 = rng.random(n) < 0.5
    time_delta = np.full(n, 1.0 / 72)
    return yaw, pitch, roll, fmove, smove, button2, time_delta


def to_ours(z_pos, vel, on_ground, jump_released):
    return phys.PlayerState(
        z_pos=jnp.asarray(z_pos, jnp.float64),
        vel_x=jnp.asarray(vel[:, 0]), vel_y=jnp.asarray(vel[:, 1]),
        vel_z=jnp.asarray(vel[:, 2]),
        on_ground=jnp.asarray(on_ground), jump_released=jnp.asarray(jump_released))


def to_ref(z_pos, vel, on_ground, jump_released):
    return ref_phys.PlayerState(z_pos.copy(), vel.copy(), on_ground.copy(),
                                jump_released.copy())


def assert_states_match(ours: phys.PlayerState, ref, atol=1e-9):
    np.testing.assert_allclose(np.asarray(ours.z_pos), ref.z_pos,
                               rtol=1e-12, atol=atol)
    np.testing.assert_allclose(ours.vel3(), ref.vel, rtol=1e-5, atol=atol)
    np.testing.assert_array_equal(np.asarray(ours.on_ground), ref.on_ground)
    np.testing.assert_array_equal(np.asarray(ours.jump_released), ref.jump_released)


@pytest.mark.parametrize("with_pitch_roll", [False, True])
def test_apply_single_step_matches_reference(with_pitch_roll):
    rng = np.random.default_rng(0)
    n = 4096
    st = random_state(rng, n)
    inp = random_inputs(rng, n, with_pitch_roll)

    ref_out = ref_phys.apply(ref_phys.Inputs(*inp), to_ref(*st))
    our_out = phys.apply(
        phys.Inputs(yaw=inp[0], pitch=inp[1], roll=inp[2], fmove=inp[3],
                    smove=inp[4], button2=inp[5], time_delta=inp[6]),
        to_ours(*st))
    assert_states_match(our_out, ref_out)


def test_apply_trajectory_matches_reference():
    """720 frames (one full 10s episode at 72fps) of strafing inputs."""
    rng = np.random.default_rng(1)
    n = 64
    st = random_state(rng, n)
    ref_state = to_ref(*st)
    our_state = to_ours(*st)

    max_vel_err = 0.0
    for t in range(720):
        inp = random_inputs(rng, n)
        ref_state = ref_phys.apply(ref_phys.Inputs(*inp), ref_state)
        our_state = jit_apply(
            phys.Inputs(yaw=inp[0], pitch=inp[1], roll=inp[2], fmove=inp[3],
                        smove=inp[4], button2=inp[5], time_delta=inp[6]),
            our_state)
        max_vel_err = max(max_vel_err,
                          float(np.max(np.abs(our_state.vel3() - ref_state.vel))))
    assert_states_match(our_state, ref_state, atol=1e-5)
    # Transient per-step deviation stays at the ~1-float32-ULP level (libm
    # sin/sqrt differ from XLA's by 1 ULP; velocities are float32).
    assert max_vel_err < 1e-4, max_vel_err


def test_jump_latch_semantics():
    """Jump fires only on_ground & pressed & (released since last jump)."""
    # env 0: grounded, pressed, released -> jumps
    # env 1: grounded, pressed, not released -> no jump
    # env 2: airborne, pressed, released -> no jump
    # env 3: grounded, not pressed, not released -> latch re-arms
    z_pos = np.full(4, 24.03125)
    vel = np.zeros((4, 3), np.float32)
    on_ground = np.array([True, True, False, True])
    jump_released = np.array([True, False, True, False])
    button2 = np.array([True, True, True, False])

    inp = phys.Inputs(yaw=np.zeros(4), pitch=np.zeros(4), roll=np.zeros(4),
                      fmove=np.zeros(4), smove=np.zeros(4), button2=button2,
                      time_delta=np.full(4, 1.0 / 72))
    out = phys.apply(inp, to_ours(z_pos, vel, on_ground, jump_released))
    # Post-gravity z velocity of a successful jump: 270 - 800/72.
    expected = np.float32(270) - np.float32(800 * (1.0 / 72))
    got_zvel_preclamp = np.asarray(out.vel_z)
    # env 0 leaves the ground with jump speed (not clamped to floor).
    assert not out.on_ground[0]
    np.testing.assert_allclose(got_zvel_preclamp[0], expected, rtol=1e-6)
    # envs 1-3 stay grounded with zeroed z velocity.
    assert np.all(np.asarray(out.on_ground)[1:])
    np.testing.assert_array_equal(got_zvel_preclamp[1:], 0)
    # Latch: releasing the key re-arms (env 3), holding it does not (env 1).
    np.testing.assert_array_equal(np.asarray(out.jump_released),
                                  [True, False, True, True])


def test_air_wish_speed_clip():
    """Airborne wish speed clips to 30 but acceleration magnitude doesn't --
    the strafe-jumping exploit (reference phys.py:73-78)."""
    vel_x = jnp.asarray(np.array([500.0], np.float32))
    vel_y = jnp.asarray(np.array([0.0], np.float32))
    # Wish dir perpendicular to velocity: current_speed = 0, so
    # add_speed = clipped 30, and the accel cap 10*dt*320 = 44.4 uses the
    # UNclipped wish speed -> the full 30 units are added sideways despite
    # already moving at 500 ups.
    ax, ay = phys.accelerate(vel_x, vel_y, jnp.asarray([320.0]),
                             jnp.asarray([0.0]), jnp.asarray([1.0]),
                             jnp.asarray([False]), 1.0 / 72)
    np.testing.assert_allclose(float(ay[0]), 30.0, rtol=1e-6)
    # Wish dir parallel: current_speed = 500 > clipped 30 -> no accel.
    ax, ay = phys.accelerate(vel_x, vel_y, jnp.asarray([320.0]),
                             jnp.asarray([1.0]), jnp.asarray([0.0]),
                             jnp.asarray([False]), 1.0 / 72)
    np.testing.assert_allclose(float(ax[0]), 500.0, rtol=1e-6)


def test_float32_mode_stays_close():
    """Pure-float32 (TPU) mode tracks the float64 parity mode closely over a
    short horizon.  (Over full episodes the obs-quantization makes the two
    agree on what an agent actually sees; divergence is chaotic beyond that.)
    """
    rng = np.random.default_rng(2)
    n = 128
    z_pos, vel, on_ground, jump_released = random_state(rng, n)

    st64 = to_ours(z_pos, vel, on_ground, jump_released)
    st32 = phys.PlayerState(
        z_pos=jnp.asarray(z_pos, jnp.float32),
        vel_x=jnp.asarray(vel[:, 0]), vel_y=jnp.asarray(vel[:, 1]),
        vel_z=jnp.asarray(vel[:, 2]),
        on_ground=jnp.asarray(on_ground), jump_released=jnp.asarray(jump_released))

    for _ in range(100):
        inp = random_inputs(rng, n)
        mk = lambda dt: phys.Inputs(
            yaw=jnp.asarray(inp[0], dt), pitch=jnp.asarray(inp[1], dt),
            roll=jnp.asarray(inp[2], dt), fmove=jnp.asarray(inp[3], dt),
            smove=jnp.asarray(inp[4], dt), button2=jnp.asarray(inp[5]),
            time_delta=jnp.asarray(1.0 / 72, dt))
        st64 = phys.apply(mk(jnp.float64), st64)
        st32 = phys.apply(mk(jnp.float32), st32)

    assert np.max(np.abs(st32.vel3() - st64.vel3())) < 0.5
    assert np.max(np.abs(np.asarray(st32.z_pos) - np.asarray(st64.z_pos))) < 0.5
