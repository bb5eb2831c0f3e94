"""Cross-validate the JAX physics against the independent C++ oracle
(native/qphys.cpp) — three implementations (reference NumPy, JAX, C++)
triangulate the movement semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from q1physrl_tpu import native, phys

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="C++ toolchain unavailable")


def rand_case(n, seed):
    rng = np.random.default_rng(seed)
    state = {
        "z_pos": rng.uniform(24.03125, 200, n),
        "vel_x": rng.uniform(-800, 800, n).astype(np.float32),
        "vel_y": rng.uniform(-800, 800, n).astype(np.float32),
        "vel_z": rng.uniform(-800, 800, n).astype(np.float32),
        "on_ground": rng.random(n) < 0.5,
        "jump_released": rng.random(n) < 0.5,
    }
    inputs = {
        "yaw": rng.uniform(-360, 720, n).astype(np.float32),
        "pitch": np.zeros(n, np.float32),
        "roll": np.zeros(n, np.float32),
        "fmove": rng.integers(-850, 851, n).astype(np.float32),
        "smove": rng.integers(-1100, 1101, n).astype(np.float32),
        "button2": rng.random(n) < 0.5,
        "time_delta": np.full(n, 1.0 / 72, np.float32),
    }
    return inputs, state


def to_jax(inputs, state):
    return (phys.Inputs(**{k: jnp.asarray(v) for k, v in inputs.items()}),
            phys.PlayerState(
                z_pos=jnp.asarray(state["z_pos"], jnp.float32),
                vel_x=jnp.asarray(state["vel_x"]),
                vel_y=jnp.asarray(state["vel_y"]),
                vel_z=jnp.asarray(state["vel_z"]),
                on_ground=jnp.asarray(state["on_ground"]),
                jump_released=jnp.asarray(state["jump_released"])))


def test_cpp_oracle_matches_jax_single_step():
    inputs, state = rand_case(4096, 0)
    cpp = native.apply(inputs, state)
    jin, jst = to_jax(inputs, state)
    out = phys.apply(jin, jst)
    np.testing.assert_allclose(np.asarray(out.vel_x), cpp["vel_x"],
                               rtol=1e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.vel_y), cpp["vel_y"],
                               rtol=1e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.vel_z), cpp["vel_z"],
                               rtol=1e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.z_pos), cpp["z_pos"],
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out.jump_released),
                                  cpp["jump_released"])
    # on_ground can flip only within a hair of the floor threshold.
    mism = np.asarray(out.on_ground) != cpp["on_ground"]
    assert mism.mean() < 1e-3


def test_cpp_oracle_trajectory_matches_jax():
    rng = np.random.default_rng(1)
    T = 720
    inputs = {
        "yaw": (90 + np.cumsum(rng.uniform(-2, 2, T))).astype(np.float32),
        "pitch": np.zeros(T, np.float32),
        "roll": np.zeros(T, np.float32),
        "fmove": np.where(np.arange(T) < 100, 800, 0).astype(np.float32),
        "smove": np.where(np.arange(T) < 100, 0, -1060).astype(np.float32),
        "button2": (np.arange(T) % 7 < 2),
        "time_delta": np.full(T, 1.0 / 72, np.float32),
    }
    state0 = {"z_pos": 32.84320068359375, "vel_x": 0.0, "vel_y": 0.0,
              "vel_z": -12.0, "on_ground": False, "jump_released": True}
    cpp = native.trajectory(inputs, state0)

    jst = phys.PlayerState(
        z_pos=jnp.asarray([state0["z_pos"]], jnp.float32),
        vel_x=jnp.zeros(1, jnp.float32), vel_y=jnp.zeros(1, jnp.float32),
        vel_z=jnp.asarray([-12.0], jnp.float32),
        on_ground=jnp.asarray([False]), jump_released=jnp.asarray([True]))
    import jax

    def body(st, ins):
        out = phys.apply(phys.Inputs(**ins), st)
        return out, (out.z_pos, out.vel_x, out.vel_y, out.vel_z)

    ins_seq = {k: jnp.asarray(v)[:, None] for k, v in inputs.items()}
    _, (z, vx, vy, vz) = jax.jit(
        lambda s: jax.lax.scan(body, s, ins_seq))(jst)

    np.testing.assert_allclose(np.asarray(vy)[:, 0], cpp["vel_y"], atol=0.5)
    np.testing.assert_allclose(np.asarray(vx)[:, 0], cpp["vel_x"], atol=0.5)
    np.testing.assert_allclose(np.asarray(z)[:, 0], cpp["z_pos"], atol=0.5)
