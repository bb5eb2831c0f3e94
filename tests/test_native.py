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


def test_cpp_demo_parser_cross_validates_python_protocol(tmp_path):
    """Protocol triangulation (VERDICT r3 missing-item 2): the bytes our
    .dem writer emits are parsed by the INDEPENDENT C++ protocol
    implementation (native/demparse.cpp, written from the engine message
    format) and must (a) agree exactly with utils.demfile.parse_demo and
    (b) round-trip the original trajectory within wire quantization
    (coords are 13.3 fixed point -> 1/16 unit max rounding error)."""
    import numpy as np

    from q1physrl_tpu import native
    from q1physrl_tpu.utils import demfile

    if not native.dem_available():  # pragma: no cover - g++ baked in
        import pytest

        pytest.skip("C++ toolchain unavailable")

    rng = np.random.default_rng(7)
    t = 200
    times = 1.3 + np.arange(t) / 72.0
    origins = np.cumsum(rng.uniform(-3, 5, (t, 3)), axis=0)
    origins[:, 2] += 32.0
    yaws = np.cumsum(rng.uniform(-2, 2, t)) + 90.0
    finish = float(times[150])

    path = str(tmp_path / "cross.dem")
    demfile.write_demo(path, times, origins, yaws, finish_time=finish)

    ct, co, cy, cf = native.parse_demo(path)
    pt, po, py, pf = demfile.parse_demo(path)

    # (a) Independent reader == Python reader, bit-exact.
    np.testing.assert_array_equal(ct, pt)
    np.testing.assert_array_equal(co, np.asarray(po, np.float32))
    np.testing.assert_array_equal(cy, np.asarray(py, np.float32))
    assert cf == pf

    # (b) Independent reader recovers the physical trajectory: times exact
    # (f32), origins within 13.3 fixed-point rounding, yaw exact (f32 view
    # angles in the block header).  Origins lag one frame BY PROTOCOL:
    # a datagram is [svc_time, updates...], and a parser records the
    # accumulated origin when TIME arrives — i.e. the previous datagram's
    # updates (the reference's pyquake-based parser has the identical
    # semantics, reference analyse.py:59-66); record 0 carries the
    # baseline, which our writer seeds with the first origin.
    np.testing.assert_allclose(ct, times, rtol=0, atol=1e-5)
    np.testing.assert_allclose(co[0], origins[0], rtol=0, atol=1 / 16 + 1e-6)
    np.testing.assert_allclose(co[1:], origins[:-1], rtol=0,
                               atol=1 / 16 + 1e-6)
    np.testing.assert_allclose(cy, yaws.astype(np.float32), rtol=1e-6)
    assert abs(cf - finish) < 1e-5


def test_cpp_demo_parser_on_shipped_artifact():
    """The committed 100m demo parses identically through both protocol
    implementations (same walk as reference analyse.py:34-68)."""
    import numpy as np

    from q1physrl_tpu import native
    from q1physrl_tpu.utils import demfile

    if not native.dem_available():  # pragma: no cover
        import pytest

        pytest.skip("C++ toolchain unavailable")

    ct, co, cy, cf = native.parse_demo("data/demos/tpu_pb_100m.dem")
    pt, po, py, pf = demfile.parse_demo("data/demos/tpu_pb_100m.dem")
    assert len(ct) == len(pt) == 720
    np.testing.assert_array_equal(ct, pt)
    np.testing.assert_array_equal(co, np.asarray(po, np.float32))
    np.testing.assert_array_equal(cy, np.asarray(py, np.float32))
    assert cf == pf and cf is not None
