"""Environment + action-decoder parity tests against the reference
VectorPhysEnv / ActionDecoder (oracle imported from /root/reference).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from q1physrl_tpu import env as tenv
from q1physrl_tpu import phys
from tests._reference import load_reference

ref_phys, ref_env = load_reference()


PARAMS_YML_CONFIG = dict(
    action_range=10.0,
    allow_jump=True,
    allow_yaw=True,
    auto_jump=False,
    discrete_yaw_steps=-1,
    fmove_max=800.0,
    smove_max=1060.0,
    hover=False,
    initial_yaw_range=(0.0, 360.0),
    key_press_delay=0.3,
    max_initial_speed=700.0,
    smooth_keys=True,
    speed_reward=False,
    time_delta=0.013888888888888,
    time_limit=10.0,
    zero_start_prob=1.0,  # deterministic zero start for parity runs
)


def make_configs(num_envs, **overrides):
    d = dict(PARAMS_YML_CONFIG, num_envs=num_envs, **overrides)
    return tenv.Config(**d), ref_env.Config(**d)


def scripted_actions(t, n, cfg, rng):
    """Reference-format action batch: env i goes forward for 100+20*i frames,
    then strafes left with mouse -2; jump pressed on a per-env cadence."""
    acts = []
    for i in range(n):
        keys = np.zeros(cfg.num_keys)
        if t < 100 + 20 * i:
            keys[tenv.Key.FORWARD] = 1
            mouse = 0.0
        else:
            keys[tenv.Key.STRAFE_LEFT] = 1
            mouse = -2.0
        if cfg.has_jump_action and (t % (7 + i)) < 2:
            keys[tenv.Key.JUMP] = 1
        a = list(keys)
        if cfg.allow_yaw:
            if cfg.discrete_yaw_steps == -1:
                a.append(np.array([mouse], np.float32))
            else:
                a.append(int(rng.integers(0, 2 * cfg.discrete_yaw_steps + 1)))
        acts.append(a)
    return acts


def sync_our_env_to_ref(our, ref):
    """Copy the reference env's post-reset state into our env (removes RNG
    from the comparison; both impls then evolve deterministically).

    NB: must deep-copy — jnp.asarray can zero-copy alias NumPy buffers on
    CPU, and the reference env mutates its arrays in place.
    """
    cp = lambda x, dt=None: jnp.array(np.array(x, dtype=dt, copy=True))
    s = our._state
    our._state = s.replace(
        player=phys.PlayerState(
            z_pos=cp(ref.player_state.z_pos, np.float64),
            vel_x=cp(ref.player_state.vel[:, 0]),
            vel_y=cp(ref.player_state.vel[:, 1]),
            vel_z=cp(ref.player_state.vel[:, 2]),
            on_ground=cp(ref.player_state.on_ground),
            jump_released=cp(ref.player_state.jump_released)),
        yaw=cp(ref._yaw, np.float64),
        time_remaining=cp(ref._time_remaining, np.float64),
        zero_start=cp(ref._zero_start),
        last_keys=jnp.zeros_like(s.last_keys),
        last_key_press_time=jnp.full_like(s.last_key_press_time,
                                          -our._config.key_press_delay),
    )


def run_parity_episode(n, steps=None, seed=3, **overrides):
    cfg, rcfg = make_configs(n, **overrides)
    ref = ref_env.VectorPhysEnv(rcfg)
    our = tenv.VectorPhysEnv(cfg, seed=0, float_dtype=np.float64)
    sync_our_env_to_ref(our, ref)

    obs_r = ref._get_obs()
    obs_o = our._get_obs()
    np.testing.assert_allclose(obs_o, obs_r, rtol=0, atol=1e-12)

    rng = np.random.default_rng(seed)
    if steps is None:
        steps = int(cfg.time_limit / cfg.time_delta) + 2
    max_err = 0.0
    for t in range(steps):
        acts = scripted_actions(t, n, cfg, rng)
        ro, rr, rd, ri = ref.vector_step(acts)
        oo, orr, od, oi = our.vector_step(acts)
        np.testing.assert_array_equal(od, rd)
        err = max(np.max(np.abs(oo - ro)), np.max(np.abs(orr - rr)))
        max_err = max(max_err, float(err))
        assert err < 2e-5, (
            t, err, "obs_ref", ro, "obs_our", oo,
            "t_ref", ref._time_remaining, "t_our", our._time_remaining)
        if np.all(rd):
            break
    return max_err


def test_scripted_episode_matches_reference():
    """Full-episode obs/reward/done parity on the params.yml config."""
    err = run_parity_episode(n=4)
    # Bit-level agreement modulo float32 libm ULPs.
    assert err < 2e-5


@pytest.mark.parametrize("overrides", [
    dict(auto_jump=True),
    dict(allow_jump=False),
    dict(allow_yaw=False),
    dict(discrete_yaw_steps=3),
    dict(smooth_keys=False),
    dict(hover=True),
    dict(speed_reward=True),
    dict(key_press_delay=0.05),
    dict(time_delta=0.014, time_limit=5.0),
])
def test_config_matrix_matches_reference(overrides):
    run_parity_episode(n=3, steps=150, **overrides)


def test_randomized_resets_match_reference():
    """Inject the reference's randomized reset state and compare rollouts."""
    np.random.seed(1234)
    cfg, rcfg = make_configs(8, zero_start_prob=0.25)
    ref = ref_env.VectorPhysEnv(rcfg)
    our = tenv.VectorPhysEnv(cfg, float_dtype=np.float64)
    sync_our_env_to_ref(our, ref)
    rng = np.random.default_rng(9)
    for t in range(100):
        acts = scripted_actions(t, 8, cfg, rng)
        ro, rr, rd, ri = ref.vector_step(acts)
        oo, orr, od, oi = our.vector_step(acts)
        np.testing.assert_array_equal(od, rd)
        assert [d["zero_start"] for d in oi] == [bool(d["zero_start"]) for d in ri]
        np.testing.assert_allclose(oo, ro, rtol=0, atol=2e-5)


def test_decoder_matches_reference():
    """Drive both decoders with identical action streams; outputs must agree
    exactly (the decoder is pure integer/latch logic plus exact arithmetic)."""
    n = 5
    cfg, rcfg = make_configs(n)
    rdec = ref_env.ActionDecoder(rcfg)
    yaw0 = np.full(n, 90.0)
    rdec.vector_reset(yaw0.copy())

    last_keys = jnp.zeros((cfg.num_keys, n), jnp.int32)
    last_kpt = jnp.full((cfg.num_keys, n), -cfg.key_press_delay, jnp.float64)
    yaw = jnp.asarray(yaw0)

    rng = np.random.default_rng(7)
    time_remaining = np.full(n, cfg.time_limit)
    z_vel = np.zeros(n, np.float32)
    from q1physrl_tpu.env.core import _decode

    for t in range(200):
        # Adversarial stream: random key chords + random mouse.
        keys = rng.integers(0, 2, (n, cfg.num_keys))
        mouse = rng.uniform(-10, 10, n)
        acts = [[*keys[i], np.array([mouse[i]])] for i in range(n)]

        r_yaw, r_smove, r_fmove, r_jump = rdec.map(acts, z_vel, time_remaining)
        ka, ya = tenv.encode_actions(acts, cfg)
        last_keys, last_kpt, yaw, smove, fmove, jump = _decode(
            cfg, last_keys, last_kpt, yaw, jnp.asarray(ka), jnp.asarray(ya),
            jnp.asarray(z_vel), jnp.asarray(time_remaining))

        np.testing.assert_allclose(np.asarray(yaw), r_yaw, rtol=0, atol=1e-12)
        np.testing.assert_array_equal(np.asarray(smove), r_smove)
        np.testing.assert_array_equal(np.asarray(fmove), r_fmove)
        np.testing.assert_array_equal(np.asarray(jump), r_jump)
        time_remaining = time_remaining - cfg.time_delta
        z_vel = rng.uniform(-100, 100, n).astype(np.float32)


def test_autoreset_staggers_episodes():
    """step_autoreset re-draws finished envs in-place and keeps others."""
    cfg = tenv.Config(**dict(PARAMS_YML_CONFIG, num_envs=None,
                             zero_start_prob=0.0))
    n = 16
    state = tenv.reset(cfg, jax.random.key(0), n)
    # Force staggered clocks.
    state = state.replace(time_remaining=jnp.linspace(0.01, 1.0, n))
    ka = jnp.zeros((cfg.num_keys, n), jnp.int32)
    ya = jnp.zeros(n)
    step = jax.jit(tenv.step_autoreset, static_argnums=0)
    done_count = 0
    for _ in range(80):
        prev_t = np.asarray(state.time_remaining)
        state, out = step(cfg, state, ka, ya)
        done = np.asarray(out.done)
        done_count += done.sum()
        t = np.asarray(state.time_remaining)
        # Reset envs jump back up; others tick down by dt.
        np.testing.assert_allclose(t[~done], prev_t[~done] - cfg.time_delta,
                                   atol=1e-6)
        assert np.all(t[done] >= 0.9)  # fresh draws are in (1, 10]
    assert done_count >= n  # every env wrapped at least once


def test_zero_start_obs_value():
    """Zero-start first obs matches the known 100m spawn observation."""
    cfg = tenv.Config(**dict(PARAMS_YML_CONFIG, num_envs=None,
                             zero_start_prob=1.0))
    state = tenv.reset(cfg, jax.random.key(0), 2)
    obs = np.asarray(tenv.compute_obs(cfg, state.player, state.yaw,
                                      state.time_remaining))
    scale = np.asarray(tenv.get_obs_scale(cfg))
    expected = np.array([10.0, 90.0, np.round(32.84320068359375 * 8) / 8,
                         0.0, 0.0, 0.0]) / scale
    np.testing.assert_allclose(obs[0], expected, atol=1e-12)
    np.testing.assert_allclose(obs[1], expected, atol=1e-12)


def test_gymnasium_registration():
    import gymnasium

    e = gymnasium.make("Q1PhysEnv-v0")
    obs, info = e.reset(seed=0)
    assert obs.shape == (6,)
    total = 0.0
    for _ in range(30):
        obs, r, terminated, truncated, info = e.step(
            [1, 0, 1, 0, np.array([0.5], np.float32)])
        total += r
        assert not terminated
    assert np.isfinite(total)
