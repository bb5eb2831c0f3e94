"""Golden-trajectory test: replays a recorded reference episode without
needing /root/reference mounted (the recording was produced by the
reference implementation; see git history for the generator).

This is the portable form of the live-oracle parity tests in test_env.py.
"""

import os

import jax.numpy as jnp
import numpy as np

from q1physrl_tpu import env as tenv
from q1physrl_tpu import phys

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "scripted_episode.npz")

PARAMS_YML_CONFIG = dict(
    action_range=10.0, allow_jump=True, allow_yaw=True, auto_jump=False,
    discrete_yaw_steps=-1, fmove_max=800.0, smove_max=1060.0, hover=False,
    initial_yaw_range=(0.0, 360.0), key_press_delay=0.3,
    max_initial_speed=700.0, smooth_keys=True, speed_reward=False,
    time_delta=0.013888888888888, time_limit=10.0, zero_start_prob=1.0,
)


def test_golden_episode_replay():
    g = np.load(GOLDEN)
    cfg = tenv.Config(**PARAMS_YML_CONFIG, num_envs=None)
    n = g["state0_yaw"].shape[0]

    state = tenv.reset(cfg, __import__("jax").random.key(0), n, jnp.float64)
    state = state.replace(
        player=phys.PlayerState(
            z_pos=jnp.asarray(g["state0_z_pos"], jnp.float64),
            vel_x=jnp.asarray(g["state0_vel"][:, 0]),
            vel_y=jnp.asarray(g["state0_vel"][:, 1]),
            vel_z=jnp.asarray(g["state0_vel"][:, 2]),
            on_ground=jnp.asarray(g["state0_on_ground"]),
            jump_released=jnp.asarray(g["state0_jump_released"])),
        yaw=jnp.asarray(g["state0_yaw"], jnp.float64),
        time_remaining=jnp.asarray(g["state0_time_remaining"], jnp.float64),
        zero_start=jnp.asarray(g["state0_zero_start"]),
        last_keys=jnp.zeros_like(state.last_keys),
        last_key_press_time=jnp.full_like(state.last_key_press_time,
                                          -cfg.key_press_delay),
    )

    import functools

    import jax

    step = functools.partial(jax.jit, static_argnums=0)(tenv.step)
    max_err = 0.0
    for t in range(g["obs"].shape[0]):
        state, out = step(cfg, state,
                          jnp.asarray(g["key_actions"][t]),
                          jnp.asarray(g["yaw_actions"][t], jnp.float64))
        max_err = max(max_err, float(np.abs(np.asarray(out.obs)
                                            - g["obs"][t]).max()))
        np.testing.assert_array_equal(np.asarray(out.done), g["done"][t])
        np.testing.assert_allclose(np.asarray(out.reward), g["reward"][t],
                                   rtol=0, atol=2e-5)
    assert max_err < 2e-5, max_err
