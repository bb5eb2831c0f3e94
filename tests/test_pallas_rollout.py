"""Parity test for the fused Pallas rollout kernel (interpret mode on CPU)
against a lax.scan of core.step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from q1physrl_tpu import env as qenv
from q1physrl_tpu.env import core
from q1physrl_tpu.ops.env_rollout_pallas import rollout_actions


def test_rollout_actions_matches_scan():
    cfg = dataclasses.replace(qenv.Config.get_default(), num_envs=None)
    n, t = 256, 40
    state = core.reset(cfg, jax.random.key(0), n, jnp.float32)

    rng = np.random.default_rng(0)
    ka = jnp.asarray(rng.integers(0, 2, (t, cfg.num_keys, n)), jnp.int32)
    ya = jnp.asarray(rng.uniform(-10, 10, (t, n)), jnp.float32)

    def body(st, xs):
        k, y = xs
        st, out = core.step(cfg, st, k, y, compute_observation=False)
        return st, (out.reward, out.done)

    ref_state, (ref_r, ref_d) = jax.jit(
        lambda s: jax.lax.scan(body, s, (ka, ya)))(state)

    new_state, rewards, dones = rollout_actions(cfg, state, ka, ya,
                                                block_envs=128,
                                                interpret=True)

    np.testing.assert_allclose(np.asarray(rewards), np.asarray(ref_r),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(dones), np.asarray(ref_d))
    for name in ("vel_x", "vel_y", "vel_z", "z_pos"):
        np.testing.assert_allclose(
            np.asarray(getattr(new_state.player, name)),
            np.asarray(getattr(ref_state.player, name)),
            rtol=1e-5, atol=1e-3, err_msg=name)
    np.testing.assert_array_equal(np.asarray(new_state.player.on_ground),
                                  np.asarray(ref_state.player.on_ground))
    np.testing.assert_allclose(np.asarray(new_state.yaw),
                               np.asarray(ref_state.yaw), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(new_state.last_keys),
                                  np.asarray(ref_state.last_keys))
