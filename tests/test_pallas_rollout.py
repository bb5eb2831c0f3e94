"""Parity test for the fused Pallas rollout kernel (interpret mode on CPU)
against a lax.scan of core.step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from q1physrl_tpu import env as qenv
from q1physrl_tpu.env import core
from q1physrl_tpu.ops.env_rollout_pallas import (_uniform_from_bits,
                                                 rollout_actions,
                                                 rollout_actions_autoreset)


def test_uniform_from_bits_treats_int32_as_unsigned():
    """pltpu.prng_random_bits returns int32; the uniform conversion must
    match the unsigned interpretation of the bits (a bare arithmetic shift
    left half the draws negative — caught by the round-3 on-chip stats
    check, scripts/tpu_checks.py check [2])."""
    rng = np.random.default_rng(0)
    bits = np.concatenate([
        rng.integers(-2**31, 2**31, 10000).astype(np.int32),
        np.asarray([-1, -2**31, 0, 2**31 - 1], np.int32)])
    u = np.asarray(_uniform_from_bits(jnp.asarray(bits)))
    expected = ((bits.astype(np.uint32) >> 8).astype(np.float32)
                * np.float32(2.0**-24))
    np.testing.assert_array_equal(u, expected)
    assert u.min() >= 0.0 and u.max() < 1.0
    # Uniformity sanity: mean of the unsigned interpretation is ~0.5.
    assert abs(float(u[:10000].mean()) - 0.5) < 0.02


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


def test_rollout_actions_autoreset_matches_step_autoreset():
    """Elementwise parity of the in-kernel auto-reset path (VERDICT round-1
    item 4): the fused kernel with streamed actions AND streamed reset draws
    must match a lax.scan of core.step_autoreset given the same draws."""
    cfg = dataclasses.replace(qenv.Config.get_default(), num_envs=None,
                              zero_start_prob=0.3)  # exercise both branches
    n, t = 256, 80  # > one 10s episode cannot fit, but staggered resets fire
    state = core.reset(cfg, jax.random.key(1), n, jnp.float32)

    rng = np.random.default_rng(1)
    ka = jnp.asarray(rng.integers(0, 2, (t, cfg.num_keys, n)), jnp.int32)
    ya = jnp.asarray(rng.uniform(-10, 10, (t, n)), jnp.float32)
    ru = jnp.asarray(rng.random((t, 5, n)), jnp.float32)

    def body(st, xs):
        k, y, u = xs
        st, out = core.step_autoreset(cfg, st, k, y,
                                      compute_observation=False,
                                      reset_uniforms=u)
        return st, (out.reward, out.done)

    ref_state, (ref_r, ref_d) = jax.jit(
        lambda s: jax.lax.scan(body, s, (ka, ya, ru)))(state)
    assert int(np.asarray(ref_d).sum()) > 0  # resets actually fired

    new_state, rewards, dones = rollout_actions_autoreset(
        cfg, state, ka, ya, ru, block_envs=128, interpret=True)

    np.testing.assert_allclose(np.asarray(rewards), np.asarray(ref_r),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(dones), np.asarray(ref_d))
    for name in ("vel_x", "vel_y", "vel_z", "z_pos"):
        np.testing.assert_allclose(
            np.asarray(getattr(new_state.player, name)),
            np.asarray(getattr(ref_state.player, name)),
            rtol=1e-5, atol=1e-3, err_msg=name)
    for name in ("on_ground", "jump_released"):
        np.testing.assert_array_equal(
            np.asarray(getattr(new_state.player, name)),
            np.asarray(getattr(ref_state.player, name)), err_msg=name)
    np.testing.assert_allclose(np.asarray(new_state.yaw),
                               np.asarray(ref_state.yaw), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.time_remaining),
                               np.asarray(ref_state.time_remaining),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(new_state.zero_start),
                                  np.asarray(ref_state.zero_start))
    np.testing.assert_array_equal(np.asarray(new_state.last_keys),
                                  np.asarray(ref_state.last_keys))
    np.testing.assert_allclose(np.asarray(new_state.last_key_press_time),
                               np.asarray(ref_state.last_key_press_time),
                               rtol=1e-6)


def test_sharded_rollout_actions_matches_sharded_scan():
    """shard_map over the Pallas rollout (VERDICT r3 item 6): the fused
    kernel composed over an 8-device mesh matches the sharded XLA scan of
    core.step — the 4.9 B steps/s path's multi-chip form."""
    from q1physrl_tpu.ops.sharded_rollout import sharded_rollout_actions
    from q1physrl_tpu.parallel import make_mesh, shard_env_axis

    cfg = dataclasses.replace(qenv.Config.get_default(), num_envs=None)
    n, t = 8 * 256, 40
    mesh = make_mesh(8)
    state = shard_env_axis(core.reset(cfg, jax.random.key(0), n, jnp.float32),
                           mesh)

    rng = np.random.default_rng(0)
    ka = jnp.asarray(rng.integers(0, 2, (t, cfg.num_keys, n)), jnp.int32)
    ya = jnp.asarray(rng.uniform(-10, 10, (t, n)), jnp.float32)

    def body(st, xs):
        k, y = xs
        st, out = core.step(cfg, st, k, y, compute_observation=False)
        return st, (out.reward, out.done)

    ref_state, (ref_r, ref_d) = jax.jit(
        lambda s: jax.lax.scan(body, s, (ka, ya)))(state)

    new_state, rewards, dones = jax.jit(
        lambda s, k, y: sharded_rollout_actions(
            cfg, s, k, y, mesh, block_envs=128, interpret=True))(
        state, ka, ya)

    # Outputs really are sharded over the env axis.
    assert not rewards.sharding.is_fully_replicated
    assert not new_state.yaw.sharding.is_fully_replicated

    np.testing.assert_allclose(np.asarray(rewards), np.asarray(ref_r),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(dones), np.asarray(ref_d))
    for name in ("vel_x", "vel_y", "vel_z", "z_pos"):
        np.testing.assert_allclose(
            np.asarray(getattr(new_state.player, name)),
            np.asarray(getattr(ref_state.player, name)),
            rtol=1e-5, atol=1e-3, err_msg=name)
    np.testing.assert_allclose(np.asarray(new_state.yaw),
                               np.asarray(ref_state.yaw), rtol=1e-6)


def test_sharded_rollout_actions_autoreset_matches_scan():
    """The streamed-reset kernel under shard_map: same draws, same result
    as the (sharded) XLA step_autoreset scan."""
    from q1physrl_tpu.ops.sharded_rollout import (
        sharded_rollout_actions_autoreset)
    from q1physrl_tpu.parallel import make_mesh, shard_env_axis

    cfg = dataclasses.replace(qenv.Config.get_default(), num_envs=None,
                              zero_start_prob=0.3)
    n, t = 8 * 128, 80
    mesh = make_mesh(8)
    state = shard_env_axis(core.reset(cfg, jax.random.key(1), n, jnp.float32),
                           mesh)

    rng = np.random.default_rng(1)
    ka = jnp.asarray(rng.integers(0, 2, (t, cfg.num_keys, n)), jnp.int32)
    ya = jnp.asarray(rng.uniform(-10, 10, (t, n)), jnp.float32)
    ru = jnp.asarray(rng.random((t, 5, n)), jnp.float32)

    def body(st, xs):
        k, y, u = xs
        st, out = core.step_autoreset(cfg, st, k, y,
                                      compute_observation=False,
                                      reset_uniforms=u)
        return st, (out.reward, out.done)

    ref_state, (ref_r, ref_d) = jax.jit(
        lambda s: jax.lax.scan(body, s, (ka, ya, ru)))(state)
    assert int(np.asarray(ref_d).sum()) > 0

    new_state, rewards, dones = jax.jit(
        lambda s, k, y, u: sharded_rollout_actions_autoreset(
            cfg, s, k, y, u, mesh, block_envs=128, interpret=True))(
        state, ka, ya, ru)

    np.testing.assert_allclose(np.asarray(rewards), np.asarray(ref_r),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(dones), np.asarray(ref_d))
    np.testing.assert_array_equal(np.asarray(new_state.zero_start),
                                  np.asarray(ref_state.zero_start))
    np.testing.assert_allclose(np.asarray(new_state.time_remaining),
                               np.asarray(ref_state.time_remaining),
                               rtol=1e-5, atol=1e-5)


def test_rollout_random_seed_is_dynamic():
    """The PRNG seed enters the kernel as an SMEM scalar, so a traced seed
    (what sharded_rollout_random's axis_index offset produces) traces
    without recompiling per seed.  CPU interpret mode cannot execute the
    TPU PRNG, so this checks tracing/lowering only — execution parity is
    scripts/tpu_checks.py check [5] on the real chip."""
    from q1physrl_tpu.ops.env_rollout_pallas import rollout_random

    cfg = dataclasses.replace(qenv.Config.get_default(), num_envs=None)
    state = core.reset(cfg, jax.random.key(0), 256, jnp.float32)
    fn = jax.jit(lambda s, seed: rollout_random(cfg, s, 4, seed=seed,
                                                block_envs=128))
    jax.eval_shape(fn, state, jnp.int32(7))  # traces with a dynamic seed
