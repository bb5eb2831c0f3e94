"""On-hardware validation for TPU-only code paths (run on a real chip).

The pytest suite runs on a virtual CPU mesh, where Mosaic kernels can only
run in interpret mode and the TPU PRNG is unavailable.  This script covers
the remaining surface on real hardware:

  1. rollout_actions compiled via Mosaic == XLA scan (exact semantics).
  2. rollout_random statistics vs the XLA random-policy rollout
     (different PRNG streams; distributions must agree).
  3. Full sharded train step on the real device (single chip).
  5. shard_map-composed Pallas rollouts == unsharded kernels on a
     single-device mesh (exact; the multi-chip path's on-hardware form).

usage: python scripts/tpu_checks.py
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def check_rollout_actions_parity():
    from q1physrl_tpu import env as qenv
    from q1physrl_tpu.env import core
    from q1physrl_tpu.ops.env_rollout_pallas import rollout_actions

    cfg = dataclasses.replace(qenv.Config.get_default(), num_envs=None)
    n, t = 4096, 64
    state = jax.jit(core.reset, static_argnums=(0, 2, 3))(
        cfg, jax.random.key(0), n, jnp.float32)
    rng = np.random.default_rng(0)
    ka = jnp.asarray(rng.integers(0, 2, (t, cfg.num_keys, n)), jnp.int32)
    ya = jnp.asarray(rng.uniform(-10, 10, (t, n)), jnp.float32)

    def body(st, xs):
        k, y = xs
        st, o = core.step(cfg, st, k, y, compute_observation=False)
        return st, (o.reward, o.done)

    ref_state, (ref_r, ref_d) = jax.jit(
        lambda s: jax.lax.scan(body, s, (ka, ya)))(state)
    new_state, rewards, dones = jax.jit(
        lambda s: rollout_actions(cfg, s, ka, ya, block_envs=2048))(state)

    err = float(jnp.abs(rewards - ref_r).max())
    assert err < 1e-4, err
    assert bool((dones == ref_d).all())
    verr = float(jnp.abs(new_state.player.vel_y - ref_state.player.vel_y).max())
    assert verr < 1e-2, verr
    print(f"[1] rollout_actions Mosaic==XLA: reward err {err:.2e}, "
          f"vel err {verr:.2e}  OK")


def check_rollout_actions_autoreset_parity():
    from q1physrl_tpu import env as qenv
    from q1physrl_tpu.env import core
    from q1physrl_tpu.ops.env_rollout_pallas import rollout_actions_autoreset

    cfg = dataclasses.replace(qenv.Config.get_default(), num_envs=None,
                              zero_start_prob=0.3)
    n, t = 4096, 64
    state = jax.jit(core.reset, static_argnums=(0, 2, 3))(
        cfg, jax.random.key(1), n, jnp.float32)
    rng = np.random.default_rng(1)
    ka = jnp.asarray(rng.integers(0, 2, (t, cfg.num_keys, n)), jnp.int32)
    ya = jnp.asarray(rng.uniform(-10, 10, (t, n)), jnp.float32)
    ru = jnp.asarray(rng.random((t, 5, n)), jnp.float32)

    def body(st, xs):
        k, y, u = xs
        st, o = core.step_autoreset(cfg, st, k, y, compute_observation=False,
                                    reset_uniforms=u)
        return st, (o.reward, o.done)

    ref_state, (ref_r, ref_d) = jax.jit(
        lambda s: jax.lax.scan(body, s, (ka, ya, ru)))(state)
    new_state, rewards, dones = jax.jit(
        lambda s: rollout_actions_autoreset(cfg, s, ka, ya, ru,
                                            block_envs=2048))(state)

    err = float(jnp.abs(rewards - ref_r).max())
    assert err < 1e-4, err
    assert bool((dones == ref_d).all())
    assert bool((new_state.zero_start == ref_state.zero_start).all())
    verr = float(jnp.abs(new_state.player.vel_y
                         - ref_state.player.vel_y).max())
    assert verr < 1e-2, verr
    print(f"[1b] rollout_actions_autoreset Mosaic==XLA: reward err "
          f"{err:.2e}, vel err {verr:.2e}  OK")


def check_rollout_random_stats():
    from q1physrl_tpu import env as qenv
    from q1physrl_tpu.env import core
    from q1physrl_tpu.ops.env_rollout_pallas import rollout_random

    cfg = dataclasses.replace(qenv.Config.get_default(), num_envs=None)
    n, t = 1 << 16, 720
    state = jax.jit(core.reset, static_argnums=(0, 2, 3))(
        cfg, jax.random.key(0), n, jnp.float32)
    st_p, rsum_p, dcnt_p = jax.jit(
        lambda s: rollout_random(cfg, s, t, seed=3, block_envs=8192))(state)

    key0 = jax.random.key(9)

    def body(st, x):
        k = jax.random.fold_in(key0, x)
        kk, ky = jax.random.split(k)
        ka = jax.random.bernoulli(kk, 0.5, (cfg.num_keys, n)).astype(jnp.int32)
        ya = jax.random.uniform(ky, (n,), jnp.float32, -cfg.action_range,
                                cfg.action_range)
        st, o = core.step_autoreset(cfg, st, ka, ya,
                                    compute_observation=False)
        return st, (o.reward.sum(), o.done.sum())

    _, (r_x, d_x) = jax.jit(
        lambda s: jax.lax.scan(body, s, jnp.arange(t)))(state)

    mean_p = float(rsum_p.mean())
    mean_x = float(r_x.sum()) / n
    done_p = float(dcnt_p) / n
    done_x = float(d_x.sum()) / n
    print(f"[2] rollout_random stats: reward/env pallas {mean_p:.2f} vs "
          f"xla {mean_x:.2f}; dones/env {done_p:.3f} vs {done_x:.3f}")
    assert abs(done_p - done_x) < 0.1 * max(done_p, done_x)
    assert abs(mean_p - mean_x) < 5.0


def check_train_step():
    from q1physrl_tpu.algo import PPOConfig, init_train_state, train_iter
    from q1physrl_tpu.env import Config
    from q1physrl_tpu.parallel import make_mesh, shard_train_state

    mesh = make_mesh()
    ppo = PPOConfig(num_envs=1024, rollout_length=32, num_sgd_iter=4,
                    sgd_minibatch_size=4096)
    env_cfg = Config.get_default()
    ts = shard_train_state(init_train_state(jax.random.key(0), env_cfg, ppo),
                           mesh)
    fn = jax.jit(train_iter, static_argnums=(0, 1))
    t0 = time.time()
    ts, m = fn(env_cfg, ppo, ts)
    jax.block_until_ready(m)
    ts, m = fn(env_cfg, ppo, ts)
    jax.block_until_ready(m)
    print(f"[3] sharded train step on {jax.devices()}: "
          f"entropy {float(m['entropy']):.2f}  OK ({time.time()-t0:.1f}s)")


def check_sharded_rollout():
    """shard_map composition of the Pallas kernels on the real chip
    (single-device mesh; VERDICT r3 item 6).  With one device the
    axis_index seed offset is zero, so sharded_rollout_random must
    reproduce plain rollout_random EXACTLY, and sharded_rollout_actions
    must match the unsharded kernel bit-for-bit."""
    from q1physrl_tpu import env as qenv
    from q1physrl_tpu.env import core
    from q1physrl_tpu.ops.env_rollout_pallas import (rollout_actions,
                                                     rollout_random)
    from q1physrl_tpu.ops.sharded_rollout import (sharded_rollout_actions,
                                                  sharded_rollout_random)
    from q1physrl_tpu.parallel import make_mesh, shard_env_axis

    cfg = dataclasses.replace(qenv.Config.get_default(), num_envs=None)
    mesh = make_mesh(1)
    n, t = 4096, 64
    state = jax.jit(core.reset, static_argnums=(0, 2, 3))(
        cfg, jax.random.key(0), n, jnp.float32)
    rng = np.random.default_rng(2)
    ka = jnp.asarray(rng.integers(0, 2, (t, cfg.num_keys, n)), jnp.int32)
    ya = jnp.asarray(rng.uniform(-10, 10, (t, n)), jnp.float32)

    _, r_ref, d_ref = jax.jit(
        lambda s: rollout_actions(cfg, s, ka, ya, block_envs=2048))(state)
    sh_state = shard_env_axis(state, mesh)
    _, r_sh, d_sh = jax.jit(
        lambda s: sharded_rollout_actions(cfg, s, ka, ya, mesh,
                                          block_envs=2048))(sh_state)
    assert bool((r_sh == r_ref).all()) and bool((d_sh == d_ref).all())

    _, rsum_ref, dcnt_ref = jax.jit(
        lambda s: rollout_random(cfg, s, t, seed=5, block_envs=2048))(state)
    _, rsum_sh, dcnt_sh = jax.jit(
        lambda s: sharded_rollout_random(cfg, s, t, mesh, seed=5,
                                         block_envs=2048))(sh_state)
    assert bool((rsum_sh == rsum_ref).all()), (
        float(jnp.abs(rsum_sh - rsum_ref).max()))
    assert float(dcnt_sh) == float(dcnt_ref)
    print(f"[5] sharded Pallas rollout (1-dev mesh) == unsharded: "
          f"actions exact, random exact (dones {float(dcnt_sh):.0f})  OK")


if __name__ == "__main__":
    print("devices:", jax.devices())
    check_rollout_actions_parity()
    check_rollout_actions_autoreset_parity()
    check_rollout_random_stats()
    check_train_step()
    check_sharded_rollout()
    print("all TPU checks passed")
