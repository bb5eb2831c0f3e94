"""Explicit-SPMD training step via shard_map + psum.

Two multi-device paths exist in this framework:

1. ``jit`` with ``NamedSharding`` inputs (parallel/mesh.py) — XLA chooses
   the collectives.  The global minibatch permutation then compiles to
   all-to-alls over ICI every SGD step.
2. This module: ``shard_map`` with *explicit* communication.  Each device
   rolls out its own env shard, shuffles and minibatches **locally**, and
   only gradients (and scalar metrics) cross the interconnect via
   ``psum`` — the textbook data-parallel layout where per-step ICI traffic
   is exactly one ~70k-param gradient all-reduce.

The local-minibatch design is the one deliberate semantic difference from
the single-device program: minibatch composition is per-device (equal-size
local slices of the global minibatch), which is the standard large-scale
PPO practice.  Gradient expectations are identical; only the shuffling
granularity differs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..algo.config import PPOConfig
from ..algo.ppo import (Batch, EpisodeStats, TrainState, _interp_schedule,
                        compute_gae, make_optimizer, ppo_loss, rollout,
                        update_kl_coeff)
from ..env.config import Config as EnvConfig
from .mesh import DATA_AXIS

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ("make_spmd_train_iter",)


def _train_state_specs(ts: TrainState):
    """PartitionSpec pytree for a TrainState: env state + per-env episode
    stats sharded over the env axis, params/opt/scalars replicated —
    structural placement per field (mesh.shard_train_state layout)."""
    from jax.sharding import PartitionSpec as P

    from .mesh import env_axis_spec

    repl = lambda tree: jax.tree.map(lambda _: P(), tree)
    return TrainState(
        params=repl(ts.params),
        opt_state=repl(ts.opt_state),
        env_state=env_axis_spec(ts.env_state),
        stats=ts.stats.replace(
            ep_return=P(DATA_AXIS), ep_len=P(DATA_AXIS),
            finished=P(), ret_sum=P(), ret_max=P(), len_sum=P(),
            zs_finished=P(), zs_ret_sum=P()),
        kl_coeff=P(), rng=P(), iteration=P(), env_steps=P(),
    )


def make_spmd_train_iter(env_cfg: EnvConfig, ppo: PPOConfig, mesh):
    """Build a jitted shard_map train iteration for the given mesh.

    Returns ``fn(ts) -> (ts, metrics)`` where ``ts`` must be placed with
    ``shard_train_state(ts, mesh)``.
    """
    n_dev = mesh.size
    assert ppo.num_envs % n_dev == 0
    assert ppo.sgd_minibatch_size % n_dev == 0
    local_ppo = dataclasses.replace(
        ppo, num_envs=ppo.num_envs // n_dev,
        sgd_minibatch_size=max(1, ppo.sgd_minibatch_size // n_dev))

    def per_device(ts: TrainState):
        axis = jax.lax.axis_index(DATA_AXIS)
        # Decorrelate per-device RNG streams.
        rng = jax.random.fold_in(ts.rng, axis)

        env_state, stats, rng, traj, bootstrap_value = rollout(
            env_cfg, local_ppo, ts.params, ts.env_state, ts.stats, rng)
        obs, ka, ya, logits, logp, value, reward, done = traj

        advantages, value_targets = compute_gae(local_ppo, reward, done,
                                                value, bootstrap_value)
        # Standardize over the GLOBAL batch: psum the moments.
        b_local = advantages.size
        total = b_local * n_dev
        mean = jax.lax.psum(advantages.sum(), DATA_AXIS) / total
        var = jax.lax.psum(jnp.square(advantages - mean).sum(),
                           DATA_AXIS) / total
        advantages = (advantages - mean) / jnp.maximum(jnp.sqrt(var), 1e-4)

        T, N = reward.shape
        flat = lambda x: x.reshape((T * N,) + x.shape[2:])
        batch = Batch(
            obs=flat(obs),
            key_actions=flat(jnp.moveaxis(ka, 1, 2)),
            yaw_actions=flat(ya),
            logits=flat(logits),
            logp=flat(logp),
            value=flat(value),
            advantage=flat(advantages),
            value_target=flat(value_targets),
        )

        if ppo.entropy_coeff_schedule is not None:
            entropy_coeff = _interp_schedule(ppo.entropy_coeff_schedule,
                                             ts.env_steps)
        else:
            entropy_coeff = ppo.entropy_coeff

        tx = make_optimizer(ppo)
        n_mb = local_ppo.num_minibatches
        mb_size = local_ppo.batch_size // n_mb
        grad_fn = jax.grad(
            lambda p, mb: ppo_loss(env_cfg, ppo, p, mb, ts.kl_coeff,
                                   entropy_coeff), has_aux=True)

        def minibatch_step(carry, idx):
            params, opt_state = carry
            mb = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), batch)
            grads, aux = grad_fn(params, mb)
            # The one per-step collective: gradient all-reduce over ICI.
            grads = jax.lax.pmean(grads, DATA_AXIS)
            aux = jax.lax.pmean(aux, DATA_AXIS)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax_apply(params, updates)
            return (params, opt_state), aux

        def epoch_step(carry, key):
            params, opt_state = carry
            # Local, per-device shuffle — no cross-device gathers.
            perm = jax.random.permutation(jax.random.fold_in(key, axis),
                                          local_ppo.batch_size)
            idxs = perm[:n_mb * mb_size].reshape(n_mb, mb_size)
            (params, opt_state), aux = jax.lax.scan(
                minibatch_step, (params, opt_state), idxs)
            return (params, opt_state), jax.tree.map(jnp.mean, aux)

        rng, k = jax.random.split(rng)
        epoch_keys = jax.random.split(k, ppo.num_sgd_iter)
        (params, opt_state), aux = jax.lax.scan(
            epoch_step, (ts.params, ts.opt_state), epoch_keys)
        last_aux = jax.tree.map(lambda x: x[-1], aux)
        kl_coeff = update_kl_coeff(ppo, ts.kl_coeff, last_aux["kl"])

        # Global episode metrics: psum the scalar accumulators.
        g = lambda x: jax.lax.psum(x, DATA_AXIS)
        gmax = lambda x: jax.lax.pmax(x, DATA_AXIS)
        nan = jnp.asarray(jnp.nan, jnp.float32)
        finished = g(stats.finished)
        zs_finished = g(stats.zs_finished)
        metrics = {
            "episode_reward_mean": jnp.where(
                finished > 0, g(stats.ret_sum) / jnp.maximum(finished, 1),
                nan),
            "episode_reward_max": jnp.where(finished > 0, gmax(stats.ret_max),
                                            nan),
            "episode_len_mean": jnp.where(
                finished > 0, g(stats.len_sum) / jnp.maximum(finished, 1),
                nan),
            "episodes_total": finished,
            "zero_start_total_reward_mean": jnp.where(
                zs_finished > 0,
                g(stats.zs_ret_sum) / jnp.maximum(zs_finished, 1), nan),
            "zero_start_episodes": zs_finished,
            "kl_coeff": kl_coeff,
            "mean_reward": g(reward.sum()) / (T * N * n_dev),
            **last_aux,
        }

        new_ts = TrainState(
            params=params, opt_state=opt_state, env_state=env_state,
            stats=EpisodeStats.zeros(N).replace(ep_return=stats.ep_return,
                                                ep_len=stats.ep_len),
            kl_coeff=kl_coeff,
            # Keep the carried key identical across devices (the per-device
            # fold_in happens at the top of the next iteration).
            rng=jax.random.split(ts.rng)[0],
            iteration=ts.iteration + 1,
            env_steps=ts.env_steps + T * N * n_dev,
        )
        return new_ts, metrics

    def optax_apply(params, updates):
        import optax

        return optax.apply_updates(params, updates)

    # Build specs from a throwaway abstract TrainState? Specs depend only on
    # shapes; derive from ppo geometry using a concrete template at call
    # time instead — wrap in a function-of-ts.
    from jax.sharding import PartitionSpec as P

    def fn(ts: TrainState):
        in_specs = _train_state_specs(ts)
        out_state_specs = _train_state_specs(ts)
        metric_specs = {k: P() for k in (
            "episode_reward_mean", "episode_reward_max", "episode_len_mean",
            "episodes_total", "zero_start_total_reward_mean",
            "zero_start_episodes", "kl_coeff", "mean_reward", "policy_loss",
            "vf_loss", "kl", "entropy", "vf_explained_var")}
        mapped = shard_map(per_device, mesh=mesh, in_specs=(in_specs,),
                           out_specs=(out_state_specs, metric_specs),
                           check_vma=False)
        return mapped(ts)

    return jax.jit(fn)
