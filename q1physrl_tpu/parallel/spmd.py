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
from ..algo.ppo import (Batch, Coeffs, EpisodeStats, TrainState,
                        _interp_schedule, _override_lr, compute_gae,
                        init_train_state, make_optimizer, ppo_loss, rollout,
                        train_iter, update_kl_coeff)
from ..env.config import Config as EnvConfig
from .mesh import DATA_AXIS

try:  # jax >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ("make_spmd_train_iter",)


from .mesh import train_state_specs as _train_state_specs  # shared layout


def make_spmd_train_iter(env_cfg: EnvConfig, ppo: PPOConfig, mesh,
                         with_coeffs: bool = False):
    """Build a jitted shard_map train iteration for the given mesh.

    Returns ``fn(ts) -> (ts, metrics)`` where ``ts`` must be placed with
    ``shard_train_state(ts, mesh)``.

    With ``with_coeffs=True`` the returned function is
    ``fn(ts, coeffs: Coeffs) -> (ts, metrics)``: entropy/lr/kl_target become
    runtime scalars (replicated over the mesh), exactly mirroring
    ``train_iter(..., coeffs)`` — this is what lets population sweeps
    (algo/sweep.py host-driven schedules) run on the explicit-SPMD path
    without a recompile per schedule variant.
    """
    n_dev = mesh.size
    assert ppo.num_envs % n_dev == 0
    assert ppo.sgd_minibatch_size % n_dev == 0
    if with_coeffs and ppo.lr_schedule is not None:
        # inject_hyperparams re-evaluates callable (schedule) hyperparams
        # every update, which would silently discard the runtime Coeffs.lr
        # override; callers must strip the static schedule first (as
        # PopulationTrainer does).
        raise ValueError("with_coeffs=True requires ppo.lr_schedule=None "
                         "(static lr schedule would override Coeffs.lr)")
    local_ppo = dataclasses.replace(
        ppo, num_envs=ppo.num_envs // n_dev,
        sgd_minibatch_size=max(1, ppo.sgd_minibatch_size // n_dev))

    def per_device(ts: TrainState, coeffs: Coeffs | None = None):
        axis = jax.lax.axis_index(DATA_AXIS)
        # Decorrelate per-device RNG streams.
        rng = jax.random.fold_in(ts.rng, axis)

        # The scalar episode accumulators enter replicated (P() in_spec)
        # but accumulate device-local episodes inside the rollout scan —
        # mark them device-varying up front so the scan carry types are
        # consistent under vma checking.
        vary = lambda x: (x if DATA_AXIS in getattr(x.aval, "vma", ())
                          else jax.lax.pcast(x, DATA_AXIS, to="varying"))
        stats_in = jax.tree.map(vary, ts.stats)

        env_state, stats, rng, traj, bootstrap_value = rollout(
            env_cfg, local_ppo, ts.params, ts.env_state, stats_in, rng)
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

        if coeffs is not None:
            entropy_coeff, lr, kl_target = coeffs
        else:
            lr = kl_target = None
            if ppo.entropy_coeff_schedule is not None:
                entropy_coeff = _interp_schedule(ppo.entropy_coeff_schedule,
                                                 ts.env_steps)
            else:
                entropy_coeff = ppo.entropy_coeff

        tx = make_optimizer(ppo)
        opt_state0 = (ts.opt_state if lr is None
                      else _override_lr(ts.opt_state, lr))
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
            epoch_step, (ts.params, opt_state0), epoch_keys)
        last_aux = jax.tree.map(lambda x: x[-1], aux)
        kl_coeff = update_kl_coeff(ppo, ts.kl_coeff, last_aux["kl"],
                                   kl_target)

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

    from jax.sharding import PartitionSpec as P

    # Metric out_specs are derived from an abstract evaluation of the
    # single-device train_iter — the single source of truth for the metric
    # schema.  per_device mirrors that schema; if the two ever diverge
    # (e.g. a metric added to ppo.py but not here) shard_map raises a
    # pytree-structure mismatch at trace time instead of silently
    # mis-placing outputs.
    tiny = dataclasses.replace(
        ppo, num_envs=n_dev, rollout_length=1, num_sgd_iter=1,
        sgd_minibatch_size=n_dev)
    ts_shape = jax.eval_shape(
        lambda: init_train_state(jax.random.key(0), env_cfg, tiny))
    _, metrics_shape = jax.eval_shape(
        lambda t: train_iter(env_cfg, tiny, t), ts_shape)
    metric_specs = {k: P() for k in metrics_shape}

    if with_coeffs:
        coeff_specs = Coeffs(entropy_coeff=P(), lr=P(), kl_target=P())

        def fn(ts: TrainState, coeffs: Coeffs):
            in_specs = (_train_state_specs(ts), coeff_specs)
            out_state_specs = _train_state_specs(ts)
            mapped = shard_map(per_device, mesh=mesh, in_specs=in_specs,
                               out_specs=(out_state_specs, metric_specs))
            return mapped(ts, coeffs)
    else:
        def fn(ts: TrainState):
            in_specs = _train_state_specs(ts)
            out_state_specs = _train_state_specs(ts)
            mapped = shard_map(lambda t: per_device(t), mesh=mesh,
                               in_specs=(in_specs,),
                               out_specs=(out_state_specs, metric_specs))
            return mapped(ts)

    return jax.jit(fn)
