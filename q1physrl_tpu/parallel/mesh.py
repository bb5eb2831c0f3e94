"""Device-mesh sharding for the PPO actor-learner.

Replaces the reference's distributed runtime (Ray raylet + plasma object
store shipping SampleBatches between 4 rollout-worker processes and a
driver; SURVEY.md section 2.3) with a single-program SPMD layout:

- mesh axis ``data``: the env batch axis.  Every per-env leaf of the env
  state, rollout trajectory, and training batch is sharded along it.
- params / optimizer state are replicated (the model is ~70k params — pure
  data parallelism is the idiomatic mapping; there is nothing to TP/PP).

With inputs committed to these shardings, ``jit(train_iter)`` compiles to:
rollout with zero communication (env step and policy forward are
batch-parallel), minibatch gathers as all-to-alls over ICI, and gradient
all-reduces inserted automatically by XLA where the replicated params meet
sharded batches.  Multi-host extends the same program over DCN via
``jax.distributed.initialize`` — no framework code changes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ("make_mesh", "shard_train_state", "shard_env_axis",
           "env_axis_spec", "train_state_specs", "init_sharded_train_state")

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def env_axis_spec(tree):
    """PartitionSpec pytree for an env-state-like pytree: every array leaf
    is sharded on its trailing (env) axis — our SoA layout guarantees the
    env axis is always trailing — except PRNG keys and scalars, which are
    replicated.  Structural, not shape-based: shape tests can collide when
    num_envs equals an unrelated dimension (e.g. the 256-wide hidden
    layer)."""

    def spec(leaf):
        if not hasattr(leaf, "ndim"):  # accepts ShapeDtypeStruct leaves too
            leaf = jax.numpy.asarray(leaf)
        if leaf.ndim == 0 or jax.dtypes.issubdtype(leaf.dtype,
                                                   jax.dtypes.prng_key):
            return P()
        return P(*([None] * (leaf.ndim - 1) + [DATA_AXIS]))

    return jax.tree.map(spec, tree)


def shard_env_axis(tree, mesh: Mesh, num_envs: int = None):
    """Place an env-state-like pytree: trailing env axis sharded over the
    mesh, scalars/keys replicated.  (num_envs retained for API compat.)"""
    specs = env_axis_spec(tree)
    return jax.tree.map(
        lambda leaf, s: jax.device_put(jax.numpy.asarray(leaf),
                                       NamedSharding(mesh, s)),
        tree, specs)


def train_state_specs(ts):
    """PartitionSpec pytree for a TrainState (concrete or abstract): env
    state + per-env episode stats sharded over the env axis, params /
    optimizer state / scalars replicated.  Structural per field, never
    shape-matched."""
    repl = lambda tree: jax.tree.map(lambda _: P(), tree)
    return ts.replace(
        params=repl(ts.params),
        opt_state=repl(ts.opt_state),
        env_state=env_axis_spec(ts.env_state),
        stats=env_axis_spec(ts.stats),
        kl_coeff=P(), rng=P(), iteration=P(), env_steps=P(),
    )


def init_sharded_train_state(key, env_cfg, ppo, mesh: Mesh):
    """Initialize a TrainState directly INTO its mesh placement via
    ``jit(..., out_shardings=...)``.

    Unlike ``init_train_state`` + ``shard_train_state`` (host array then
    device_put), this works in multi-process meshes where no single process
    may materialize a global array: every process runs the same jitted
    initializer and receives only its addressable shards."""
    from jax.sharding import NamedSharding

    from ..algo.ppo import init_train_state

    init = lambda k: init_train_state(k, env_cfg, ppo)
    specs = train_state_specs(jax.eval_shape(init, key))
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.jit(init, out_shardings=shardings)(key)


def shard_train_state(ts, mesh: Mesh):
    """Place a TrainState: env state + episode stats sharded over the env
    axis, params/opt/scalars replicated."""
    num_envs = ts.env_state.num_envs
    repl = NamedSharding(mesh, P())
    return ts.replace(
        env_state=shard_env_axis(ts.env_state, mesh, num_envs),
        stats=shard_env_axis(ts.stats, mesh, num_envs),
        params=jax.device_put(ts.params, repl),
        opt_state=jax.device_put(ts.opt_state, repl),
        kl_coeff=jax.device_put(ts.kl_coeff, repl),
        rng=jax.device_put(ts.rng, repl),
        iteration=jax.device_put(ts.iteration, repl),
        env_steps=jax.device_put(ts.env_steps, repl),
    )
