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

__all__ = ("make_mesh", "shard_train_state", "shard_env_axis")

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_env_axis(tree, mesh: Mesh, num_envs: int):
    """Shard every leaf whose trailing axis is the env axis; replicate the
    rest.  Works for EnvState, EpisodeStats, and trajectory pytrees (the
    env axis is always trailing in our SoA layout)."""
    repl = NamedSharding(mesh, P())

    def place(leaf):
        leaf = jax.numpy.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[-1] == num_envs:
            spec = P(*([None] * (leaf.ndim - 1) + [DATA_AXIS]))
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, repl)

    return jax.tree.map(place, tree)


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
