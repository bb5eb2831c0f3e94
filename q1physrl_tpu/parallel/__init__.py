"""Device-mesh parallelism (SPMD data-parallel actor-learner)."""

from . import distributed
from .mesh import DATA_AXIS, make_mesh, shard_env_axis, shard_train_state

__all__ = ("DATA_AXIS", "distributed", "make_mesh", "shard_env_axis",
           "shard_train_state")
