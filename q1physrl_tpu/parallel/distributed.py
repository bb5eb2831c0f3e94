"""Multi-host initialization (SURVEY.md section 2.3 / 5.8 TPU plan).

The reference's multi-process story was Ray: 4 rollout-worker processes on
one box shipping pickled sample batches through the plasma object store.
Here multi-host is the same single SPMD program laid over more chips:

    # on every host, before any jax call:
    from q1physrl_tpu.parallel import distributed
    distributed.initialize()          # jax.distributed handshake over DCN

    mesh = make_mesh()                # now spans all hosts' devices
    ts = shard_train_state(ts, mesh)  # env shards land host-local

Per-host env shards are created on their own host (jax.device_put with a
NamedSharding places only the addressable slice); gradient all-reduces ride
ICI within a slice and DCN across slices, inserted by XLA.  No framework
code changes between 1 chip and a pod.
"""

from __future__ import annotations

import jax

__all__ = ("initialize", "is_multi_host", "process_info")


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed (no-op when single-process).

    With TPU pod runtime metadata available, bare ``initialize()`` works;
    the explicit arguments support manual clusters.  Failures are swallowed
    only in the argument-free auto-detect mode (no cluster metadata means
    "run locally"); with explicit arguments the caller asked for a cluster,
    so errors propagate.
    """
    # NB: don't probe jax.process_count() here — it initializes the XLA
    # backend, after which jax.distributed.initialize() refuses to run.
    # The distributed client handle is the side-effect-free signal.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (ValueError, RuntimeError):
        if explicit:
            raise
        # Single-process / no cluster metadata: run locally.


def is_multi_host() -> bool:
    return jax.process_count() > 1


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
