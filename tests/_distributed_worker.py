"""Subprocess worker for the 2-process jax.distributed test.

usage: python _distributed_worker.py <coordinator_port> <process_id> <n_proc>

Each worker owns 4 virtual CPU devices (set via XLA_FLAGS by the parent,
before the interpreter starts, because sitecustomize imports jax at
startup), joins the coordination service, builds the GLOBAL 8-device mesh,
initializes a sharded TrainState without ever materializing a global host
array, and runs two train_iter steps.  Prints one JSON line with metrics
and a replicated-params checksum the parent compares across processes.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def main():
    port, pid, n_proc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from q1physrl_tpu.parallel import distributed

    distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=n_proc, process_id=pid)
    info = distributed.process_info()
    assert info["process_count"] == n_proc, info
    assert info["global_devices"] == 4 * n_proc, info
    assert distributed.is_multi_host()

    from q1physrl_tpu import env as qenv
    from q1physrl_tpu.algo import PPOConfig, train_iter
    from q1physrl_tpu.parallel.mesh import (init_sharded_train_state,
                                            make_mesh)

    env_cfg = dataclasses.replace(qenv.Config.get_default(), num_envs=None)
    ppo = PPOConfig(num_envs=4 * n_proc * 4, rollout_length=4,
                    num_sgd_iter=2, sgd_minibatch_size=32)
    mesh = make_mesh()
    assert mesh.size == 4 * n_proc

    ts = init_sharded_train_state(jax.random.key(0), env_cfg, ppo, mesh)
    fn = jax.jit(train_iter, static_argnums=(0, 1))
    ts, _ = fn(env_cfg, ppo, ts)
    ts, metrics = fn(env_cfg, ppo, ts)

    # Params are replicated, so every process can read them and they must
    # be identical (the gradient all-reduce crossed the process boundary).
    checksum = float(sum(jnp.abs(x).sum() for x in
                         jax.tree.leaves(ts.params)))
    print(json.dumps({
        "process": pid,
        "entropy": float(metrics["entropy"]),
        "mean_reward": float(metrics["mean_reward"]),
        "checksum": checksum,
        "iteration": int(ts.iteration),
    }), flush=True)


if __name__ == "__main__":
    main()
