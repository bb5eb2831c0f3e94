"""Checkpoint save/restore (orbax), replacing the reference's RLLib/Tune
pickle checkpoints (SURVEY.md section 5.4).

Saved tree: {params, opt_state, kl_coeff, rng, iteration, env_steps} —
env state is intentionally excluded (episodes restart on resume, matching
the reference, whose restore also rebuilds workers/envs fresh).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

__all__ = ("save_checkpoint", "restore_checkpoint", "latest_checkpoint")


def _ckpt_tree(ts):
    return {
        "params": ts.params,
        "opt_state": ts.opt_state,
        "kl_coeff": ts.kl_coeff,
        "rng": jax.random.key_data(ts.rng),
        "iteration": ts.iteration,
        "env_steps": ts.env_steps,
    }


def save_checkpoint(directory: str, ts, iteration: int) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"iter_{iteration:07d}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _ckpt_tree(ts), force=True)
    return path


def restore_checkpoint(path: str, ts):
    """Restore into an existing TrainState template (shapes must match)."""
    import orbax.checkpoint as ocp

    template = jax.tree.map(np.asarray, _ckpt_tree(ts))
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(path), template)
    return ts.replace(
        params=tree["params"],
        opt_state=tree["opt_state"],
        kl_coeff=tree["kl_coeff"],
        rng=jax.random.wrap_key_data(np.asarray(tree["rng"])),
        iteration=tree["iteration"],
        env_steps=tree["env_steps"],
    )


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    entries = sorted(e for e in os.listdir(directory)
                     if e.startswith("iter_"))
    return os.path.join(directory, entries[-1]) if entries else None
