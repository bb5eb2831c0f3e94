"""Checkpoint evaluation CLI.

usage: python -m q1physrl_tpu.algo.evaluate <run.yaml> <checkpoint_dir_or_path>
           [num_episodes]

Prints stochastic and deterministic zero-start statistics — the proper
low-variance measurement of the training north-star metric.
"""

from __future__ import annotations

import sys

import jax

from .. import analyse
from . import checkpoint as ckpt_mod
from .ppo import init_train_state
from .train import load_run_config

__all__ = ("main",)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    run_yaml, ckpt_path = argv[:2]
    num_episodes = int(argv[2]) if len(argv) > 2 else 512

    run = load_run_config(run_yaml)
    template = init_train_state(jax.random.key(0), run.env, run.ppo)
    path = ckpt_mod.latest_checkpoint(ckpt_path) or ckpt_path
    ts = ckpt_mod.restore_checkpoint(path, template)
    print(f"checkpoint: {path} (iteration {int(ts.iteration)}, "
          f"{int(ts.env_steps):,} env steps)")

    sto = analyse.eval_zero_start(ts.params, run.env,
                                  num_episodes=num_episodes)
    det = analyse.eval_zero_start(ts.params, run.env, num_episodes=2,
                                  deterministic=True)
    print(f"zero-start stochastic ({num_episodes} episodes): "
          f"mean {sto['mean']:.0f}  median {sto['median']:.0f}  "
          f"std {sto['std']:.0f}  max {sto['max']:.0f}")
    print(f"zero-start deterministic: {det['mean']:.0f}")
    return sto, det


if __name__ == "__main__":
    main()
