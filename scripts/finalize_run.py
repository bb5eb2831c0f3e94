"""Post-training pipeline: evaluate the best checkpoint, export artifacts.

usage: python scripts/finalize_run.py <run.yaml> <checkpoint_dir> <out_dir>

Produces in <out_dir>:
- eval.json            stochastic/deterministic zero-start statistics
- run.dem              demo of the deterministic zero-start run
- checkpoint{,.tune_metadata}   RLLib-format export of the policy
- native/ + native_meta.json    orbax export (the resumable source of truth)
- behaviour.json       air-strafe diagnostics (jumps, wish angles, efficiency)

eval.json's "checkpoint" names the committed native export (repo-relative);
"source_checkpoint" records where the weights were restored from.
"""

import json
import os
import sys

sys.path.insert(0, ".")

# Recorded paths are relative to the REPO ROOT, not the process cwd —
# running the script from elsewhere must not break the repo-relative
# provenance contract (ADVICE r3).
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _repo_rel(path: str) -> str:
    return os.path.relpath(os.path.abspath(path), REPO_ROOT)

import jax
import numpy as np


def main(argv):
    run_yaml, ckpt_dir, out_dir = argv[:3]
    os.makedirs(out_dir, exist_ok=True)

    from q1physrl_tpu import analyse, mkdemo, models
    from q1physrl_tpu.algo import checkpoint as ckpt_mod
    from q1physrl_tpu.algo.ppo import init_train_state
    from q1physrl_tpu.algo.train import (enable_compilation_cache,
                                         load_run_config)

    enable_compilation_cache()
    run = load_run_config(run_yaml)
    template = init_train_state(jax.random.key(0), run.env, run.ppo)
    path = ckpt_mod.latest_checkpoint(ckpt_dir) or ckpt_dir
    ts = ckpt_mod.restore_checkpoint(path, template)
    print(f"checkpoint {path}: iter {int(ts.iteration)}, "
          f"{int(ts.env_steps):,} steps")

    # Export the native (orbax) checkpoint into the bundle first so the
    # recorded paths point at committed artifacts, not the (possibly
    # ephemeral) restore source (ADVICE r2: eval.json provenance).
    import orbax.checkpoint as ocp

    native_dir = os.path.join(out_dir, "native")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(native_dir),
                   jax.device_get(ckpt_mod._ckpt_tree(ts)), force=True)
    with open(f"{out_dir}/native_meta.json", "w") as f:
        json.dump({"iteration": int(ts.iteration),
                   "env_steps": int(ts.env_steps),
                   "run_yaml": run_yaml,
                   "source_checkpoint": _repo_rel(path)}, f, indent=1)

    sto = analyse.eval_zero_start(ts.params, run.env, num_episodes=512)
    det = analyse.eval_zero_start(ts.params, run.env, num_episodes=2,
                                  deterministic=True)
    evals = {"checkpoint": _repo_rel(native_dir),
             "source_checkpoint": _repo_rel(path),
             "iteration": int(ts.iteration),
             "env_steps": int(ts.env_steps), "stochastic": sto,
             "deterministic": det["mean"]}
    print(json.dumps(evals, indent=1))
    with open(f"{out_dir}/eval.json", "w") as f:
        json.dump(evals, f, indent=1)

    r, corrected = mkdemo.export_sim_demo(ts.params, run.env,
                                          f"{out_dir}/run.dem",
                                          deterministic=True)
    print(f"demo: return {float(np.asarray(r.reward).sum()):.0f}, "
          f"corrected finish {corrected}")

    models.export_policy_params(
        ts.params, f"{out_dir}/checkpoint",
        iteration=int(ts.iteration), timesteps_total=int(ts.env_steps))

    jumps = int((np.diff(r.jump.astype(int)) == 1).sum())
    ds = r.hypothetical_delta_speeds()
    actual = np.diff(r.speed, prepend=r.speed[0])
    eff = float(actual[30:].sum() / ds.max(axis=0)[30:].sum())
    wrapped = ((r.wish_angle - r.move_angle + 180) % 360 - 180)
    behaviour = {
        "jumps": jumps,
        "mean_speed": float(r.speed.mean()),
        "final_speed": float(r.speed[-1]),
        "dspeed_efficiency": eff,
        "median_abs_wish_move_angle": float(np.median(np.abs(wrapped))),
        "fwd_pressed_frac": float((r.fmove > 0).mean()),
        "corrected_finish_time": corrected,
    }
    print(json.dumps(behaviour, indent=1))
    with open(f"{out_dir}/behaviour.json", "w") as f:
        json.dump(behaviour, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1:])
