"""Evaluate every best-member snapshot of a population sweep.

usage: python scripts/eval_sweep.py <base_run.yml> <sweep_dir> [episodes]

Runs the 512-episode zero-start instrument (stochastic + deterministic)
on each <sweep_dir>/best_member_XX snapshot — one compilation shared
across members — and writes <sweep_dir>/eval_summary.json sorted by
stochastic mean.
"""

import glob
import json
import os
import sys

sys.path.insert(0, ".")

import jax


def main(argv):
    run_yaml, sweep_dir = argv[:2]
    episodes = int(argv[2]) if len(argv) > 2 else 512

    from q1physrl_tpu import analyse
    from q1physrl_tpu.algo import checkpoint as ckpt_mod
    from q1physrl_tpu.algo.ppo import init_train_state
    from q1physrl_tpu.algo.train import (enable_compilation_cache,
                                         load_run_config)

    enable_compilation_cache()
    run = load_run_config(run_yaml)
    template = init_train_state(jax.random.key(0), run.env, run.ppo)

    labels = {}
    members_json = os.path.join(sweep_dir, "members.json")
    if os.path.exists(members_json):
        for i, m in enumerate(json.load(open(members_json))):
            labels[i] = m.get("label", str(i))

    rows = []
    for path in sorted(glob.glob(os.path.join(sweep_dir, "best_member_*"))):
        if not os.path.isdir(path):
            continue
        idx = int(path.rsplit("_", 1)[1])
        ts = ckpt_mod.restore_checkpoint(path, template)
        meta = {}
        if os.path.exists(path + ".json"):
            meta = json.load(open(path + ".json"))
        sto = analyse.eval_zero_start(ts.params, run.env,
                                      num_episodes=episodes)
        det = analyse.eval_zero_start(ts.params, run.env, num_episodes=2,
                                      deterministic=True)
        row = {
            "member": idx,
            "label": labels.get(idx, str(idx)),
            "checkpoint": path,
            "env_steps": int(ts.env_steps),
            "train_ema": meta.get("ema"),
            "stochastic_mean": sto["mean"],
            "stochastic_std": sto["std"],
            "stochastic_max": sto["max"],
            "deterministic": det["mean"],
        }
        rows.append(row)
        print(f"member {idx:2d} {row['label']:>20s}: "
              f"sto {sto['mean']:7.1f} ± {sto['std']:.0f}  "
              f"det {det['mean']:7.1f}  "
              f"(ema {meta.get('ema', float('nan')):.1f}, "
              f"{int(ts.env_steps)/1e6:.0f}M steps)", flush=True)

    rows.sort(key=lambda r: -r["stochastic_mean"])
    out = os.path.join(sweep_dir, "eval_summary.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"\nwrote {out}; winner: member {rows[0]['member']} "
          f"({rows[0]['label']}) at {rows[0]['stochastic_mean']:.1f}")


if __name__ == "__main__":
    main(sys.argv[1:])
