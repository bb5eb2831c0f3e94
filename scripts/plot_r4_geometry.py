"""Round-4 chip-geometry ablation figure: EMA curves of the three 8192-env
attempts against the schedule coordinate (reference-equivalent env steps =
sgd_samples / 30), with the 400-env recipe milestones for context.

usage: python scripts/plot_r4_geometry.py docs/images/tpu_r4_curves.png
"""

import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

RUNS = [
    ("runs/sweep_r4_tpu/logs/member_00.jsonl", 30,
     "attempt 1: w96, mb256, 30 epochs (lag 16x)"),
    ("runs/sweep_r4_tpu2/logs/member_00.jsonl", 30,
     "attempt 2: w24, mb128, 30 epochs (lag 3.9x)"),
    ("runs/sweep_r4_tpu3/logs/member_00.jsonl", 3,
     "attempt 3: w96, mb128, 3 epochs (fresh data, lag 1.6x)"),
]


def main(out):
    fig, ax = plt.subplots(figsize=(9, 5.5))
    for path, epochs, label in RUNS:
        try:
            rows = [json.loads(l) for l in open(path)]
        except FileNotFoundError:
            continue
        x = [r["step"] * epochs / 30 / 1e6 for r in rows]
        y = [r["zs_ema"] for r in rows]
        ax.plot(x, y, label=label, linewidth=1.4)
    # 400-env recipe context (docs/RESULTS.md): win404 EMA milestones.
    ax.plot([160, 185, 250, 393, 460], [5750, 5767, 5798, 5921, 5928],
            "k*--", linewidth=0.8, markersize=8,
            label="400-env recipe lineage (win404 milestones)")
    ax.axhline(5690, color="gray", linestyle=":",
               label="reference WR, same instrument (5,690)")
    ax.set_xlabel("schedule coordinate (reference-equivalent env steps, M "
                  "= SGD samples / 30)")
    ax.set_ylabel("zero-start return (train EMA)")
    ax.set_title("8192-env geometry: what transfers the 400-env recipe "
                 "(round 4)")
    ax.legend(loc="lower right", fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1])
