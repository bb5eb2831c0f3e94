"""Plot zero-start learning curves from run logs.

usage: python scripts/plot_curves.py out.png runs/parity1.log [runs/...]

Accepts either a run's ``metrics.jsonl`` or its stdout log; overlays the
reference's published curve milestones (data/images/train.png: ~3000 @ 2M,
~5000 @ 30M, 5600-5700 plateau from 60M) for comparison.
"""

import json
import math
import re
import sys


def parse_stdout_log(path):
    out = []
    pat = re.compile(r"Iteration: \d+ .*total_steps: ([\d,]+) .*"
                     r"'zero_start_total_reward_mean': ([\d.na-]+)")
    for line in open(path):
        m = pat.search(line)
        if m and m.group(2) != "nan":
            out.append((int(m.group(1).replace(",", "")), float(m.group(2))))
    return out


def parse_metrics_jsonl(path):
    out = []
    for line in open(path):
        r = json.loads(line)
        v = r.get("zero_start_total_reward_mean", float("nan"))
        if not math.isnan(v):
            out.append((r["step"], v))
    return out


def smooth(points, window=40):
    xs, ys = [], []
    vals = [v for _, v in points]
    for i, (s, _) in enumerate(points):
        lo = max(0, i - window)
        xs.append(s)
        ys.append(sum(vals[lo:i + 1]) / (i + 1 - lo))
    return xs, ys


REFERENCE_MILESTONES = [(0, 0), (2e6, 3000), (30e6, 5000), (60e6, 5600),
                        (150e6, 5700)]


def main(argv):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_png, *logs = argv
    plt.figure(figsize=(12, 7))
    for spec in logs:
        # "path=label" attaches a legend label (e.g. sweep member names).
        path, _, label = spec.partition("=")
        pts = (parse_metrics_jsonl(path) if path.endswith(".jsonl")
               else parse_stdout_log(path))
        if not pts:
            print(f"no data in {path}")
            continue
        xs, ys = smooth(pts)
        plt.plot(xs, ys, label=label or path)
    rx, ry = zip(*REFERENCE_MILESTONES)
    plt.plot(rx, ry, "k--", alpha=0.6,
             label="reference train.png milestones (i7-6700K, 26.7h)")
    plt.xlabel("env steps")
    plt.ylabel("zero_start_total_reward_mean (smoothed)")
    plt.legend()
    plt.grid(alpha=0.3)
    plt.savefig(out_png, dpi=120, bbox_inches="tight")
    print(f"wrote {out_png}")


if __name__ == "__main__":
    main(sys.argv[1:])
