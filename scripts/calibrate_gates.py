"""Calibrate entropy-gated anneal stages from multi-seed replication logs.

VERDICT r4 item 3: the round-4 gate table (configs/sweep_r4_tpu4.yml)
replayed win404's coeff-vs-policy-entropy trajectory alone; with a
documented ±400 seed spread, gates calibrated from one lineage may just
re-encode that seed's luck.  This script reads the four from-scratch
replication member logs (runs/sweep_r4_repl/logs/member_*.jsonl — the
full lineage schedule on seeds 1111/2222/3333/4444) and, for each
entropy-coefficient level the schedule passes through, records the
MEASURED policy entropy at the moment the schedule first engaged that
level.  The consensus (median across seeds) becomes the gate table for
entropy-gated runs: "engage coeff c once the policy is as converged as
the recipe's seeds typically were when c engaged".

The per-seed spread is the calibration's error bar and is printed (and
written) alongside the medians — see docs/RESULTS.md round 5.

Usage:
    python scripts/calibrate_gates.py [log_dir] [out_json]
Defaults: runs/sweep_r4_repl/logs  data/gate_calibration.json
"""

from __future__ import annotations

import glob
import json
import math
import sys

# Coefficient levels to calibrate, matching the lineage schedule's
# plateaus plus the intermediate levels the piecewise-linear ramps pass
# through (the 0.01->0.002 ramp crosses 0.006 and 0.004; the round-4
# gate table staged those explicitly, sweep_r4_tpu4.yml).
LEVELS = (0.02, 0.015, 0.01, 0.006, 0.004, 0.002, 0.0005, 0.0001, 0.0)

# Smooth the per-iteration measured entropy before reading it off: the
# batch-mean entropy is already low-noise at 50k samples/iter, but a
# short EMA guards against reading a single-iteration dip as the
# engagement-time level.
EMA_ALPHA = 0.2


def member_engagements(path: str) -> dict:
    """coeff level -> (env_steps, smoothed policy entropy) at the first
    iteration where the schedule's entropy_coeff reached that level."""
    out = {}
    ema = float("nan")
    with open(path) as f:
        for line in f:
            row = json.loads(line)
            ent = float(row["entropy"])
            if not math.isnan(ent):
                ema = ent if math.isnan(ema) else (
                    (1 - EMA_ALPHA) * ema + EMA_ALPHA * ent)
            coeff = float(row["entropy_coeff"])
            for lvl in LEVELS:
                # Engagement = the ramp first reaches (descends to) lvl.
                if lvl not in out and coeff <= lvl * (1 + 1e-6) + 1e-9:
                    out[lvl] = (float(row["step"]), ema)
    return out


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    log_dir = argv[0] if argv else "runs/sweep_r4_repl/logs"
    out_json = argv[1] if len(argv) > 1 else "data/gate_calibration.json"

    paths = sorted(glob.glob(f"{log_dir}/member_*.jsonl"))
    if not paths:
        raise SystemExit(f"no member logs under {log_dir}")
    per_member = {p.split("/")[-1]: member_engagements(p) for p in paths}

    table = []
    print(f"{'coeff':>8} | " + " | ".join(f"{m[:12]:>12}" for m in per_member)
          + f" | {'median':>8} {'spread':>8}")
    for lvl in LEVELS:
        ents = [per_member[m][lvl][1] for m in per_member
                if lvl in per_member[m]]
        if not ents:
            continue
        ents_sorted = sorted(ents)
        n = len(ents_sorted)
        med = (ents_sorted[n // 2] if n % 2 else
               0.5 * (ents_sorted[n // 2 - 1] + ents_sorted[n // 2]))
        spread = max(ents) - min(ents)
        row = {"coeff": lvl, "median_entropy": round(med, 4),
               "spread": round(spread, 4),
               "per_seed": {m: round(per_member[m][lvl][1], 4)
                            for m in per_member if lvl in per_member[m]},
               "per_seed_steps": {m: per_member[m][lvl][0]
                                  for m in per_member
                                  if lvl in per_member[m]}}
        table.append(row)
        cells = " | ".join(
            f"{per_member[m][lvl][1]:12.3f}" if lvl in per_member[m]
            else f"{'—':>12}" for m in per_member)
        print(f"{lvl:8.4f} | {cells} | {med:8.3f} {spread:8.3f}")

    with open(out_json, "w") as f:
        json.dump({"source": log_dir, "ema_alpha": EMA_ALPHA,
                   "levels": table}, f, indent=1)
    print(f"\nwrote {out_json}")
    return table


if __name__ == "__main__":
    main()
