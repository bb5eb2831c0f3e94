#!/bin/bash
# Round-5 post-cohort sequence: run AFTER the sweep supervisor exits.
# Keeps every chip job under a stale-log supervisor-equivalent timeout.
set -x
cd /root/repo

# 1. Gate-engagement report (host-side).
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python scripts/gate_report.py runs/sweep_r5_repl2

# 2. Chip eval: 512-episode instrument on each best member.
timeout 1200 python scripts/eval_sweep.py configs/run4.yml runs/sweep_r5_repl2 \
  > runs/sweep_r5_repl2/eval.log 2>&1

# 3. Archive everything that must survive the sandbox.
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python scripts/archive_sweep.py runs/sweep_r5_repl2 data/checkpoints/repl_r5

# 4. Cohort curves figure.
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python scripts/plot_curves.py docs/images/repl_r5_curves.png \
  "runs/sweep_r5_repl2/logs/member_00.jsonl=gr5555" \
  "runs/sweep_r5_repl2/logs/member_01.jsonl=gr6666" \
  "runs/sweep_r5_repl2/logs/member_02.jsonl=gr7777" \
  "runs/sweep_r5_repl2/logs/member_03.jsonl=gr8888"

tail -5 runs/sweep_r5_repl2/eval.log
