#!/bin/bash
# Round-4 post-Run-B chip sequence (manual): eval replication members,
# then the on-chip kernel checks, then a bench sanity pass.
set -x
timeout 1200 python scripts/eval_sweep.py configs/run4.yml runs/sweep_r4_repl 512
timeout 1200 python scripts/tpu_checks.py
timeout 900 python bench.py
