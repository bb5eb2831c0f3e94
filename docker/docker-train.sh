#!/bin/sh
# Run training in the container, mounting the run directory for
# checkpoints/metrics (counterpart of the reference's docker-train.sh).
set -eu
cd "$(dirname "$0")/.."
PARAMS="${1:-configs/params.yml}"
docker run --rm -it \
    -v "$(pwd)/runs:/opt/q1physrl_tpu/runs" \
    -v "$(pwd)/$PARAMS:/opt/q1physrl_tpu/params.yml" \
    q1physrl_tpu:train params.yml
