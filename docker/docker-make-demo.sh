#!/bin/sh
# Produce a real-engine demo from a checkpoint using the lockstep
# quakespasm oracle (counterpart of the reference's docker-make-demo.sh).
set -eu
cd "$(dirname "$0")/.."
RUN_YAML="${1:?usage: docker-make-demo.sh <run.yaml> <checkpoint_dir> <out.dem>}"
CKPT="${2:?}"
OUT="${3:?}"
docker run --rm -it \
    -v "$(pwd)/runs:/opt/q1physrl_tpu/runs" \
    -v "$(dirname "$(realpath "$OUT")"):/out" \
    --entrypoint python q1physrl_tpu:oracle \
    -c "import asyncio, q1physrl_tpu.mkdemo as m; asyncio.run(m.make_demo('$CKPT', '$RUN_YAML', '/opt/quakespasm/quakespasm/Quake/quakespasm', '/root/.quakespasm', '/out/$(basename "$OUT")'))"
