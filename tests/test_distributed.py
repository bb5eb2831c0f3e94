"""Multi-process jax.distributed exercise (VERDICT round-1 item 6).

The reference's multi-process runtime was Ray actors on one box
(reference train.py:108); ours is jax.distributed — the same SPMD
train_iter laid over a mesh that spans processes.  This test launches two
subprocess workers, each owning 4 virtual CPU devices, joined through a
local coordinator: the real multi-host code path (coordination-service
handshake, global mesh construction, cross-process collectives) minus the
physical second host.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_iter():
    port = _free_port()
    n_proc = 2
    env = dict(os.environ)
    # Must be set before the interpreter starts: sitecustomize imports jax.
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_ENABLE_X64", None)  # workers run the float32 TPU mode

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), str(n_proc)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(n_proc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))

    assert {r["process"] for r in results} == {0, 1}
    # Replicated params agree across processes after cross-process
    # gradient all-reduces, and both report the same (replicated) metrics.
    assert results[0]["checksum"] == results[1]["checksum"]
    assert results[0]["entropy"] == results[1]["entropy"]
    assert np.isfinite(results[0]["entropy"])
    assert all(r["iteration"] == 2 for r in results)
