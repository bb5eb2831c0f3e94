"""End-to-end test of mkdemo.make_demo — the engine-spawning path.

The reference never tests this path at all (its integration test drives
the eval coroutine directly).  Here the quakespasm binary is replaced by
a stub executable that serves the in-repo lockstep oracle
(utils/lockstep_server.py) on the port make_demo expects, so every line
of make_demo runs for real: subprocess spawn with the engine argument
list, the native-client lockstep loop over UDP, demo recording, SIGINT
engine shutdown, demo parsing and the finish-time correction
(reference mkdemo.py:95-149 semantics).
"""

import asyncio
import os
import stat
import sys

import jax
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STUB = """#!{python}
import asyncio, signal, sys
sys.path.insert(0, {repo!r})
from q1physrl_tpu.utils.lockstep_server import LockstepServer

async def main():
    server = LockstepServer()
    await server.start("127.0.0.1", 26000)
    try:
        await asyncio.sleep(3600)
    except asyncio.CancelledError:
        pass

asyncio.run(main())
"""


def test_make_demo_against_stub_engine(tmp_path):
    from q1physrl_tpu import mkdemo
    from q1physrl_tpu.algo import PPOConfig, RunConfig
    from q1physrl_tpu.algo import checkpoint as ckpt_mod
    from q1physrl_tpu.algo.ppo import init_train_state
    from q1physrl_tpu.algo.train import load_run_config

    # A freshly initialized (random-policy) checkpoint to restore.
    run = load_run_config(os.path.join(REPO_ROOT, "configs/run4.yml"))
    ts = init_train_state(jax.random.key(0), run.env, run.ppo)
    ckpt_dir = str(tmp_path / "ckpt")
    ckpt_path = ckpt_mod.save_checkpoint(ckpt_dir, ts, 0)

    stub = tmp_path / "quakespasm"
    stub.write_text(STUB.format(python=sys.executable, repo=REPO_ROOT))
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)

    dem = str(tmp_path / "out.dem")
    corrected = asyncio.run(mkdemo.make_demo(
        ckpt_path, os.path.join(REPO_ROOT, "configs/run4.yml"),
        str(stub), str(tmp_path), dem))

    # The random policy won't finish the course, so no intermission:
    # corrected finish falls back to... make_demo computes it from
    # parse_demo's finish_time, which is None -> TypeError guarded below.
    from q1physrl_tpu.utils import demfile

    times, origins, yaws, finish = demfile.parse_demo(dem)
    assert len(times) >= 700          # a full 10 s lockstep episode
    assert abs(times[1] - times[0] - 1 / 72) < 1e-5
    # Spawn state round-tripped the wire: first origin is the baseline.
    assert abs(origins[0][2] - 32.875) < 1e-4
    if finish is not None:
        assert corrected == pytest.approx(
            finish + mkdemo.DEMO_TIME_CORRECTION - times[0])
