"""Demo production — the counterpart of the reference's
``q1physrl_make_demo`` (reference mkdemo.py).

Three paths:

1. ``export_sim_demo`` (always available): roll the trained policy in the
   simulated env, integrate horizontal position from velocity, and write a
   protocol-15 .dem via utils/demfile — no game engine needed.

2. ``make_demo_lockstep`` (always available): the full lockstep protocol
   loop — the framework's native NetQuake client (utils/netclient.py)
   driving ``_eval_coro`` over real UDP — against the in-repo oracle
   server (utils/lockstep_server.py).  Every wire byte of the real path,
   no engine binary needed.  The shipped agent scores a corrected finish
   of 7.897 s this way vs 7.88 s via pure sim export — the policy
   survives byte-quantized move angles on the wire.

3. ``make_demo``: the reference's sim-to-real lockstep loop against a
   modified quakespasm dedicated server (reference mkdemo.py:95-149),
   launched with ``+sync_movements 1`` so each frame blocks until a move
   command arrives.  Uses the same native client; only the quakespasm
   binary (docker ``oracle`` image) is external.
"""

from __future__ import annotations

import dataclasses
import logging
import sys

import jax
import numpy as np

from . import analyse
from .env.config import Config

logger = logging.getLogger(__name__)

__all__ = ("export_sim_demo", "make_demo", "make_demo_lockstep",
           "main")

# The 100m map player spawn (x, y are arbitrary for the flat-plane sim; z
# matches the env's initial state).
SPAWN_ORIGIN = (0.0, 0.0, 32.84320068359375)

# Demo timing correction (reference mkdemo.py:147-149; README.md:121-134):
# runs recorded the usual way start ~1.356s in, so finish times are
# reported as finish + (1.3 + 4/72) - t0.
DEMO_TIME_CORRECTION = 1.3 + 4.0 / 72


def trajectory_from_result(r: analyse.EvalSimResult):
    """Integrate horizontal position from the recorded velocities."""
    vel = np.stack([np.asarray(r.player_state.vel_x),
                    np.asarray(r.player_state.vel_y)], axis=1)
    xy = SPAWN_ORIGIN[:2] + np.cumsum(vel * r.time_delta, axis=0)
    xy = np.concatenate([[SPAWN_ORIGIN[:2]], xy[:-1]], axis=0)
    z = np.asarray(r.player_state.z_pos)
    origins = np.concatenate([xy, z[:, None]], axis=1)
    times = np.arange(len(z)) * r.time_delta
    return times, origins, np.asarray(r.yaw)


def export_sim_demo(policy, env_config: Config, demo_file_fname: str, *,
                    seed: int = 0, deterministic: bool = True,
                    finish_y: float = 3600.0):
    """Roll out the policy in the sim and write a .dem of the run.

    ``finish_y``: distance along +y treated as the 100m finish line for
    the intermission marker (the practice map is ~3600 units long).
    Returns (EvalSimResult, corrected_finish_time | None).
    """
    from .utils import demfile

    r = analyse.eval_sim(policy, env_config, seed=seed,
                         deterministic=deterministic)
    times, origins, yaws = trajectory_from_result(r)
    crossed = np.nonzero(origins[:, 1] - SPAWN_ORIGIN[1] >= finish_y)[0]
    finish_time = float(times[crossed[0]]) if len(crossed) else None
    demfile.write_demo(demo_file_fname, times, origins, yaws,
                       finish_time=finish_time)
    corrected = (finish_time + DEMO_TIME_CORRECTION - times[0]
                 if finish_time is not None else None)
    if corrected is not None:
        logger.info("Corrected finish time: %s s", corrected)
    return r, corrected


def _make_observation(client, time_remaining, config: Config):
    """Build an observation from live game-client state exactly like the
    env does (reference mkdemo.py:39-44)."""
    from .env.config import get_obs_scale

    yaw = 180.0 * client.angles[1] / np.pi
    vel = np.array(client.velocity)
    z_pos = client.player_origin[2]
    obs = np.concatenate([[time_remaining], [yaw], [z_pos], vel])
    return obs / np.asarray(get_obs_scale(config))


async def _eval_coro(config: Config, port, policy_fn, demo_file, *,
                     host: str = "localhost", client_cls=None):
    """Lockstep eval loop against a +sync_movements quakespasm server
    (reference mkdemo.py:58-92).

    The game client defaults to the framework's own protocol-15
    implementation (utils/netclient.AsyncClient — real UDP, real wire
    bytes; the reference used the external pyquake package here).
    ``client_cls`` accepts any object with the same surface (pyquake's
    AsyncClient works unchanged, as do test mocks)."""
    from .env import core as env_core
    from .env.config import INITIAL_YAW_ZERO
    import jax.numpy as jnp

    if client_cls is None:
        from .utils.netclient import AsyncClient as client_cls

    client = await client_cls.connect(host, port)
    cfg = dataclasses.replace(config, num_envs=None)
    # Decoder state, driven functionally.
    state = env_core.reset(cfg, jax.random.key(0), 1)
    state = state.replace(yaw=jnp.full((1,), float(INITIAL_YAW_ZERO),
                                       state.yaw.dtype))
    obs_list, action_list = [], []
    try:
        demo = client.record_demo()
        await client.wait_until_spawn()
        client.move(*client.angles, 0, 0, 0, 0, 0)
        await client.wait_for_movement(client.view_entity)
        start_time = client.time
        time_remaining = None
        while time_remaining is None or time_remaining >= 0:
            time_remaining = cfg.time_limit - (client.time - start_time)
            obs = _make_observation(client, time_remaining, cfg)
            obs_list.append(obs)
            ka, ya = policy_fn(obs[None], None)
            action_list.append((np.asarray(ka), np.asarray(ya)))
            # Mirror live client state into the decoder's env state.
            state = state.replace(
                time_remaining=jnp.full((1,), time_remaining,
                                        state.time_remaining.dtype),
                player=state.player.replace(
                    vel_z=jnp.full((1,), client.velocity[2], jnp.float32)))
            yaw, smove, fmove, jump = env_core.decode_actions(
                cfg, state, jnp.asarray(ka), jnp.asarray(ya))
            # Advance the decoder latches.
            state, _ = env_core.step(cfg, state, jnp.asarray(ka),
                                     jnp.asarray(ya),
                                     compute_observation=False)
            buttons = 2 if bool(np.asarray(jump)[0]) else 0
            client.move(pitch=0, yaw=float(np.asarray(yaw)[0]) * np.pi / 180,
                        roll=0, forward=int(np.asarray(fmove)[0]),
                        side=int(np.asarray(smove)[0]), up=0,
                        buttons=buttons, impulse=0)
            await client.wait_for_movement(client.view_entity)
        demo.stop_recording()
        demo.dump(demo_file)
    finally:
        await client.disconnect()
    return obs_list, action_list


async def make_demo(checkpoint_fname, run_yaml, quakespasm_binary_fname,
                    game_dir, demo_file_fname):
    """Spawn a lockstep quakespasm server, drive the trained agent through
    the real engine, record a demo (reference mkdemo.py:95-149)."""
    import asyncio
    import signal

    from .algo import checkpoint as ckpt_mod
    from .algo.ppo import init_train_state
    from .algo.train import load_run_config

    run = load_run_config(run_yaml)
    template = init_train_state(jax.random.key(0), run.env, run.ppo)
    ts = ckpt_mod.restore_checkpoint(checkpoint_fname, template)
    policy_fn = analyse._policy_from(ts.params, run.env, deterministic=True)

    logger.info("Spawning quakespasm server")
    proc = await asyncio.create_subprocess_exec(
        quakespasm_binary_fname,
        "-protocol", "15",
        "-dedicated", "1",
        "-basedir", game_dir,
        "+host_framerate", str(1.0 / 72),
        "+sys_ticrate", "0.0",
        "+sync_movements", "1",
        "+nomonsters", "1",
        "+map", "100m")
    try:
        with open(demo_file_fname, "wb") as f:
            await _eval_coro(run.env, 26000, policy_fn, f)
    finally:
        proc.send_signal(signal.SIGINT)
    await proc.wait()

    times, origins, yaws, finish_time = analyse.parse_demo(demo_file_fname)
    corrected = (finish_time + DEMO_TIME_CORRECTION - times[0]
                 if finish_time is not None else None)
    logger.info("Corrected finish time: %s s", corrected)
    return corrected


async def make_demo_lockstep(checkpoint_fname, run_yaml, demo_file_fname):
    """Drive the trained agent through the LOCKSTEP PROTOCOL PATH without a
    game engine: the full ``_eval_coro`` loop (native protocol-15 client,
    real UDP sockets, clc_move / frame-datagram lockstep) against the
    in-repo oracle server (utils/lockstep_server.py) instead of
    quakespasm.  Exercises every wire byte ``make_demo`` would, minus the
    C engine itself."""
    from .algo import checkpoint as ckpt_mod
    from .algo.ppo import init_train_state
    from .algo.train import load_run_config
    from .utils.lockstep_server import LockstepServer

    run = load_run_config(run_yaml)
    template = init_train_state(jax.random.key(0), run.env, run.ppo)
    path = ckpt_mod.latest_checkpoint(checkpoint_fname) or checkpoint_fname
    ts = ckpt_mod.restore_checkpoint(path, template)
    policy_fn = analyse._policy_from(ts.params, run.env, deterministic=True)

    server = LockstepServer(run.env)
    port = await server.start("127.0.0.1", 0)
    try:
        with open(demo_file_fname, "wb") as f:
            await _eval_coro(run.env, port, policy_fn, f, host="127.0.0.1")
    finally:
        server.close()

    times, origins, yaws, finish_time = analyse.parse_demo(demo_file_fname)
    corrected = (finish_time + DEMO_TIME_CORRECTION - times[0]
                 if finish_time is not None else None)
    logger.info("Lockstep demo: %d frames, final y=%.0f, corrected "
                "finish=%s", len(times), origins[-1][1], corrected)
    return times, origins, yaws, finish_time


def main(argv=None):
    """CLI: export a demo from a checkpoint.

    usage: q1physrl-tpu-make-demo [--lockstep] <run.yaml> \\
               <checkpoint_dir_or_path> <out.dem>

    Default: engine-free sim export (export_sim_demo).  With --lockstep,
    run the full protocol bridge loop against the in-repo lockstep oracle
    server over real UDP (no engine required); with a quakespasm binary,
    use ``mkdemo.make_demo`` directly.
    """
    logging.basicConfig(level=logging.INFO)
    from .algo.train import enable_compilation_cache

    enable_compilation_cache()
    argv = argv if argv is not None else sys.argv[1:]
    lockstep = "--lockstep" in argv
    argv = [a for a in argv if a != "--lockstep"]
    if len(argv) < 3:
        raise SystemExit(
            "usage: q1physrl-tpu-make-demo [--lockstep] <run.yaml> "
            "<checkpoint_dir_or_path> <out.dem>")
    run_yaml, ckpt_path, out_dem = argv[:3]

    if lockstep:
        import asyncio

        times, origins, _, _ = asyncio.run(
            make_demo_lockstep(ckpt_path, run_yaml, out_dem))
        if len(times) == 0:
            raise SystemExit(
                f"lockstep bridge recorded zero TIME blocks into "
                f"{out_dem} — the oracle server died before the first "
                f"frame; nothing to report")
        print(f"wrote {out_dem} via lockstep bridge: {len(times)} frames, "
              f"final y={origins[-1][1]:.0f}")
        return

    from .algo import checkpoint as ckpt_mod
    from .algo.ppo import init_train_state
    from .algo.train import load_run_config

    run = load_run_config(run_yaml)
    template = init_train_state(jax.random.key(0), run.env, run.ppo)
    path = ckpt_mod.latest_checkpoint(ckpt_path) or ckpt_path
    ts = ckpt_mod.restore_checkpoint(path, template)
    r, corrected = export_sim_demo(ts.params, run.env, out_dem)
    total = float(np.asarray(r.reward).sum())
    print(f"wrote {out_dem}: return={total:.1f} "
          f"corrected_finish={corrected}")


if __name__ == "__main__":
    main()
