"""Engine-free test of the real-game bridge (VERDICT round-1 item 5).

The reference validates its env against the real engine with a lockstep
loop (reference tests/test_integration.py:22-101: scripted policy, run in
both the game and the sim, trajectories compared).  No engine exists here,
so this is the functional equivalent with the engine mocked: a fake
``pyquake.client.AsyncClient`` backed by the SAME physics core, exposing
protocol-quantized velocity/origin exactly like the wire would, advancing
one frame per move command (the +sync_movements contract).

What this actually verifies is every line of ``mkdemo._eval_coro`` that
the mock does NOT share with the sim: observation assembly from client
state (_make_observation), the decoder-latch mirroring (time_remaining /
vel_z injection), action decoding to move commands (degrees->radians,
int truncation, button encoding), and demo-sink handling.
"""

import asyncio
import dataclasses
import io
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np

from q1physrl_tpu import mkdemo, phys
from q1physrl_tpu.env import core
from q1physrl_tpu.env.config import (Config, INITIAL_STATE, INITIAL_YAW_ZERO,
                                     Key)


class MockAsyncClient:
    """Stand-in for pyquake.client.AsyncClient: a lockstep 'server' that
    spawns at the env's zero-start state and applies each move command
    through phys.apply — one frame per wait_for_movement, like the
    reference's +sync_movements quakespasm hack (reference mkdemo.py:121-129).
    """

    _cfg = None  # set by the test before connect()

    def __init__(self, cfg):
        self.cfg = cfg
        f32 = np.float32
        self._player = phys.PlayerState(
            z_pos=np.asarray([INITIAL_STATE["z_pos"]], f32),
            vel_x=np.zeros(1, f32),
            vel_y=np.zeros(1, f32),
            vel_z=np.asarray([INITIAL_STATE["vel"][2]], f32),
            on_ground=np.zeros(1, bool),
            jump_released=np.ones(1, bool),
        )
        self.angles = (0.0, float(np.deg2rad(INITIAL_YAW_ZERO)), 0.0)
        self.time = 1.25  # arbitrary server-clock origin
        self.view_entity = 1
        self._cmd = None
        self._spawn_frame_pending = True
        self.moves = []

    @classmethod
    async def connect(cls, host, port):
        assert (host, port) == ("localhost", 26000)
        return cls(cls._cfg)

    def record_demo(self):
        client = self

        class _Demo:
            def stop_recording(self):
                pass

            def dump(self, f):
                f.write(b"MOCKDEMO")
                client.demo_dumped = True

        return _Demo()

    async def wait_until_spawn(self):
        pass

    def move(self, pitch, yaw, roll, forward=0, side=0, up=0, buttons=0,
             impulse=0):
        self.angles = (pitch, yaw, roll)
        self._cmd = (yaw, forward, side, buttons)
        self.moves.append(self._cmd)

    async def wait_for_movement(self, entity):
        assert entity == self.view_entity
        if self._spawn_frame_pending:
            # Spawn-sync frame: the pre-loop zero move only synchronizes.
            self._spawn_frame_pending = False
            return
        yaw_rad, forward, side, buttons = self._cmd
        f32 = np.float32
        inputs = phys.Inputs(
            yaw=np.asarray([np.rad2deg(yaw_rad)], f32),
            pitch=np.zeros(1, f32),
            roll=np.zeros(1, f32),
            fmove=np.asarray([forward], f32),
            smove=np.asarray([side], f32),
            button2=np.asarray([bool(buttons & 2)]),
            time_delta=np.asarray(self.cfg.time_delta, f32),
        )
        self._player = phys.apply(inputs, self._player)
        self.time += self.cfg.time_delta

    @property
    def velocity(self):
        """Wire-quantized velocity (sv_main.c:SV_WriteClientdataToMessage)."""
        v = np.array([float(self._player.vel_x[0]),
                      float(self._player.vel_y[0]),
                      float(self._player.vel_z[0])])
        return np.trunc(v / 16.0) * 16.0

    @property
    def player_origin(self):
        """Wire-quantized origin (common.c:MSG_WriteCoord)."""
        z = float(self._player.z_pos[0])
        return np.array([0.0, 0.0, np.round(z * 8.0) / 8.0])

    async def disconnect(self):
        self.disconnected = True


def _scripted_policy(cfg):
    """Reference DummyTrainer schedule (tests/test_integration.py:53-65):
    forward for 100 frames with a jump burst, then left-strafe with
    mouse_x=-2."""
    nk = cfg.num_keys
    counter = {"t": 0}

    def fn(obs, rng):
        t = counter["t"]
        counter["t"] += 1
        ka = np.zeros((nk, 1), np.int32)
        ya = np.zeros((1,), np.float32)
        if t < 100:
            ka[Key.FORWARD] = 1
            if 40 <= t < 60:
                ka[Key.JUMP] = 1
        else:
            ka[Key.STRAFE_LEFT] = 1
            ya[0] = -2.0
        return jnp.asarray(ka), jnp.asarray(ya)

    return fn


def test_eval_coro_matches_sim(monkeypatch):
    cfg = dataclasses.replace(Config.get_default(), num_envs=None,
                              zero_start_prob=1.0)

    # --- real-game path, engine mocked (injected client class; the
    # real-socket path is tests/test_netclient.py) ---------------------
    MockAsyncClient._cfg = cfg

    sink = io.BytesIO()
    obs_real, actions_real = asyncio.run(
        mkdemo._eval_coro(cfg, 26000, _scripted_policy(cfg), sink,
                          client_cls=MockAsyncClient))
    assert sink.getvalue() == b"MOCKDEMO"

    # --- sim path: eager loop over core.step with the same script ----
    policy = _scripted_policy(cfg)
    state = core.reset(cfg, jax.random.key(0), 1, jnp.float32)
    obs_sim = []
    for _ in range(2000):
        obs = core.compute_obs(cfg, state.player, state.yaw,
                               state.time_remaining)
        obs_sim.append(np.asarray(obs, np.float64)[0])
        ka, ya = policy(obs, None)
        state, out = core.step(cfg, state, ka, ya,
                               compute_observation=False)
        if bool(np.asarray(out.done)[0]):
            break

    obs_real = np.asarray(obs_real, np.float64)
    obs_sim = np.asarray(obs_sim)
    # Episode lengths agree to within a frame (float clock accumulation).
    assert abs(len(obs_real) - len(obs_sim)) <= 1, \
        (len(obs_real), len(obs_sim))
    n = min(len(obs_real), len(obs_sim))
    # Elementwise observation parity: time/yaw/z/vel all match what
    # compute_obs produces from the sim state (the reference test returned
    # this diff for human inspection; we assert it).
    diff = np.abs(obs_real[:n] - obs_sim[:n]).max(axis=0)
    assert diff.max() < 1e-4, diff
    assert len(actions_real) == len(obs_real)


def test_eval_coro_move_commands(monkeypatch):
    """Decoded move commands seen by the 'engine' match the decoder run on
    the sim state directly: int truncation, smoothing, jump latching."""
    cfg = dataclasses.replace(Config.get_default(), num_envs=None,
                              zero_start_prob=1.0)

    captured = {}
    orig_connect = MockAsyncClient.connect.__func__

    @classmethod
    async def connect(cls, host, port):
        c = await orig_connect(cls, host, port)
        captured["client"] = c
        return c

    monkeypatch.setattr(MockAsyncClient, "connect", connect)
    MockAsyncClient._cfg = cfg

    asyncio.run(mkdemo._eval_coro(cfg, 26000, _scripted_policy(cfg),
                                  io.BytesIO(),
                                  client_cls=MockAsyncClient))
    client = captured["client"]
    moves = client.moves[1:]  # drop the spawn-sync zero move

    policy = _scripted_policy(cfg)
    state = core.reset(cfg, jax.random.key(0), 1, jnp.float32)
    for i in range(min(len(moves), 200)):
        obs = core.compute_obs(cfg, state.player, state.yaw,
                               state.time_remaining)
        ka, ya = policy(obs, None)
        yaw, smove, fmove, jump = core.decode_actions(cfg, state, ka, ya)
        m_yaw, m_fwd, m_side, m_buttons = moves[i]
        assert m_fwd == int(np.asarray(fmove)[0])
        assert m_side == int(np.asarray(smove)[0])
        assert m_buttons == (2 if bool(np.asarray(jump)[0]) else 0)
        np.testing.assert_allclose(np.rad2deg(m_yaw),
                                   float(np.asarray(yaw)[0]), atol=1e-4)
        state, _ = core.step(cfg, state, ka, ya, compute_observation=False)

    # The script's phases are all represented in what the engine received.
    fwd = [m[1] for m in moves]
    side = [m[2] for m in moves]
    btn = [m[3] for m in moves]
    assert max(fwd) > 0 and min(side) < 0 and max(btn) == 2
