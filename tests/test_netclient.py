"""Real-socket lockstep bridge test (VERDICT r3 item 3 / L5 gap).

Runs ``mkdemo._eval_coro`` — unmodified, through its DEFAULT client, the
framework's native protocol-15 implementation (utils/netclient.py) —
against the fake lockstep server (utils/lockstep_server.py) over a real
UDP socket pair.  Every byte crosses the wire in genuine NetQuake framing:
the connection handshake, the reliable signon sequence, per-frame
unreliable datagrams, clc_move commands.

This is the reference's integration-test structure
(reference tests/test_integration.py:22-101: scripted policy run in both
the game and the sim, observations compared) with the engine replaced by
the framework's own physics behind the real protocol, and with the
recorded demo additionally round-tripped through BOTH demo parsers
(Python demfile + independent C++ demparse).
"""

import asyncio
import dataclasses
import io

import jax
import jax.numpy as jnp
import numpy as np

from q1physrl_tpu import mkdemo
from q1physrl_tpu.env import core
from q1physrl_tpu.env.config import Config, Key
from q1physrl_tpu.utils.lockstep_server import LockstepServer


def _scripted_policy(cfg):
    """Reference DummyTrainer schedule (tests/test_integration.py:53-65)."""
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


async def _run_bridge(cfg, sink):
    server = LockstepServer(cfg)
    port = await server.start("127.0.0.1", 0)
    try:
        obs, actions = await asyncio.wait_for(
            mkdemo._eval_coro(cfg, port, _scripted_policy(cfg), sink,
                              host="127.0.0.1"),
            timeout=120)
    finally:
        server.close()
    return server, obs, actions


def test_eval_coro_over_real_sockets(tmp_path):
    cfg = dataclasses.replace(Config.get_default(), num_envs=None,
                              zero_start_prob=1.0)
    sink = io.BytesIO()
    server, obs_real, actions_real = asyncio.run(_run_bridge(cfg, sink))

    # The server really advanced one physics frame per move (lockstep).
    assert server.frames >= 700, server.frames

    # --- sim path with the same script --------------------------------
    # The bridge's spawn-sync move advances the real server one
    # zero-input frame BEFORE the policy loop, and _eval_coro anchors its
    # clock after that frame (reference mkdemo.py:72-74; the reference's
    # integration test drops the first real frame for the same reason,
    # reference tests/test_integration.py:96-101).  Mirror it: one
    # zero-action sim step, then reset the episode clock.
    policy = _scripted_policy(cfg)
    state = core.reset(cfg, jax.random.key(0), 1, jnp.float32)
    state, _ = core.step(cfg, state,
                         jnp.zeros((cfg.num_keys, 1), jnp.int32),
                         jnp.zeros((1,), jnp.float32),
                         compute_observation=False)
    state = state.replace(time_remaining=jnp.full(
        (1,), cfg.time_limit, state.time_remaining.dtype))
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
    # The bridge clock accumulates f32 svc_time deltas, the sim a f32
    # time_remaining — episode length skews by a frame or two at the
    # 10s boundary (the reference test tolerated the same, reference
    # tests/test_integration.py:96-101).
    assert abs(len(obs_real) - len(obs_sim)) <= 2, \
        (len(obs_real), len(obs_sim))
    n = min(len(obs_real), len(obs_sim))

    # Forward-only phase: yaw is 90 deg (exactly representable in the
    # byte angle encoding), so sim and wire agree except for protocol
    # quantization the obs model already applies -> tight parity.
    fwd = slice(0, 100)
    np.testing.assert_allclose(obs_real[fwd], obs_sim[fwd], atol=1e-5)
    # Strafe phase: move yaw crosses the wire byte-quantized
    # (360/256 deg), so server-side physics sees a slightly different
    # wish angle than the sim — the same skew the real engine produces.
    # Observed drift is a couple of velocity quanta (16 ups / 200 scale)
    # by episode end; bound it at a few quanta.
    diff = np.abs(obs_real[:n] - obs_sim[:n]).max()
    assert diff < 0.3, diff

    # --- the recorded demo parses through BOTH protocol readers -------
    from q1physrl_tpu import native
    from q1physrl_tpu.utils import demfile

    dem_path = tmp_path / "bridge.dem"
    dem_path.write_bytes(sink.getvalue())
    pt, po, py, pf = demfile.parse_demo(str(dem_path))
    assert len(pt) >= 700
    # Times advance at the lockstep frame rate.
    np.testing.assert_allclose(np.diff(pt), 1.0 / 72, atol=1e-5)
    # Recorded yaws follow the commanded schedule: 90 deg during the
    # forward phase, then decreasing by ~2 deg/frame.
    assert abs(py[50] - 90.0) < 1e-4
    assert py[300] < 90.0 - 150
    if native.dem_available():
        ct, co, cy, cf = native.parse_demo(str(dem_path))
        np.testing.assert_array_equal(ct, pt)
        np.testing.assert_array_equal(co, np.asarray(po, np.float32))
        np.testing.assert_array_equal(cy, np.asarray(py, np.float32))


def test_packet_layer_reliable_ack_roundtrip():
    """The sequenced framing acks reliable fragments and drops stale
    unreliable packets (net_dgrm.c semantics)."""

    class _Capture:
        def __init__(self):
            self.sent = []

        def sendto(self, data, addr):
            self.sent.append(data)

    from q1physrl_tpu.utils.netclient import (NETFLAG_ACK,
                                              NetQuakePacketLayer, _header)

    a, b = _Capture(), _Capture()
    tx = NetQuakePacketLayer(a, ("x", 1))
    rx = NetQuakePacketLayer(b, ("y", 2))

    tx.send_reliable(b"hello")
    kind, payload = rx.decode(a.sent[-1])
    assert (kind, payload) == ("reliable", b"hello")
    # rx acked with the same sequence number.
    (flags_len,) = np.frombuffer(b.sent[-1][:4], ">u4")
    assert int(flags_len) & NETFLAG_ACK

    tx.send_unreliable(b"frame1")
    tx.send_unreliable(b"frame2")
    p1, p2 = a.sent[-2], a.sent[-1]
    kind2, payload2 = rx.decode(p2)  # arrives first
    assert (kind2, payload2) == ("unreliable", b"frame2")
    kind1, _ = rx.decode(p1)  # late/stale -> dropped
    assert kind1 is None


def test_packet_layer_fragmented_reliable_reassembly():
    """A reliable message split across NETFLAG_DATA fragments (EOM only on
    the last) reassembles in order; each fragment is acked."""
    import struct

    from q1physrl_tpu.utils.netclient import (NETFLAG_DATA, NETFLAG_EOM,
                                              NetQuakePacketLayer, _header)

    class _Capture:
        def __init__(self):
            self.sent = []

        def sendto(self, data, addr):
            self.sent.append(data)

    rx = NetQuakePacketLayer(_Capture(), ("y", 2))
    frags = [b"aaa", b"bbbb", b"cc"]
    out = []
    for i, frag in enumerate(frags):
        flags = NETFLAG_DATA | (NETFLAG_EOM if i == len(frags) - 1 else 0)
        pkt = _header(flags | (len(frag) + 8), i) + frag
        kind, payload = rx.decode(pkt)
        out.append((kind, payload))
    assert out[:2] == [(None, b""), (None, b"")]
    assert out[2] == ("reliable", b"aaabbbbcc")
    # A duplicate fragment (stale sequence) does not corrupt the stream.
    pkt = _header(NETFLAG_DATA | NETFLAG_EOM | (2 + 8), 1) + b"zz"
    kind, _ = rx.decode(pkt)
    assert kind is None


def test_packet_layer_retransmission_recovers_loss():
    """A dropped reliable packet is recovered by resend_pending(); queued
    reliables go out in order as ACKs arrive (engine resend semantics)."""
    from q1physrl_tpu.utils.netclient import NetQuakePacketLayer

    class _Lossy:
        def __init__(self):
            self.sent = []
            self.drop_next = False

        def sendto(self, data, addr):
            if self.drop_next:
                self.drop_next = False
                return  # the network ate it
            self.sent.append(data)

    class _Sink:
        def __init__(self):
            self.sent = []

        def sendto(self, data, addr):
            self.sent.append(data)

    wire_tx, wire_rx = _Lossy(), _Sink()
    tx = NetQuakePacketLayer(wire_tx, ("x", 1))
    rx = NetQuakePacketLayer(wire_rx, ("y", 2))

    wire_tx.drop_next = True
    tx.send_reliable(b"first")       # lost on the wire
    tx.send_reliable(b"second")      # queued behind the in-flight packet
    assert wire_tx.sent == []

    tx.resend_pending()              # timer fires -> retransmit
    kind, payload = rx.decode(wire_tx.sent[-1])
    assert (kind, payload) == ("reliable", b"first")
    tx.decode(wire_rx.sent[-1])      # ACK flows back -> frees the queue
    kind, payload = rx.decode(wire_tx.sent[-1])
    assert (kind, payload) == ("reliable", b"second")

    # Duplicate delivery of a retransmitted packet is dropped but
    # re-ACKed (the ACK may have been the lost half).
    n_acks = len(wire_rx.sent)
    kind, _ = rx.decode(wire_tx.sent[-2])
    assert kind is None
    assert len(wire_rx.sent) == n_acks + 1


def test_client_wait_timeouts_fail_loudly(tmp_path):
    """Spawn/movement waits raise TimeoutError instead of hanging when the
    server goes silent."""
    import asyncio

    from q1physrl_tpu.utils.lockstep_server import LockstepServer
    from q1physrl_tpu.utils.netclient import AsyncClient

    class _SilentServer(LockstepServer):
        def _send_signon_1(self):
            pass  # accept the connection, then say nothing

    async def main():
        server = _SilentServer()
        port = await server.start("127.0.0.1", 0)
        client = await AsyncClient.connect("127.0.0.1", port, timeout=5)
        try:
            try:
                await client.wait_until_spawn(timeout=0.5)
            except TimeoutError:
                return True
            return False
        finally:
            await client.disconnect()
            server.close()

    assert asyncio.run(main())


def test_duplicate_connect_does_not_desync_signon():
    """A retransmitted CCREQ_CONNECT mid-session must not rebuild the
    server's packet layer (which would reset reliable sequence state and
    desync the signon): the engine answers a duplicate connect from a
    connected address with the existing accept (net_dgrm.c
    _Datagram_CheckNewConnections).  ADVICE r4."""
    import asyncio
    import math

    from q1physrl_tpu.utils.lockstep_server import LockstepServer
    from q1physrl_tpu.utils.netclient import (
        CCREQ_CONNECT, GAME_NAME, NET_PROTOCOL_VERSION, NETFLAG_CTL,
        AsyncClient, _header)

    async def main():
        server = LockstepServer()
        port = await server.start("127.0.0.1", 0)
        client = await AsyncClient.connect("127.0.0.1", port, timeout=10)
        try:
            layer_before = server._layer
            # Late duplicate of the connect request, as the client's 1 s
            # handshake retransmission loop would produce.
            req = (bytes([CCREQ_CONNECT]) + GAME_NAME.encode() + b"\x00"
                   + bytes([NET_PROTOCOL_VERSION]))
            client._transport.sendto(
                _header(NETFLAG_CTL | (len(req) + 4)) + req,
                ("127.0.0.1", port))
            await client.wait_until_spawn(timeout=30)
            assert server._layer is layer_before, \
                "duplicate connect rebuilt the packet layer"
            # The session still advances frames after the duplicate.
            for _ in range(5):
                client.move(0.0, math.radians(90), 0.0, 800, 0, 0, 0, 0)
                await asyncio.wait_for(
                    client.wait_for_movement(client.view_entity), 10)
            assert client.time is not None
        finally:
            await client.disconnect()
            server.close()

    asyncio.run(main())
