"""Property-style fuzzing of the protocol stack (VERDICT r4 item 4).

The reference outsourced all wire handling to the battle-tested pyquake
package (reference analyse.py:34-68, mkdemo.py:58-92); this repo's
demfile / netclient / demparse.cpp stack reimplements it, so robustness
has to be established the property way:

1. AGREEMENT on generated valid streams: a seeded random svc-message
   generator emits structurally valid demos with a known ground truth;
   ``demfile.parse_demo``, the independent C++ parser
   (``native.parse_demo``), and ``netclient.AsyncClient._handle_messages``
   must all agree with the model (and each other) on every stream.
2. CLEAN FAILURE on mutated streams: truncation, byte flips, inserted
   garbage, and corrupted block lengths must yield either a successful
   parse or a ``ValueError`` — never a hang, an uncaught low-level
   exception (struct.error / IndexError), or a silent misparse (when
   both Python and C++ parsers accept a mutated stream they must still
   agree).

Well over 1000 generated streams run across the three tests.
"""

import asyncio
import math
import random
import struct

import numpy as np
import pytest

from q1physrl_tpu.utils import demfile
from q1physrl_tpu.utils.demfile import ServerMessageType as T
from q1physrl_tpu import native


def f32(v: float) -> float:
    """Round-trip a Python float through wire float32."""
    return struct.unpack("<f", struct.pack("<f", v))[0]


def qcoord(v: float) -> float:
    """13.3 fixed-point quantization applied by the wire format."""
    return max(-32768, min(32767, int(round(v * 8.0)))) / 8.0


def qangle(v: float) -> float:
    """Signed-byte angle quantization (value * 256 / 360)."""
    b = int(round(v * 256.0 / 360.0)) & 0xFF
    return (b - 256 if b >= 128 else b) * 360.0 / 256.0


class StreamGen:
    """Seeded generator of structurally valid demo streams with ground
    truth for both parser semantics (previous-frame patching, the
    reference parse_demo contract) and client semantics (baseline
    reset, CL_ParseUpdate)."""

    VIEW_ENTITY = 1

    def __init__(self, rng: random.Random):
        self.rng = rng
        # Ground truth (parser semantics).
        self.times = []
        self.origins = []
        self.yaws = []
        self.finish_time = None
        # Parser state being modelled.
        self._origin = None
        self._time = None
        # Client-semantics state.
        self._baseline = None
        self.client_origin = None
        self.blocks = []  # (view_angles, payload bytes)

    # -- message emitters (each writes wire bytes AND updates the model)

    def _emit_preamble(self, w):
        rng = self.rng
        w.u8(T.SERVERINFO)
        w.s32(demfile.PROTOCOL_VERSION)
        w.u8(rng.randrange(1, 9))
        w.u8(rng.randrange(2))
        w.string("fuzz level")
        for _ in range(rng.randrange(4)):
            w.string(f"progs/m{rng.randrange(100)}.mdl")
        w.string("")
        for _ in range(rng.randrange(4)):
            w.string(f"sound/s{rng.randrange(100)}.wav")
        w.string("")
        w.u8(T.SETVIEW)
        w.s16(self.VIEW_ENTITY)
        w.u8(T.SPAWNBASELINE)
        w.s16(self.VIEW_ENTITY)
        w.u8(1); w.u8(0); w.u8(0); w.u8(0)
        base = []
        for _ in range(3):
            c = rng.uniform(-1000, 1000)
            w.coord(c)
            w.angle(rng.uniform(-180, 180))
            base.append(qcoord(c))
        self._origin = tuple(base)
        self._baseline = tuple(base)
        self.client_origin = tuple(base)

    def _emit_fast_update(self, w, view: bool):
        rng = self.rng
        ent = self.VIEW_ENTITY if view else rng.randrange(2, 600)
        bits = demfile.U_SIGNAL
        for b in (demfile.U_ORIGIN1, demfile.U_ORIGIN2, demfile.U_ORIGIN3,
                  demfile.U_ANGLE1, demfile.U_ANGLE2, demfile.U_ANGLE3,
                  demfile.U_FRAME, demfile.U_MODEL, demfile.U_COLORMAP,
                  demfile.U_SKIN, demfile.U_EFFECTS):
            if rng.random() < 0.4:
                bits |= b
        if ent > 255:
            bits |= demfile.U_LONGENTITY
        if bits & 0xFF00:
            bits |= demfile.U_MOREBITS
        w.u8(bits & 0xFF)
        if bits & demfile.U_MOREBITS:
            w.u8((bits >> 8) & 0xFF)
        if bits & demfile.U_LONGENTITY:
            w.s16(ent)
        else:
            w.u8(ent)
        for flag in (demfile.U_MODEL, demfile.U_FRAME, demfile.U_COLORMAP,
                     demfile.U_SKIN, demfile.U_EFFECTS):
            if bits & flag:
                w.u8(rng.randrange(256))
        upd = [None, None, None]
        for k, (ob, ab) in enumerate(
                ((demfile.U_ORIGIN1, demfile.U_ANGLE1),
                 (demfile.U_ORIGIN2, demfile.U_ANGLE2),
                 (demfile.U_ORIGIN3, demfile.U_ANGLE3))):
            if bits & ob:
                c = rng.uniform(-1000, 1000)
                w.coord(c)
                upd[k] = qcoord(c)
            if bits & ab:
                w.angle(rng.uniform(-180, 180))
        if view:
            # Parser semantics: patch from previous frame.
            self._origin = tuple(
                o if u is None else u for o, u in zip(self._origin, upd))
            # Client semantics: omitted components reset to baseline.
            self.client_origin = tuple(
                b if u is None else u
                for b, u in zip(self._baseline, upd))

    def _emit_filler(self, w):
        rng = self.rng
        choice = rng.randrange(16)
        if choice == 0:
            w.u8(T.NOP)
        elif choice == 1:
            w.u8(T.UPDATESTAT); w.u8(rng.randrange(32))
            w.s32(rng.randrange(-1000, 1000))
        elif choice == 2:
            w.u8(T.PRINT); w.string("hello fuzz")
        elif choice == 3:
            w.u8(T.SETANGLE)
            for _ in range(3):
                w.angle(rng.uniform(-180, 180))
        elif choice == 4:
            w.u8(T.SOUND)
            mask = rng.randrange(4)
            w.u8(mask)
            if mask & 1:
                w.u8(255)
            if mask & 2:
                w.u8(64)
            w.s16(rng.randrange(1000))
            w.u8(rng.randrange(256))
            for _ in range(3):
                w.coord(rng.uniform(-1000, 1000))
        elif choice == 5:
            # CLIENTDATA with a random bit subset.
            bits = 0
            for b in (demfile.SU_VIEWHEIGHT, demfile.SU_IDEALPITCH,
                      demfile.SU_PUNCH1, demfile.SU_PUNCH2,
                      demfile.SU_PUNCH3, demfile.SU_VELOCITY1,
                      demfile.SU_VELOCITY2, demfile.SU_VELOCITY3,
                      demfile.SU_WEAPONFRAME, demfile.SU_ARMOR,
                      demfile.SU_WEAPON):
                if rng.random() < 0.4:
                    bits |= b
            w.u8(T.CLIENTDATA)
            self.bts = bits
            w.b.write(struct.pack("<H", bits))
            if bits & demfile.SU_VIEWHEIGHT:
                w.b.write(struct.pack("<b", 22))
            if bits & demfile.SU_IDEALPITCH:
                w.b.write(struct.pack("<b", 0))
            for i in range(3):
                if bits & (demfile.SU_PUNCH1 << i):
                    w.b.write(struct.pack("<b", 0))
                if bits & (demfile.SU_VELOCITY1 << i):
                    w.b.write(struct.pack("<b", rng.randrange(-90, 90)))
            w.s32(0)
            if bits & demfile.SU_WEAPONFRAME:
                w.u8(0)
            if bits & demfile.SU_ARMOR:
                w.u8(0)
            if bits & demfile.SU_WEAPON:
                w.u8(0)
            w.s16(100)
            w.u8(0)
            for _ in range(4):
                w.u8(0)
            w.u8(0)
        elif choice == 6:
            w.u8(T.TEMP_ENTITY)
            t = rng.choice((0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13))
            w.u8(t)
            if t in (5, 6, 9, 13):
                w.s16(rng.randrange(600))
                for _ in range(6):
                    w.coord(rng.uniform(-1000, 1000))
            elif t == 12:
                for _ in range(3):
                    w.coord(rng.uniform(-1000, 1000))
                w.u8(0); w.u8(8)
            else:
                for _ in range(3):
                    w.coord(rng.uniform(-1000, 1000))
        elif choice == 7:
            w.u8(T.PARTICLE)
            for _ in range(3):
                w.coord(rng.uniform(-1000, 1000))
            for _ in range(3):
                w.b.write(struct.pack("<b", rng.randrange(-128, 128)))
            w.u8(2); w.u8(rng.randrange(256))
        elif choice == 8:
            w.u8(T.DAMAGE)
            w.u8(1); w.u8(2)
            for _ in range(3):
                w.coord(rng.uniform(-1000, 1000))
        elif choice == 9:
            w.u8(T.SPAWNSTATIC)
            w.u8(1); w.u8(0); w.u8(0); w.u8(0)
            for _ in range(3):
                w.coord(rng.uniform(-1000, 1000))
                w.angle(rng.uniform(-180, 180))
        elif choice == 10:
            # Baseline for a NON-view entity (view baseline is preamble-
            # only: re-baselining the view entity mid-stream would
            # legitimately diverge parser vs client origin semantics).
            w.u8(T.SPAWNBASELINE)
            w.s16(rng.randrange(2, 600))
            w.u8(1); w.u8(0); w.u8(0); w.u8(0)
            for _ in range(3):
                w.coord(rng.uniform(-1000, 1000))
                w.angle(rng.uniform(-180, 180))
        elif choice == 11:
            w.u8(T.LIGHTSTYLE); w.u8(rng.randrange(64)); w.string("am")
        elif choice == 12:
            w.u8(T.UPDATEFRAGS); w.u8(0); w.s16(rng.randrange(100))
        elif choice == 13:
            w.u8(T.SPAWNSTATICSOUND)
            for _ in range(3):
                w.coord(rng.uniform(-1000, 1000))
            w.u8(1); w.u8(255); w.u8(64)
        elif choice == 14:
            w.u8(rng.choice((T.KILLEDMONSTER, T.FOUNDSECRET, T.SELLSCREEN)))
        else:
            w.u8(T.CDTRACK); w.u8(3); w.u8(3)

    def generate(self, n_frames: int):
        rng = self.rng
        w = demfile._Writer()
        self._emit_preamble(w)
        w.u8(T.SIGNONNUM)
        w.u8(3)
        first_angles = (0.0, f32(rng.uniform(-180, 180)), 0.0)
        self.blocks.append((first_angles, w.getvalue()))

        time = 1.0
        for _ in range(n_frames):
            w = demfile._Writer()
            angles = (0.0, f32(rng.uniform(-180, 180)), 0.0)
            for _ in range(rng.randrange(3)):
                self._emit_filler(w)
            if rng.random() < 0.9:
                time += rng.uniform(0.001, 0.1)
                w.u8(T.TIME)
                w.f32(time)
                self._time = f32(time)
                self.times.append(self._time)
                self.origins.append(self._origin)
                self.yaws.append(angles[1])
            if rng.random() < 0.8:
                self._emit_fast_update(w, view=rng.random() < 0.7)
            for _ in range(rng.randrange(2)):
                self._emit_filler(w)
            if (self.finish_time is None and self._time is not None
                    and rng.random() < 0.05):
                w.u8(T.INTERMISSION)
                self.finish_time = self._time
            self.blocks.append((angles, w.getvalue()))

        w = demfile._Writer()
        w.u8(T.DISCONNECT)
        self.blocks.append(((0.0, 0.0, 0.0), w.getvalue()))

    def write(self, fname):
        with open(fname, "wb") as f:
            demo = demfile.DemoWriter(f)
            for angles, payload in self.blocks:
                demo.write_block(angles, payload)


def _gen(seed: int, n_frames=None) -> StreamGen:
    rng = random.Random(seed)
    g = StreamGen(rng)
    g.generate(rng.randrange(5, 40) if n_frames is None else n_frames)
    return g


NATIVE_DEM = native.dem_available()


def test_fuzz_parser_agreement(tmp_path):
    """400 generated streams: demfile.parse_demo must reproduce the
    generator's ground truth exactly, and the independent C++ parser
    must agree with it record-for-record."""
    fname = str(tmp_path / "fuzz.dem")
    for seed in range(400):
        g = _gen(seed)
        g.write(fname)
        times, origins, yaws, finish = demfile.parse_demo(fname)
        assert len(times) == len(g.times), seed
        np.testing.assert_array_equal(times, np.array(g.times), err_msg=str(seed))
        np.testing.assert_allclose(
            origins.astype(np.float64),
            np.array(g.origins, np.float64), atol=1e-4, err_msg=str(seed))
        np.testing.assert_allclose(
            yaws, np.array(g.yaws, np.float32), atol=1e-4, err_msg=str(seed))
        if g.finish_time is None:
            assert finish is None, seed
        else:
            assert finish == pytest.approx(g.finish_time), seed

        if NATIVE_DEM:
            nt, no, ny, nf = native.parse_demo(fname)
            np.testing.assert_array_equal(nt, times, err_msg=str(seed))
            np.testing.assert_allclose(
                no.astype(np.float64), origins.astype(np.float64),
                atol=1e-4, err_msg=str(seed))
            np.testing.assert_allclose(ny, yaws, atol=1e-4, err_msg=str(seed))
            assert (nf is None) == (finish is None), seed
            if nf is not None:
                assert nf == pytest.approx(finish), seed


def test_fuzz_netclient_agreement():
    """200 generated streams through AsyncClient._handle_messages: the
    client must track time / view entity / intermission and the
    baseline-reset origin semantics (CL_ParseUpdate) without error."""
    from q1physrl_tpu.utils.netclient import AsyncClient

    class _StubLayer:
        def send_reliable(self, payload):
            pass

        def send_unreliable(self, payload):
            pass

    async def run_one(seed):
        g = _gen(seed + 10_000)
        client = AsyncClient()
        client._layer = _StubLayer()
        for angles, payload in g.blocks:
            if payload:
                client._handle_messages(payload)
            if client._disconnected:
                break
        assert client.view_entity == g.VIEW_ENTITY, seed
        assert client.level_name == "fuzz level", seed
        if g.times:
            assert client.time == pytest.approx(g.times[-1]), seed
        assert client.intermission == (g.finish_time is not None), seed
        got = client.entities[g.VIEW_ENTITY].origin
        assert got == pytest.approx(g.client_origin, abs=1e-4), seed

    async def run_all():
        for seed in range(200):
            await run_one(seed)

    asyncio.run(run_all())


def _mutate(rng: random.Random, data: bytearray) -> bytearray:
    kind = rng.randrange(4)
    if kind == 0 and len(data) > 2:          # truncate
        return data[:rng.randrange(1, len(data))]
    if kind == 1 and len(data) > 0:          # flip random bytes
        out = bytearray(data)
        for _ in range(rng.randrange(1, 8)):
            out[rng.randrange(len(out))] = rng.randrange(256)
        return out
    if kind == 2:                            # insert garbage
        out = bytearray(data)
        at = rng.randrange(len(out) + 1)
        out[at:at] = bytes(rng.randrange(256)
                           for _ in range(rng.randrange(1, 16)))
        return out
    # corrupt a block-length field (first block header after CD line)
    out = bytearray(data)
    nl = out.find(b"\n")
    if nl >= 0 and nl + 5 <= len(out):
        struct.pack_into("<i", out, nl + 1,
                         rng.choice((-1, -12345, 2**31 - 1, len(out) * 2)))
    return out


def test_fuzz_mutated_streams_fail_cleanly(tmp_path):
    """600 mutated streams: every parser either succeeds or raises a
    clean ValueError — no struct.error/IndexError leaks, no hangs; and
    when BOTH Python and C++ accept a mutated stream they still agree
    on the record count (no silent divergence)."""
    from q1physrl_tpu.utils.netclient import AsyncClient

    class _StubLayer:
        def send_reliable(self, payload):
            pass

    fname = str(tmp_path / "mut.dem")
    n_py_ok = n_py_err = 0
    for case in range(600):
        rng = random.Random(900_000 + case)
        g = _gen(rng.randrange(1_000_000), n_frames=rng.randrange(3, 12))
        base = bytearray()
        base += b"-1\n"
        for angles, payload in g.blocks:
            base += struct.pack("<i", len(payload))
            base += struct.pack("<3f", *angles)
            base += payload
        data = _mutate(rng, base)
        with open(fname, "wb") as f:
            f.write(data)

        py_result = None
        try:
            py_result = demfile.parse_demo(fname)
            n_py_ok += 1
        except ValueError:
            n_py_err += 1

        if NATIVE_DEM:
            try:
                nat = native.parse_demo(fname)
            except ValueError:
                nat = None
            if py_result is not None and nat is not None:
                assert len(nat[0]) == len(py_result[0]), case

        # The client message handler over each mutated block payload:
        # clean ValueError or success, nothing else.
        async def run_client():
            client = AsyncClient()
            client._layer = _StubLayer()
            pos = data.find(b"\n") + 1
            while pos + 16 <= len(data):
                (length,) = struct.unpack_from("<i", data, pos)
                start = pos + 16
                if length < 0 or start + length > len(data):
                    break
                payload = bytes(data[start:start + length])
                pos = start + length
                if payload:
                    try:
                        client._handle_messages(payload)
                    except ValueError:
                        pass
                if client._disconnected:
                    break

        asyncio.run(run_client())

    # The mutation mix must actually exercise both outcomes.
    assert n_py_ok > 20, (n_py_ok, n_py_err)
    assert n_py_err > 100, (n_py_ok, n_py_err)
