"""ctypes binding to the C++ physics oracle (native/qphys.cpp).

The shared library is built on demand with the repo's Makefile (g++ is
assumed; the build takes <1s).  See native/qphys.cpp for why this exists:
it is the headless stand-in for the reference's quakespasm ground-truth
engine — a third, independent implementation used to cross-validate the
JAX physics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ("available", "apply", "trajectory",
           "dem_available", "parse_demo")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libqphys.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    lib.qphys_apply.argtypes = [
        ctypes.c_int, f32p, f32p, f32p, f32p, f32p, u8p, f32p,
        f64p, f32p, f32p, f32p, u8p, u8p]
    lib.qphys_apply.restype = None
    lib.qphys_trajectory.argtypes = [
        ctypes.c_int, f32p, f32p, f32p, f32p, f32p, u8p, f32p,
        ctypes.c_double, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_ubyte, ctypes.c_ubyte,
        f64p, f32p, f32p, f32p, u8p, u8p]
    lib.qphys_trajectory.restype = None
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _f32(x):
    return np.ascontiguousarray(np.asarray(x), np.float32)


def _u8(x):
    return np.ascontiguousarray(np.asarray(x)).astype(np.uint8)


def apply(inputs, state):
    """Batch apply via the C++ oracle.  ``inputs``/``state`` follow the
    q1physrl_tpu.phys SoA field layout (dicts or objects with the same
    attribute names).  Returns a dict of updated state arrays."""
    lib = _load()
    get = lambda o, k: o[k] if isinstance(o, dict) else getattr(o, k)
    yaw = _f32(get(inputs, "yaw"))
    n = yaw.shape[0]
    dt = np.broadcast_to(np.asarray(get(inputs, "time_delta"), np.float32),
                         (n,))
    # The C call updates state in place; always copy so the caller's
    # arrays are never mutated.
    z = np.array(get(state, "z_pos"), np.float64, copy=True)
    vx = np.array(get(state, "vel_x"), np.float32, copy=True)
    vy = np.array(get(state, "vel_y"), np.float32, copy=True)
    vz = np.array(get(state, "vel_z"), np.float32, copy=True)
    og = np.array(np.asarray(get(state, "on_ground")), np.uint8, copy=True)
    jr = np.array(np.asarray(get(state, "jump_released")), np.uint8,
                  copy=True)
    lib.qphys_apply(
        n, yaw, _f32(get(inputs, "pitch")), _f32(get(inputs, "roll")),
        _f32(get(inputs, "fmove")), _f32(get(inputs, "smove")),
        _u8(get(inputs, "button2")), np.ascontiguousarray(dt),
        z, vx, vy, vz, og, jr)
    return {"z_pos": z, "vel_x": vx, "vel_y": vy, "vel_z": vz,
            "on_ground": og.astype(bool), "jump_released": jr.astype(bool)}


def trajectory(inputs_seq, state0):
    """Roll a single player through T frames of inputs; returns dict of
    (T,) trajectory arrays (post-step state per frame)."""
    lib = _load()
    get = lambda o, k: o[k] if isinstance(o, dict) else getattr(o, k)
    yaw = _f32(get(inputs_seq, "yaw"))
    t = yaw.shape[0]
    dt = np.broadcast_to(np.asarray(get(inputs_seq, "time_delta"),
                                    np.float32), (t,))
    out = {
        "z_pos": np.empty(t, np.float64),
        "vel_x": np.empty(t, np.float32),
        "vel_y": np.empty(t, np.float32),
        "vel_z": np.empty(t, np.float32),
        "on_ground": np.empty(t, np.uint8),
        "jump_released": np.empty(t, np.uint8),
    }
    lib.qphys_trajectory(
        t, yaw, _f32(get(inputs_seq, "pitch")), _f32(get(inputs_seq, "roll")),
        _f32(get(inputs_seq, "fmove")), _f32(get(inputs_seq, "smove")),
        _u8(get(inputs_seq, "button2")), np.ascontiguousarray(dt),
        float(get(state0, "z_pos")), float(get(state0, "vel_x")),
        float(get(state0, "vel_y")), float(get(state0, "vel_z")),
        int(get(state0, "on_ground")), int(get(state0, "jump_released")),
        out["z_pos"], out["vel_x"], out["vel_y"], out["vel_z"],
        out["on_ground"], out["jump_released"])
    out["on_ground"] = out["on_ground"].astype(bool)
    out["jump_released"] = out["jump_released"].astype(bool)
    return out


_DEM_LIB_PATH = os.path.join(_NATIVE_DIR, "libdemparse.so")
_dem_lib = None


def _load_dem():
    global _dem_lib
    if _dem_lib is not None:
        return _dem_lib
    if not os.path.exists(_DEM_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR, "libdemparse.so"],
                       check=True, capture_output=True)
    lib = ctypes.CDLL(_DEM_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
    lib.dem_parse.argtypes = [ctypes.c_char_p, ctypes.c_long,
                              f64p, f32p, f32p,
                              ctypes.POINTER(ctypes.c_double)]
    lib.dem_parse.restype = ctypes.c_long
    _dem_lib = lib
    return lib


def dem_available() -> bool:
    try:
        _load_dem()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def parse_demo(fname, max_records: int = 1 << 20):
    """Parse a .dem via the independent C++ protocol implementation
    (native/demparse.cpp) -> (times, origins, yaws, finish_time), matching
    the shape contract of utils.demfile.parse_demo.  Exists to
    cross-validate the Python protocol code against a second reading of
    the engine wire format (the reference's equivalent oracle is pyquake,
    reference analyse.py:34-68)."""
    lib = _load_dem()
    times = np.empty(max_records, np.float64)
    origins = np.empty((max_records, 3), np.float32)
    yaws = np.empty(max_records, np.float32)
    finish = ctypes.c_double(-1.0)
    n = lib.dem_parse(os.fsencode(fname), max_records, times,
                      origins.reshape(-1), yaws, ctypes.byref(finish))
    if n < 0:
        raise ValueError(f"dem_parse failed with code {n} on {fname}")
    finish_time = None if finish.value < 0 else finish.value
    return (times[:n].copy(), origins[:n].copy(), yaws[:n].copy(),
            finish_time)
