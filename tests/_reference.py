"""Load the reference implementation (/root/reference) as a test oracle.

The reference targets Python 3.7-era NumPy and the old ``gym`` package; this
shims the removed NumPy aliases and stubs a minimal ``gym`` module so the
reference env/phys modules import unmodified on this interpreter.  The
reference code itself is used read-only, purely as an oracle to verify our
from-scratch implementation against.
"""

import sys
import types

import numpy as np

REFERENCE_ENV_PATH = "/root/reference/q1physrl_env"

_loaded = {}


def _install_numpy_aliases():
    for name, val in (("bool", np.bool_), ("int", int), ("float", float),
                      ("object", object)):
        if not hasattr(np, name):
            setattr(np, name, val)


def _install_gym_stub():
    if "gym" in sys.modules:
        return

    gym = types.ModuleType("gym")
    spaces = types.ModuleType("gym.spaces")

    class Box:
        def __init__(self, low=None, high=None, shape=None, dtype=None):
            self.low = np.broadcast_to(np.asarray(low), shape).astype(dtype or np.float64)
            self.high = np.broadcast_to(np.asarray(high), shape).astype(dtype or np.float64)
            self.shape = shape
            self.dtype = dtype

    class Discrete:
        def __init__(self, n):
            self.n = n

    class Tuple:
        def __init__(self, parts):
            self.spaces = list(parts)

    spaces.Box, spaces.Discrete, spaces.Tuple = Box, Discrete, Tuple
    gym.spaces = spaces
    gym.Env = object

    envs = types.ModuleType("gym.envs")
    registration = types.ModuleType("gym.envs.registration")
    registration.register = lambda **kwargs: None
    envs.registration = registration
    gym.envs = envs

    sys.modules.update({
        "gym": gym, "gym.spaces": spaces, "gym.envs": envs,
        "gym.envs.registration": registration,
    })


def load_reference():
    """Returns (ref_phys, ref_env) modules from /root/reference."""
    if "env" not in _loaded:
        _install_numpy_aliases()
        _install_gym_stub()
        if REFERENCE_ENV_PATH not in sys.path:
            sys.path.insert(0, REFERENCE_ENV_PATH)
        import q1physrl_env.env as ref_env
        import q1physrl_env.phys as ref_phys
        _loaded["phys"] = ref_phys
        _loaded["env"] = ref_env
    return _loaded["phys"], _loaded["env"]
