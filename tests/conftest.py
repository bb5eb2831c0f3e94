"""Test configuration.

Must run before the first ``import jax`` anywhere:
- forces the CPU backend with 8 virtual devices so multi-chip sharding tests
  run without TPU hardware;
- enables x64 so the float64 reference-parity mode is exact (the reference
  NumPy implementation computes in mixed float32/float64).
"""

import os
import sys

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel,
# but tests must run on the virtual 8-device CPU mesh.  jax is already
# imported at interpreter startup (sitecustomize registers the TPU plugin),
# so env vars alone are too late — update the live config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
# Keep CHILD processes (notebook kernels, distributed workers) from
# registering fresh axon TPU-tunnel sessions at interpreter startup
# (sitecustomize register()s whenever PALLAS_AXON_POOL_IPS is set) — a
# stray session can stall a training run that owns the chip.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "True"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
