"""q1physrl_tpu — a TPU-native Quake 1 movement-physics RL framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
matthewearl/q1physrl (reference mounted at /root/reference):

- ``phys``            pure, dtype-polymorphic Quake player-movement physics
                      (reference: q1physrl_env/q1physrl_env/phys.py)
- ``env``             functional batched environment + action decoder
                      (reference: q1physrl_env/q1physrl_env/env.py)
- ``models``          policy/value MLPs and the squashed-Gaussian action
                      distribution (reference: q1physrl/action_dist.py)
- ``algo``            on-device PPO actor-learner (replaces Ray RLLib 0.8.4)
- ``parallel``        device-mesh sharding of envs + data-parallel learner
                      (replaces the reference's Ray actor/object-store runtime)
- ``analyse``         trajectory evaluation and counterfactual sweeps
                      (reference: q1physrl/analyse.py)
- ``utils.demfile``   Quake protocol-15 .dem writer/reader subset
                      (replaces the reference's pyquake dependency)

Everything on the hot path is a pure function over explicit state pytrees so
that rollout + learning compiles to a single XLA program per device.
"""

__version__ = "0.1.0"

from . import phys  # noqa: F401
