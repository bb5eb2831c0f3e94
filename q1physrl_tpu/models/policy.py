"""Policy/value networks + the joint (tuple) action distribution.

Replaces the reference's RLLib model stack: the default FC net
(fc_1/fc_2/fc_out + fc_value_1/fc_value_2/value_out towers, weight shapes
per /root/reference/data/checkpoints/wr/checkpoint) combined with
``Q1PhysActionDist`` (reference action_dist.py:199-247) — per-key
Categorical(2) children plus a GaussianSquashedGaussian for the continuous
mouse axis, consuming a flat logits vector in tuple-space order.

Everything here is pure: ``params`` is a dict-of-lists pytree,
``forward(params, obs) -> (logits, value)``, and the ``ActionDist`` wrapper
exposes sample/logp/entropy/kl over the whole tuple space.  Actions use the
env core's layout: keys as an (K, N) int array, yaw as an (N,) float array.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..env.config import Config
from .distributions import Categorical, GaussianSquashedGaussian
from .mlp import init_mlp, mlp_apply

__all__ = ("init_params", "forward", "ActionDist", "action_dist")

OBS_DIM = 6
HIDDENS = (256, 256)


def init_params(key, cfg: Config, hiddens=HIDDENS, dtype=jnp.float32):
    """Init policy + value towers (RLLib FC-net layout and initializers)."""
    k_pi, k_v = jax.random.split(key)
    n_out = cfg.num_action_logits
    return {
        "policy": init_mlp(k_pi, (OBS_DIM, *hiddens, n_out), dtype=dtype),
        "value": init_mlp(k_v, (OBS_DIM, *hiddens, 1), dtype=dtype),
    }


def forward(params, obs):
    """obs (N, 6) -> (logits (N, num_action_logits), value (N,))."""
    logits = mlp_apply(params["policy"], obs)
    value = mlp_apply(params["value"], obs)[..., 0]
    return logits, value


@dataclasses.dataclass(frozen=True)
class ActionDist:
    """Joint distribution over the tuple action space.

    Children in tuple-space order (reference action_dist.py:208-228):
    ``num_keys`` x Categorical(2), then the yaw axis — continuous
    (GaussianSquashedGaussian on ±action_range, 2 inputs) or discrete
    (Categorical(2*steps+1)).
    """

    keys: tuple  # tuple of Categorical, one per key
    yaw: Optional[object]  # GaussianSquashedGaussian | Categorical | None

    def sample(self, rng):
        n_children = len(self.keys) + (1 if self.yaw is not None else 0)
        subkeys = jax.random.split(rng, n_children)
        key_actions = jnp.stack(
            [d.sample(k) for d, k in zip(self.keys, subkeys)], axis=0
        ).astype(jnp.int32)  # (K, N)
        if self.yaw is None:
            yaw_action = jnp.zeros(key_actions.shape[1],
                                   self.keys[0].logits.dtype)
        else:
            yaw_action = self.yaw.sample(subkeys[-1])
            if isinstance(self.yaw, Categorical):
                yaw_action = yaw_action.astype(self.keys[0].logits.dtype)
        return key_actions, yaw_action

    def mode(self):
        key_actions = jnp.stack([d.mode() for d in self.keys],
                                axis=0).astype(jnp.int32)
        if self.yaw is None:
            yaw_action = jnp.zeros(key_actions.shape[1],
                                   self.keys[0].logits.dtype)
        else:
            yaw_action = self.yaw.mode()
            if isinstance(self.yaw, Categorical):
                yaw_action = yaw_action.astype(self.keys[0].logits.dtype)
        return key_actions, yaw_action

    def logp(self, key_actions, yaw_action):
        lp = sum(d.logp(key_actions[i]) for i, d in enumerate(self.keys))
        if self.yaw is not None:
            if isinstance(self.yaw, Categorical):
                lp = lp + self.yaw.logp(yaw_action.astype(jnp.int32))
            else:
                lp = lp + self.yaw.logp(yaw_action)
        return lp

    def entropy(self):
        h = sum(d.entropy() for d in self.keys)
        if self.yaw is not None:
            h = h + self.yaw.entropy()
        return h

    def kl(self, other: "ActionDist"):
        kl = sum(d.kl(o) for d, o in zip(self.keys, other.keys))
        if self.yaw is not None:
            kl = kl + self.yaw.kl(other.yaw)
        return kl


def action_dist(cfg: Config, logits) -> ActionDist:
    """Split flat logits (N, num_action_logits) into the joint dist."""
    nk = cfg.num_keys
    keys = tuple(Categorical(logits[..., 2 * i:2 * i + 2]) for i in range(nk))
    yaw = None
    if cfg.allow_yaw:
        rest = logits[..., 2 * nk:]
        if cfg.discrete_yaw_steps == -1:
            yaw = GaussianSquashedGaussian(
                mean_raw=rest[..., 0], log_std_raw=rest[..., 1],
                low=-cfg.action_range, high=cfg.action_range)
        else:
            yaw = Categorical(rest)
    return ActionDist(keys=keys, yaw=yaw)
