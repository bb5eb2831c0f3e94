"""Action distributions, from scratch in JAX.

Reimplements the reference's action-distribution stack
(/root/reference/q1physrl/action_dist.py) without TF/tfp/RLLib:

- :class:`Categorical` — RLLib's default for Discrete spaces.
- :class:`GaussianSquashedGaussian` — a diagonal Gaussian squashed through
  the CDF of N(0, _SCALE) onto (low, high).  The reference introduced this
  because a clipped Gaussian + entropy bonus pushes probability mass outside
  the clip region (action_dist.py:48-52); the squash keeps logp/KL/entropy
  exact.  ``_SCALE = 0.5 * 1.8137`` matches the standard-logistic variance
  (action_dist.py:149-151).

Everything is a pure function of parameter arrays, so distributions compose
freely under jit/vmap/grad.  Closed forms:

- GSG entropy  = -KL(N(mean, std) || N(0, SCALE)) + log(high - low)
  (action_dist.py:167-178) — which *is* the exact differential entropy of
  the squashed variable (change-of-variables; the Jacobian term telescopes).
- GSG KL       = KL of the unsquashed Gaussians (action_dist.py:153-165);
  the squash is a fixed bijection so KL is invariant.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ("Categorical", "GaussianSquashedGaussian", "SMALL_NUMBER",
           "MIN_LOG_NN_OUTPUT", "MAX_LOG_NN_OUTPUT")

# RLLib 0.8.4 numeric constants (ray.rllib.utils.numpy).
SMALL_NUMBER = 1e-6
MIN_LOG_NN_OUTPUT = -20.0
MAX_LOG_NN_OUTPUT = 2.0

_HALF_LOG_2PI = 0.5 * jnp.log(2.0 * jnp.pi)


def _normal_logpdf(x, mean, std):
    return -jnp.log(std) - _HALF_LOG_2PI - 0.5 * jnp.square((x - mean) / std)


@dataclasses.dataclass(frozen=True)
class Categorical:
    """Categorical over n classes, parameterized by raw logits (..., n)."""

    logits: jnp.ndarray

    def sample(self, key):
        return jax.random.categorical(key, self.logits, axis=-1)

    def mode(self):
        return jnp.argmax(self.logits, axis=-1)

    def logp(self, x):
        logz = jax.nn.log_softmax(self.logits, axis=-1)
        return jnp.take_along_axis(logz, x[..., None].astype(jnp.int32),
                                   axis=-1)[..., 0]

    def entropy(self):
        logz = jax.nn.log_softmax(self.logits, axis=-1)
        p = jnp.exp(logz)
        return -jnp.sum(p * logz, axis=-1)

    def kl(self, other: "Categorical"):
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        logq = jax.nn.log_softmax(other.logits, axis=-1)
        p = jnp.exp(logp)
        return jnp.sum(p * (logp - logq), axis=-1)


@dataclasses.dataclass(frozen=True)
class GaussianSquashedGaussian:
    """Gaussian-CDF-squashed Gaussian on (low, high).

    Parameterized by raw NN outputs ``mean_raw``/``log_std_raw`` of shape
    (...,): mean clipped to [-3, 3], log_std clipped to [-20, 2]
    (reference action_dist.py:67-76).
    """

    mean_raw: jnp.ndarray
    log_std_raw: jnp.ndarray
    low: float = -1.0
    high: float = 1.0

    _SCALE = 0.5 * 1.8137

    @property
    def log_std(self):
        return jnp.clip(self.log_std_raw, MIN_LOG_NN_OUTPUT, MAX_LOG_NN_OUTPUT)

    @property
    def mean(self):
        return jnp.clip(self.mean_raw, -3.0, 3.0)

    @property
    def std(self):
        return jnp.exp(self.log_std)

    def _squash(self, raw):
        """(squash via the CDF of N(0, _SCALE); action_dist.py:186-192)"""
        values = jax.scipy.stats.norm.cdf(raw / self._SCALE)
        return (jnp.clip(values, SMALL_NUMBER, 1.0 - SMALL_NUMBER)
                * (self.high - self.low) + self.low)

    def _unsquash(self, values):
        return self._SCALE * jax.scipy.special.ndtri(
            (values - self.low) / (self.high - self.low))

    def _log_squash_grad(self, unsquashed):
        return (_normal_logpdf(unsquashed, 0.0, self._SCALE)
                + jnp.log(self.high - self.low))

    def sample(self, key):
        eps = jax.random.normal(key, jnp.shape(self.mean),
                                jnp.result_type(self.mean))
        return self._squash(self.mean + self.std * eps)

    def mode(self):
        return self._squash(self.mean)

    def logp(self, x):
        u = self._unsquash(x)
        return _normal_logpdf(u, self.mean, self.std) - self._log_squash_grad(u)

    def entropy(self):
        mean, std, scale = self.mean, self.std, self._SCALE
        return (jnp.log(self.high - self.low)
                - (jnp.log(scale) - self.log_std
                   + (jnp.square(std) + jnp.square(mean)) / (2.0 * scale ** 2)
                   - 0.5))

    def kl(self, other: "GaussianSquashedGaussian"):
        mean, std = self.mean, self.std
        o_mean, o_std = other.mean, other.std
        return (other.log_std - self.log_std
                + (jnp.square(std) + jnp.square(mean - o_mean))
                / (2.0 * jnp.square(o_std)) - 0.5)
