"""Plain-pytree MLPs matching the reference policy/value towers.

The reference uses RLLib 0.8.4's default TF fully-connected net (weight
shapes visible in /root/reference/data/checkpoints/wr/checkpoint:
``fc_1``/``fc_2``/``fc_out`` 6->256->256->10 and
``fc_value_1``/``fc_value_2``/``value_out`` 6->256->256->1, tanh
activations, normc weight init).  We keep params as an explicit pytree
(list of (W, b) pairs) rather than a framework module: the net is tiny, and
a bare pytree is transparent to sharding/optimizers and trivially
importable from the reference checkpoint.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ("normc_init", "init_mlp", "mlp_apply")


def normc_init(key, shape, std=1.0, dtype=jnp.float32):
    """RLLib's normc initializer: normal samples rescaled so every output
    column has L2 norm ``std`` (column-normalized over the input axis)."""
    w = jax.random.normal(key, shape, dtype)
    norm = jnp.sqrt(jnp.sum(jnp.square(w), axis=0, keepdims=True))
    return w * (std / norm)


def init_mlp(key, sizes, hidden_std=1.0, out_std=0.01, dtype=jnp.float32):
    """Init a tanh MLP; hidden layers normc(1.0), output normc(0.01) —
    matching RLLib's FC-net defaults.  Returns [(W, b), ...]."""
    params = []
    keys = jax.random.split(key, len(sizes) - 1)
    for i, (n_in, n_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        std = out_std if i == len(sizes) - 2 else hidden_std
        w = normc_init(keys[i], (n_in, n_out), std, dtype)
        b = jnp.zeros((n_out,), dtype)
        params.append((w, b))
    return params


def mlp_apply(params, x):
    """Forward pass: tanh on hidden layers, linear output."""
    *hidden, (w_out, b_out) = params
    for w, b in hidden:
        x = jnp.tanh(x @ w + b)
    return x @ w_out + b_out
