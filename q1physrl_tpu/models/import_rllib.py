"""Import reference RLLib checkpoints into our param pytree.

The reference's checkpoints (e.g. /root/reference/data/checkpoints/wr/) are
pickles of ``{worker: bytes, optimizer: [...], trainer_state: {...}}`` where
``worker`` unpickles to ``{filters, state: {default_policy: {name: ndarray}}}``
(RLLib 0.8.4 layout; weight names ``default_policy/fc_{1,2}/...`` etc.).
The arrays are plain NumPy, but the pickle references ray classes — a
tolerant unpickler stubs those out so no ray/TF install is needed.

TF Dense kernels are (in, out), the same layout our ``mlp_apply`` uses
(``x @ W + b``), so weights import without transposition.
"""

from __future__ import annotations

import io
import pickle

import jax.numpy as jnp
import numpy as np

__all__ = ("load_rllib_checkpoint", "import_policy_params")


class _StubUnpickler(pickle.Unpickler):
    """Unpickler that fabricates placeholder classes for unimportable
    modules (ray.*, tf.*) — we only need the ndarray leaves."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            def _setstate(self, s):
                self.__dict__.update(s if isinstance(s, dict) else {"_state": s})

            return type(name, (), {"__module__": module,
                                   "__setstate__": _setstate})


def _loads(data: bytes):
    return _StubUnpickler(io.BytesIO(data)).load()


def load_rllib_checkpoint(path: str) -> dict:
    """Load an RLLib checkpoint file -> {weight_name: ndarray} plus metadata.

    Returns dict with keys ``weights`` (name -> ndarray), ``optimizer``,
    ``filters``.
    """
    with open(path, "rb") as f:
        data = _StubUnpickler(f).load()
    worker = _loads(data["worker"])
    state = worker["state"]["default_policy"]
    if isinstance(state, bytes):
        state = _loads(state)
    weights = {k: np.asarray(v) for k, v in state.items()
               if isinstance(v, np.ndarray)}
    return {"weights": weights, "optimizer": data.get("optimizer"),
            "filters": worker.get("filters")}


def import_policy_params(path: str, dtype=jnp.float32) -> dict:
    """RLLib checkpoint -> our policy params pytree (see models.policy)."""
    ckpt = load_rllib_checkpoint(path)
    w = ckpt["weights"]

    def layer(prefix):
        return (jnp.asarray(w[f"default_policy/{prefix}/kernel"], dtype),
                jnp.asarray(w[f"default_policy/{prefix}/bias"], dtype))

    return {
        "policy": [layer("fc_1"), layer("fc_2"), layer("fc_out")],
        "value": [layer("fc_value_1"), layer("fc_value_2"),
                  layer("value_out")],
    }
