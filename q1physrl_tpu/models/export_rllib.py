"""Export our policy params to the reference's RLLib-0.8.4 checkpoint
format, so agents trained here can be loaded by the reference tooling
(its mkdemo / analyse restore RLLib pickles; see
/root/reference/data/checkpoints/wr/ for the layout:
``{worker: pickled {filters, state: {default_policy: {name: ndarray}}},
optimizer: [...], trainer_state: {}}`` plus a ``.tune_metadata`` file).
"""

from __future__ import annotations

import pickle

import numpy as np

__all__ = ("export_policy_params",)

_LAYER_NAMES = ("fc_1", "fc_2", "fc_out")
_VALUE_NAMES = ("fc_value_1", "fc_value_2", "value_out")


def export_policy_params(params: dict, path: str, *, iteration: int = 0,
                         timesteps_total: int = 0, time_total_s: float = 0.0,
                         episodes_total: int = 0):
    """Write ``path`` (checkpoint pickle) and ``path + '.tune_metadata'``."""
    weights = {}
    for names, tower in ((_LAYER_NAMES, "policy"), (_VALUE_NAMES, "value")):
        for name, (w, b) in zip(names, params[tower]):
            weights[f"default_policy/{name}/kernel"] = np.asarray(w)
            weights[f"default_policy/{name}/bias"] = np.asarray(b)

    worker = pickle.dumps({"filters": {}, "state": {"default_policy": weights}})
    data = {
        "worker": worker,
        "optimizer": [int(timesteps_total), int(timesteps_total)],
        "trainer_state": {},
    }
    with open(path, "wb") as f:
        pickle.dump(data, f)
    meta = {
        "iteration": int(iteration),
        "timesteps_total": int(timesteps_total),
        "time_total": float(time_total_s),
        "episodes_total": int(episodes_total),
    }
    with open(path + ".tune_metadata", "wb") as f:
        pickle.dump(meta, f)
    return path
