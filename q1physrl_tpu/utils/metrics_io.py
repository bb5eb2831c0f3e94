"""Host-side metrics sinks.

The reference logs to stdout, TensorBoard (via Ray/Tune event files), and
optionally wandb (reference train.py:99-105,136-147; SURVEY.md section 5.5).
Here: a JSONL file always (cheap, greppable, survives crashes), TensorBoard
when a writer implementation is importable, and wandb when installed and
configured.  All sinks are fed from on-device scalar metrics once per
iteration — metrics I/O never touches the hot path.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

__all__ = ("MetricsWriter",)


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True,
                 use_wandb: bool = False, wandb_config: Optional[dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a",
                           buffering=1)
        self._tb = None
        if use_tensorboard:
            try:  # torch ships in this image; its TB writer works standalone
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except Exception:
                self._tb = None
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project="q1physrl_tpu",
                                         config=wandb_config or {})
            except Exception:
                self._wandb = None

    def write(self, step: int, metrics: dict):
        rec = {"step": step, "time": time.time(), **metrics}
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
