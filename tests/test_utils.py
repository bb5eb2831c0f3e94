"""Tests for metrics sinks and profiling helpers."""

import json
import time

from q1physrl_tpu.utils.metrics_io import MetricsWriter
from q1physrl_tpu.utils.profiling import StepTimer, device_memory_stats


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    w.write(100, {"a": 1.5, "b": 2})
    w.write(200, {"a": 2.5})
    w.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["step"] == 100 and rows[0]["a"] == 1.5
    assert rows[1]["step"] == 200


def test_step_timer():
    t = StepTimer(window=3)
    for _ in range(5):
        with t:
            time.sleep(0.01)
    assert len(t.times) == 3
    assert 0.005 < t.mean < 0.1
    assert t.steps_per_sec(100) > 100


def test_device_memory_stats_returns_dict():
    assert isinstance(device_memory_stats(), dict)
