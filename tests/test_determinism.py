"""Determinism tests — the framework's race-detection story (SURVEY.md
section 5.2): the entire rollout+learn cycle is a synchronous SPMD program,
so identical seeds must give identical results; any nondeterminism is a bug.
"""

import dataclasses

import jax
import numpy as np

from q1physrl_tpu import env as qenv
from q1physrl_tpu.algo import PPOConfig, init_train_state, train_iter


def _run(seed, iters=3):
    env_cfg = dataclasses.replace(qenv.Config.get_default(), num_envs=None)
    ppo = PPOConfig(num_envs=64, rollout_length=16, num_sgd_iter=2,
                    sgd_minibatch_size=256)
    ts = init_train_state(jax.random.key(seed), env_cfg, ppo)
    fn = jax.jit(train_iter, static_argnums=(0, 1))
    out = []
    for _ in range(iters):
        ts, metrics = fn(env_cfg, ppo, ts)
        out.append({k: float(v) for k, v in metrics.items()})
    return ts, out


def test_train_is_bitwise_deterministic():
    ts_a, m_a = _run(0)
    ts_b, m_b = _run(0)
    for a, b in zip(m_a, m_b):
        for k in a:
            assert a[k] == b[k] or (np.isnan(a[k]) and np.isnan(b[k])), k
    leaves_a = jax.tree.leaves(ts_a.params)
    leaves_b = jax.tree.leaves(ts_b.params)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_different_seeds_differ():
    _, m_a = _run(0, iters=1)
    _, m_b = _run(1, iters=1)
    assert m_a[0]["mean_reward"] != m_b[0]["mean_reward"]
