"""Model-layer tests: distribution math (Monte-Carlo validated closed
forms), normc init, and the end-to-end oracle test — the reference
world-record checkpoint imported into our stack must reproduce its
~5700 zero-start return inside our environment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from q1physrl_tpu import env as qenv
from q1physrl_tpu import models
from q1physrl_tpu.models.distributions import (Categorical,
                                               GaussianSquashedGaussian)

WR_CHECKPOINT = "/root/reference/data/checkpoints/wr/checkpoint"


def test_normc_init_column_norms():
    w = models.normc_init(jax.random.key(0), (64, 32), std=1.0)
    norms = np.linalg.norm(np.asarray(w), axis=0)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    w = models.normc_init(jax.random.key(1), (64, 32), std=0.01)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(w), axis=0), 0.01,
                               atol=1e-6)


def test_categorical_logp_entropy_kl():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(7, 5)), jnp.float32)
    d = Categorical(logits)
    p = np.exp(np.asarray(jax.nn.log_softmax(logits, axis=-1)))
    x = jnp.asarray([0, 1, 2, 3, 4, 0, 1])
    np.testing.assert_allclose(np.asarray(d.logp(x)),
                               np.log(p[np.arange(7), np.asarray(x)]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d.entropy()),
                               -(p * np.log(p)).sum(-1), rtol=1e-5)
    logits2 = jnp.asarray(np.random.default_rng(1).normal(size=(7, 5)), jnp.float32)
    q = np.exp(np.asarray(jax.nn.log_softmax(logits2, axis=-1)))
    np.testing.assert_allclose(np.asarray(d.kl(Categorical(logits2))),
                               (p * (np.log(p) - np.log(q))).sum(-1), rtol=1e-4)


def test_gsg_squash_roundtrip():
    d = GaussianSquashedGaussian(mean_raw=jnp.zeros(5), log_std_raw=jnp.zeros(5),
                                 low=-10.0, high=10.0)
    x = jnp.asarray([-3.0, -0.5, 0.0, 0.7, 2.9])
    np.testing.assert_allclose(np.asarray(d._unsquash(d._squash(x))),
                               np.asarray(x), atol=1e-4)
    v = np.asarray(d._squash(x))
    assert np.all(v > -10) and np.all(v < 10)


def test_gsg_logp_integrates_to_one():
    """logp must be a valid density over (low, high)."""
    d = GaussianSquashedGaussian(mean_raw=jnp.asarray(0.8),
                                 log_std_raw=jnp.asarray(-0.3),
                                 low=-10.0, high=10.0)
    grid = jnp.linspace(-10 + 1e-4, 10 - 1e-4, 200001, dtype=jnp.float64)
    p = np.exp(np.asarray(d.logp(grid)))
    integral = np.trapezoid(p, np.asarray(grid))
    np.testing.assert_allclose(integral, 1.0, atol=1e-3)


def test_gsg_entropy_and_kl_match_monte_carlo():
    d = GaussianSquashedGaussian(mean_raw=jnp.asarray(0.5),
                                 log_std_raw=jnp.asarray(0.2),
                                 low=-10.0, high=10.0)
    other = GaussianSquashedGaussian(mean_raw=jnp.asarray(-0.4),
                                     log_std_raw=jnp.asarray(-0.1),
                                     low=-10.0, high=10.0)
    n = 400_000
    eps = jax.random.normal(jax.random.key(0), (n,), jnp.float64)
    u = d.mean + d.std * eps
    v = d._squash(u)
    lp = np.asarray(d.logp(v))
    # Entropy: -E[log p] over squashed samples == closed form.
    np.testing.assert_allclose(-lp.mean(), float(d.entropy()), atol=1e-2)
    # KL: E[log p - log q]; squash Jacobians cancel -> unsquashed-Gaussian KL.
    lq = np.asarray(other.logp(v))
    np.testing.assert_allclose((lp - lq).mean(), float(d.kl(other)), atol=1e-2)


def test_gsg_matches_reference_formulas():
    """Closed-form entropy/KL equal the reference TF expressions
    (action_dist.py:153-178) evaluated in NumPy."""
    rng = np.random.default_rng(2)
    mean = rng.normal(size=8) * 2
    log_std = rng.normal(size=8) * 0.5
    o_mean = rng.normal(size=8) * 2
    o_log_std = rng.normal(size=8) * 0.5
    d = GaussianSquashedGaussian(jnp.asarray(mean), jnp.asarray(log_std),
                                 low=-10.0, high=10.0)
    o = GaussianSquashedGaussian(jnp.asarray(o_mean), jnp.asarray(o_log_std),
                                 low=-10.0, high=10.0)
    scale = 0.5 * 1.8137
    std, o_std = np.exp(log_std), np.exp(o_log_std)
    mean_c = np.clip(mean, -3, 3)
    o_mean_c = np.clip(o_mean, -3, 3)
    ref_kl = (o_log_std - log_std
              + (std ** 2 + (mean_c - o_mean_c) ** 2) / (2 * o_std ** 2) - 0.5)
    ref_ent = (np.log(20.0) - (np.log(scale) - log_std
                               + (std ** 2 + mean_c ** 2) / (2 * scale ** 2) - 0.5))
    np.testing.assert_allclose(np.asarray(d.kl(o)), ref_kl, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d.entropy()), ref_ent, rtol=1e-6)


def test_joint_dist_shapes_and_logp():
    cfg = qenv.Config.get_default()
    params = models.init_params(jax.random.key(0), cfg)
    obs = jnp.zeros((17, 6), jnp.float32)
    logits, value = models.forward(params, obs)
    assert logits.shape == (17, cfg.num_action_logits) == (17, 10)
    assert value.shape == (17,)
    dist = models.action_dist(cfg, logits)
    ka, ya = dist.sample(jax.random.key(1))
    assert ka.shape == (cfg.num_keys, 17) and ka.dtype == jnp.int32
    assert ya.shape == (17,)
    assert np.all(np.abs(np.asarray(ya)) <= cfg.action_range)
    lp = dist.logp(ka, ya)
    assert lp.shape == (17,)
    assert np.all(np.isfinite(np.asarray(lp)))
    # Fresh init (out_std=0.01): near-uniform keys -> logp ~ 4*log(1/2) + yaw.
    h = np.asarray(dist.entropy())
    assert np.all(h > 0)


def run_wr_policy(cfg, n, steps, mode, seed=0):
    params = models.import_policy_params(WR_CHECKPOINT)
    state = qenv.reset(cfg, jax.random.key(seed), n)

    def body(carry, t):
        st, rng, ret, alive = carry
        obs = qenv.compute_obs(cfg, st.player, st.yaw,
                               st.time_remaining).astype(jnp.float32)
        logits, _ = models.forward(params, obs)
        dist = models.action_dist(cfg, logits)
        rng, k = jax.random.split(rng)
        ka, ya = dist.mode() if mode else dist.sample(k)
        st, out = qenv.step(cfg, st, ka, ya, compute_observation=False)
        ret = ret + out.reward * alive
        alive = alive & ~out.done
        return (st, rng, ret, alive), None

    init = (state, jax.random.key(seed + 1), jnp.zeros(n), jnp.ones(n, bool))
    (st, _, ret, alive), _ = jax.jit(
        lambda c: jax.lax.scan(body, c, jnp.arange(steps)))(init)
    assert not np.any(np.asarray(alive)), "episodes should have terminated"
    return np.asarray(ret)


@pytest.mark.slow
def test_wr_checkpoint_reproduces_reference_performance():
    """The reference's world-record policy, imported into our net + dists +
    env, must reproduce its training PB (~5700 zero-start reward).  This is
    the end-to-end semantic oracle for the whole stack."""
    cfg = qenv.Config(
        action_range=10.0, allow_jump=True, allow_yaw=True, auto_jump=False,
        discrete_yaw_steps=-1, fmove_max=800.0, smove_max=1060.0, hover=False,
        initial_yaw_range=(0.0, 360.0), key_press_delay=0.3,
        max_initial_speed=700.0, smooth_keys=True, speed_reward=False,
        time_delta=0.013888888888888, time_limit=10.0, zero_start_prob=1.0)
    ret = run_wr_policy(cfg, n=16, steps=722, mode=False)
    # Stochastic eval (matching how the metric was collected in training).
    assert ret.mean() > 5000, ret
    assert ret.max() < 7500, ret


def test_rllib_export_import_roundtrip(tmp_path):
    cfg = qenv.Config.get_default()
    params = models.init_params(jax.random.key(5), cfg)
    from q1physrl_tpu.models.export_rllib import export_policy_params

    path = str(tmp_path / "checkpoint")
    export_policy_params(params, path, iteration=7, timesteps_total=12345)
    back = models.import_policy_params(path)
    for tower in ("policy", "value"):
        for (w0, b0), (w1, b1) in zip(params[tower], back[tower]):
            np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
            np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
