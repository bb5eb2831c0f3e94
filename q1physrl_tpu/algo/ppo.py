"""On-device PPO actor-learner.

Replaces the reference's Ray RLLib 0.8.4 PPO stack (rollout workers +
driver-side SGD; see SURVEY.md section 2.2) with a single jitted program per
iteration:

    rollout (lax.scan over T env steps, policy in the loop, auto-reset)
    -> GAE(lambda) reverse scan
    -> advantage standardization (RLLib standardizes ["advantages"])
    -> num_sgd_iter epochs x minibatched Adam steps (nested lax.scan)
    -> adaptive-KL coefficient update (RLLib update_kl rule)

Loss matches RLLib 0.8.4's PPOLoss (ppo_tf_policy.py): clipped surrogate,
adaptive KL penalty against the behaviour distribution, entropy bonus, and
the max-of-clipped/unclipped value loss with vf_clip_param.

Episode metrics (episode_reward_mean/max, episode_len_mean, and the
north-star zero_start_total_reward_mean — reference train.py:54-57) are
accumulated on-device as scalars in the rollout carry.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .. import models
from ..env import core as env_core
from ..env.config import Config as EnvConfig
from .config import PPOConfig

__all__ = ("TrainState", "Coeffs", "init_train_state", "train_iter",
           "rollout")


@struct.dataclass
class EpisodeStats:
    """Running per-env episode accumulators + finished-episode scalars."""

    ep_return: jnp.ndarray       # (N,) running return of the live episode
    ep_len: jnp.ndarray          # (N,) int32
    finished: jnp.ndarray        # () float — episodes finished
    ret_sum: jnp.ndarray         # () float — sum of finished returns
    ret_max: jnp.ndarray         # () float — max finished return
    len_sum: jnp.ndarray         # () float
    zs_finished: jnp.ndarray     # () float — finished zero-start episodes
    zs_ret_sum: jnp.ndarray      # () float

    @classmethod
    def zeros(cls, n):
        # NB: distinct arrays per field — shared buffers break jit donation.
        z = lambda: jnp.zeros((), jnp.float32)
        return cls(ep_return=jnp.zeros((n,), jnp.float32),
                   ep_len=jnp.zeros((n,), jnp.int32),
                   finished=z(), ret_sum=z(),
                   ret_max=jnp.full((), -jnp.inf, jnp.float32),
                   len_sum=z(), zs_finished=z(), zs_ret_sum=z())

    def update(self, reward, done, zero_start):
        ep_return = self.ep_return + reward
        ep_len = self.ep_len + 1
        d = done.astype(jnp.float32)
        zs = d * zero_start.astype(jnp.float32)
        return EpisodeStats(
            ep_return=jnp.where(done, 0.0, ep_return),
            ep_len=jnp.where(done, 0, ep_len),
            finished=self.finished + d.sum(),
            ret_sum=self.ret_sum + jnp.where(done, ep_return, 0.0).sum(),
            ret_max=jnp.maximum(self.ret_max,
                                jnp.max(jnp.where(done, ep_return, -jnp.inf))),
            len_sum=self.len_sum + (d * ep_len).sum(),
            zs_finished=self.zs_finished + zs.sum(),
            zs_ret_sum=self.zs_ret_sum + (zs * ep_return).sum(),
        )


@struct.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    env_state: env_core.EnvState
    stats: EpisodeStats
    kl_coeff: jnp.ndarray        # () float32, adaptive
    rng: jnp.ndarray
    iteration: jnp.ndarray       # () int32
    env_steps: jnp.ndarray       # () int64-ish float


class Coeffs(NamedTuple):
    """Dynamic (runtime) hyperparameter overrides for ``train_iter``.

    The static ``PPOConfig`` schedules are baked into the compiled program
    as constants, so every schedule variant costs a full recompile (~12 min
    on the remote TPU backend).  Passing a ``Coeffs`` instead makes these
    three knobs ordinary traced scalars: one compiled program serves every
    schedule, which is what makes population sweeps (algo/sweep.py) cheap.
    """

    entropy_coeff: jnp.ndarray   # () float32
    lr: jnp.ndarray              # () float32
    kl_target: jnp.ndarray       # () float32


class Batch(NamedTuple):
    """Flattened (B, ...) training batch."""

    obs: jnp.ndarray             # (B, 6)
    key_actions: jnp.ndarray     # (B, K) int32
    yaw_actions: jnp.ndarray     # (B,)
    logits: jnp.ndarray          # (B, L) behaviour logits
    logp: jnp.ndarray            # (B,) behaviour log-prob
    value: jnp.ndarray           # (B,) behaviour value pred
    advantage: jnp.ndarray       # (B,)
    value_target: jnp.ndarray    # (B,)


def _interp_schedule(schedule, x):
    """Piecewise-linear schedule ((x0, v0), (x1, v1), ...) -> value at x."""
    xs = jnp.asarray([p[0] for p in schedule], jnp.float32)
    ys = jnp.asarray([p[1] for p in schedule], jnp.float32)
    return jnp.interp(jnp.asarray(x, jnp.float32), xs, ys)


def make_optimizer(ppo: PPOConfig):
    if ppo.lr_schedule is not None:
        # Optimizer step count -> env steps (each train_iter does
        # num_sgd_iter * num_minibatches updates per batch_size env steps).
        upd_per_iter = ppo.num_sgd_iter * ppo.num_minibatches
        env_per_update = ppo.batch_size / upd_per_iter
        lr = lambda count: _interp_schedule(ppo.lr_schedule,
                                            count * env_per_update)
    else:
        lr = ppo.lr

    # inject_hyperparams keeps the learning rate in the optimizer STATE
    # (InjectHyperparamsState.hyperparams) rather than baked into the
    # compiled update, so a dynamic lr (Coeffs.lr) can override it at
    # runtime without recompiling.
    @optax.inject_hyperparams
    def _make(learning_rate):
        tx = optax.adam(learning_rate, eps=1e-8)  # TF AdamOptimizer defaults
        if ppo.grad_clip is not None:
            tx = optax.chain(optax.clip_by_global_norm(ppo.grad_clip), tx)
        return tx

    return _make(learning_rate=lr)


def _override_lr(opt_state, lr):
    """Replace the injected learning rate in an InjectHyperparamsState."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)


def init_train_state(key, env_cfg: EnvConfig, ppo: PPOConfig) -> TrainState:
    k_params, k_env, k_rng = jax.random.split(key, 3)
    params = models.init_params(k_params, env_cfg)
    env_state = env_core.reset(env_cfg, k_env, ppo.num_envs)
    return TrainState(
        params=params,
        opt_state=make_optimizer(ppo).init(params),
        env_state=env_state,
        stats=EpisodeStats.zeros(ppo.num_envs),
        kl_coeff=jnp.asarray(ppo.kl_coeff, jnp.float32),
        rng=k_rng,
        iteration=jnp.zeros((), jnp.int32),
        env_steps=jnp.zeros((), jnp.float32),
    )


def rollout(env_cfg: EnvConfig, ppo: PPOConfig, params, env_state, stats, rng):
    """Collect T steps from N envs with the policy in the loop.

    Returns (env_state', stats', rng', traj, bootstrap_value) where traj
    arrays have leading axis T.
    """

    def body(carry, _):
        st, stats, rng = carry
        obs = env_core.compute_obs(env_cfg, st.player, st.yaw,
                                   st.time_remaining).astype(jnp.float32)
        logits, value = models.forward(params, obs)
        dist = models.action_dist(env_cfg, logits)
        rng, k = jax.random.split(rng)
        ka, ya = dist.sample(k)
        logp = dist.logp(ka, ya)
        st, out = env_core.step_autoreset(env_cfg, st, ka, ya,
                                          compute_observation=False)
        stats = stats.update(out.reward, out.done, out.zero_start)
        traj = (obs, ka, ya, logits, logp, value, out.reward, out.done)
        return (st, stats, rng), traj

    (env_state, stats, rng), traj = jax.lax.scan(
        body, (env_state, stats, rng), None, length=ppo.rollout_length)

    # Bootstrap value of the state after the last step (auto-reset states
    # bootstrap their fresh episode; done-masking in GAE handles the seam).
    final_obs = env_core.compute_obs(
        env_cfg, env_state.player, env_state.yaw,
        env_state.time_remaining).astype(jnp.float32)
    _, bootstrap_value = models.forward(params, final_obs)
    return env_state, stats, rng, traj, bootstrap_value


def compute_gae(ppo: PPOConfig, reward, done, value, bootstrap_value):
    """GAE(lambda) over (T, N) arrays; matches RLLib's per-episode
    advantages because the (1 - done) mask zeroes cross-episode flow."""
    not_done = 1.0 - done.astype(jnp.float32)
    next_values = jnp.concatenate([value[1:], bootstrap_value[None]], axis=0)
    deltas = reward + ppo.gamma * next_values * not_done - value

    def body(adv, xs):
        delta, nd = xs
        adv = delta + ppo.gamma * ppo.lam * nd * adv
        return adv, adv

    _, advantages = jax.lax.scan(body, jnp.zeros_like(bootstrap_value),
                                 (deltas, not_done), reverse=True)
    return advantages, advantages + value


def ppo_loss(env_cfg: EnvConfig, ppo: PPOConfig, params, batch: Batch,
             kl_coeff, entropy_coeff=None):
    """RLLib 0.8.4 PPOLoss (ppo_tf_policy.py), faithfully."""
    if entropy_coeff is None:
        entropy_coeff = ppo.entropy_coeff
    logits, value = models.forward(params, batch.obs)
    dist = models.action_dist(env_cfg, logits)
    behaviour_dist = models.action_dist(env_cfg, batch.logits)

    curr_logp = dist.logp(batch.key_actions.T, batch.yaw_actions)
    logp_ratio = jnp.exp(curr_logp - batch.logp)
    action_kl = behaviour_dist.kl(dist)
    entropy = dist.entropy()

    surrogate = jnp.minimum(
        batch.advantage * logp_ratio,
        batch.advantage * jnp.clip(logp_ratio, 1.0 - ppo.clip_param,
                                   1.0 + ppo.clip_param))

    vf_loss1 = jnp.square(value - batch.value_target)
    vf_clipped = batch.value + jnp.clip(value - batch.value,
                                        -ppo.vf_clip_param, ppo.vf_clip_param)
    vf_loss2 = jnp.square(vf_clipped - batch.value_target)
    vf_loss = jnp.maximum(vf_loss1, vf_loss2)

    total = jnp.mean(-surrogate + kl_coeff * action_kl
                     + ppo.vf_loss_coeff * vf_loss
                     - entropy_coeff * entropy)
    aux = {
        "policy_loss": jnp.mean(-surrogate),
        "vf_loss": jnp.mean(vf_loss),
        "kl": jnp.mean(action_kl),
        "entropy": jnp.mean(entropy),
        "vf_explained_var": 1.0 - jnp.var(batch.value_target - value)
                                  / (jnp.var(batch.value_target) + 1e-8),
    }
    return total, aux


def sgd_epochs(env_cfg: EnvConfig, ppo: PPOConfig, params, opt_state,
               kl_coeff, batch: Batch, rng, entropy_coeff=None, lr=None):
    """num_sgd_iter epochs of minibatched Adam over the flattened batch."""
    tx = make_optimizer(ppo)
    if lr is not None:
        opt_state = _override_lr(opt_state, lr)
    n_mb = ppo.num_minibatches
    mb_size = ppo.batch_size // n_mb
    grad_fn = jax.grad(
        lambda p, mb: ppo_loss(env_cfg, ppo, p, mb, kl_coeff, entropy_coeff),
        has_aux=True)

    def minibatch_step(carry, idx):
        params, opt_state = carry
        mb = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), batch)
        grads, aux = grad_fn(params, mb)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), aux

    def epoch_step(carry, key):
        params, opt_state = carry
        perm = jax.random.permutation(key, ppo.batch_size)
        idxs = perm[:n_mb * mb_size].reshape(n_mb, mb_size)
        (params, opt_state), aux = jax.lax.scan(
            minibatch_step, (params, opt_state), idxs)
        # Per-epoch means of the per-minibatch stats.
        return (params, opt_state), jax.tree.map(jnp.mean, aux)

    rng, k = jax.random.split(rng)
    epoch_keys = jax.random.split(k, ppo.num_sgd_iter)
    (params, opt_state), aux = jax.lax.scan(
        epoch_step, (params, opt_state), epoch_keys)
    # RLLib's update_kl uses the KL reported by the last SGD round.
    last_aux = jax.tree.map(lambda x: x[-1], aux)
    return params, opt_state, last_aux, rng


def update_kl_coeff(ppo: PPOConfig, kl_coeff, sampled_kl, kl_target=None):
    """RLLib 0.8.4 KLCoeffMixin.update_kl."""
    if kl_target is None:
        kl_target = ppo.kl_target
    return jnp.where(
        sampled_kl > 2.0 * kl_target, kl_coeff * 1.5,
        jnp.where(sampled_kl < 0.5 * kl_target, kl_coeff * 0.5, kl_coeff))


def train_iter(env_cfg: EnvConfig, ppo: PPOConfig, ts: TrainState,
               coeffs: Coeffs | None = None):
    """One full PPO iteration (rollout + learn).  Pure; jit with
    static_argnums=(0, 1).

    ``coeffs`` optionally overrides entropy_coeff / lr / kl_target with
    runtime scalars (see ``Coeffs``); when None the static PPOConfig values
    and schedules apply, exactly as before."""
    env_state, stats, rng, traj, bootstrap_value = rollout(
        env_cfg, ppo, ts.params, ts.env_state, ts.stats, ts.rng)
    obs, ka, ya, logits, logp, value, reward, done = traj

    advantages, value_targets = compute_gae(ppo, reward, done, value,
                                            bootstrap_value)
    # RLLib standardizes advantages over the whole train batch.
    advantages = ((advantages - advantages.mean())
                  / jnp.maximum(advantages.std(), 1e-4))

    T, N = reward.shape
    flat = lambda x: x.reshape((T * N,) + x.shape[2:])
    batch = Batch(
        obs=flat(obs),
        key_actions=flat(jnp.moveaxis(ka, 1, 2)),   # (T,K,N)->(T,N,K)->(B,K)
        yaw_actions=flat(ya),
        logits=flat(logits),
        logp=flat(logp),
        value=flat(value),
        advantage=flat(advantages),
        value_target=flat(value_targets),
    )

    if coeffs is not None:
        entropy_coeff, lr, kl_target = coeffs
    else:
        lr = kl_target = None
        if ppo.entropy_coeff_schedule is not None:
            entropy_coeff = _interp_schedule(ppo.entropy_coeff_schedule,
                                             ts.env_steps)
        else:
            entropy_coeff = ppo.entropy_coeff
    params, opt_state, aux, rng = sgd_epochs(
        env_cfg, ppo, ts.params, ts.opt_state, ts.kl_coeff, batch, rng,
        entropy_coeff, lr)
    kl_coeff = update_kl_coeff(ppo, ts.kl_coeff, aux["kl"], kl_target)

    nan = jnp.asarray(jnp.nan, jnp.float32)
    has_ep = stats.finished > 0
    has_zs = stats.zs_finished > 0
    metrics = {
        "episode_reward_mean": jnp.where(
            has_ep, stats.ret_sum / jnp.maximum(stats.finished, 1), nan),
        "episode_reward_max": jnp.where(has_ep, stats.ret_max, nan),
        "episode_len_mean": jnp.where(
            has_ep, stats.len_sum / jnp.maximum(stats.finished, 1), nan),
        "episodes_total": stats.finished,
        "zero_start_total_reward_mean": jnp.where(
            has_zs, stats.zs_ret_sum / jnp.maximum(stats.zs_finished, 1), nan),
        "zero_start_episodes": stats.zs_finished,
        "kl_coeff": kl_coeff,
        "mean_reward": reward.mean(),
        **aux,
    }

    new_ts = TrainState(
        params=params, opt_state=opt_state, env_state=env_state,
        # Reset the finished-episode accumulators each iteration (RLLib
        # reports smoothed per-iteration metrics; per-env running episode
        # state carries over).
        stats=EpisodeStats.zeros(N).replace(ep_return=stats.ep_return,
                                            ep_len=stats.ep_len),
        kl_coeff=kl_coeff, rng=rng,
        iteration=ts.iteration + 1,
        env_steps=ts.env_steps + T * N,
    )
    return new_ts, metrics
