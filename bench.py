"""Benchmark: env throughput AND end-to-end training throughput.

Prints ONE JSON line with two metrics, each against its own baseline
(VERDICT round-1 item 9 — no apples-to-oranges ratios):

- env_steps_per_sec ("value"/"vs_baseline"): random-action batched env
  rollout — full PhysEnv semantics per frame (action decode with rate
  limit + smoothing, physics, reward, protocol-quantized observation,
  episode bookkeeping, in-step auto-reset).  Baseline: the reference's
  1,552 aggregate env-steps/s (i7-6700K, 4 Ray workers x 100 envs;
  BASELINE.md) — an env-only number has no reference counterpart, so the
  honest comparison for it is BASELINE.md's >=10M/s target.
- train_steps_per_sec ("train_*" keys): the full PPO train_iter at the
  PRODUCTION chip recipe — PPOConfig.tpu_fresh / configs/run_tpu_e3.yml
  (8192 envs x 96 steps, minibatch 128, 3 SGD epochs: the fresh-data
  regime docs/RESULTS.md measures at ~1.15M steps/s and the quality runs
  actually use).  Baseline: the reference's end-to-end 1,552 steps/s —
  apples to apples.  The mb-8192/30-epoch geometry the bench previously
  headlined (configs/params_tpu.yml) is kept as the named secondary
  train_mb8192_steps_per_sec (VERDICT r4 item 5).

Diagnostics go to stderr; only the JSON line goes to stdout.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


import contextlib
import signal


@contextlib.contextmanager
def _time_limit(seconds: float, label: str):
    """Raise TimeoutError in the main thread after ``seconds``.

    The axon tunnel can hang an RPC forever (compile or execute); an
    unbounded hang inside a SECONDARY measurement would otherwise ride out
    the driver's whole process timeout and discard every number already
    measured.  SIGALRM only works in the main thread — bench runs there.
    """
    def _raise(signum, frame):
        raise TimeoutError(f"{label}: exceeded {seconds}s")

    prev = signal.signal(signal.SIGALRM, _raise)
    signal.setitimer(signal.ITIMER_REAL, seconds)
    try:
        yield
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0.0)
        signal.signal(signal.SIGALRM, prev)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_rollout(cfg, n, t):
    from q1physrl_tpu import env as qenv

    base_key = jax.random.key(1234)

    def body(st, x):
        k = jax.random.fold_in(base_key, x)
        kk, ky = jax.random.split(k)
        ka = jax.random.bernoulli(kk, 0.5, (cfg.num_keys, n)).astype(jnp.int32)
        ya = jax.random.uniform(ky, (n,), jnp.float32,
                                -cfg.action_range, cfg.action_range)
        st, out = qenv.step_autoreset(cfg, st, ka, ya,
                                      compute_observation=True)
        # Consume obs/reward so nothing is dead-code-eliminated.
        return st, (out.obs.sum(), out.reward.sum(), out.done.sum())

    def run(state):
        state, sums = jax.lax.scan(body, state, jnp.arange(t))
        return state, jax.tree.map(jnp.sum, sums)

    # NB: no buffer donation — _measure reuses the same input state.
    return jax.jit(run)


def _measure(run, state, n, t, reps, label):
    t0 = time.perf_counter()
    out = run(state)
    jax.block_until_ready(out)
    log(f"{label} n={n} t={t}: first call (incl. compile) "
        f"{time.perf_counter()-t0:.2f}s")
    rates = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = run(state)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        rates.append(n * t / dt)
        log(f"  rep {i}: {dt*1e3:.1f} ms -> {rates[-1]/1e6:.1f} M env-steps/s")
    rates.sort()
    return rates[len(rates) // 2]  # median — the relay can misreport outliers


def bench_env(n=1 << 19, t=400, reps=5):
    """XLA scan path: jitted scan of step_autoreset with jax.random actions."""
    from q1physrl_tpu import env as qenv

    cfg = qenv.Config.get_default()
    state = jax.jit(qenv.reset, static_argnums=(0, 2))(
        cfg, jax.random.key(0), n)
    return _measure(make_rollout(cfg, n, t), state, n, t, reps, "xla")


def bench_env_pallas(n=1 << 20, t=720, block_envs=32768, reps=5):
    """Fused Pallas rollout: VMEM-resident state, in-kernel PRNG actions
    and auto-reset (ops/env_rollout_pallas.rollout_random)."""
    from q1physrl_tpu import env as qenv
    from q1physrl_tpu.ops.env_rollout_pallas import rollout_random

    cfg = qenv.Config.get_default()
    state = jax.jit(qenv.reset, static_argnums=(0, 2))(
        cfg, jax.random.key(0), n)
    run = jax.jit(lambda s: rollout_random(cfg, s, t, seed=7,
                                           block_envs=block_envs))
    return _measure(run, state, n, t, reps, f"pallas(be={block_envs})")


def bench_train(config_path="configs/run_tpu_e3.yml", label="train_iter",
                reps=3):
    """End-to-end training throughput: jitted train_iter at the given
    geometry.  Default is the production fresh-data recipe
    (configs/run_tpu_e3.yml = PPOConfig.tpu_fresh: 8192 envs x 96 steps,
    minibatch 128, 3 SGD epochs).  Uses the persistent compilation cache
    (the same programs the training runs use)."""
    import functools

    from q1physrl_tpu.algo.ppo import init_train_state, train_iter
    from q1physrl_tpu.algo.train import load_run_config

    run = load_run_config(config_path)
    env_cfg, ppo = run.env, run.ppo
    import dataclasses

    if env_cfg.num_envs is not None:
        env_cfg = dataclasses.replace(env_cfg, num_envs=None)
    ts = init_train_state(jax.random.key(0), env_cfg, ppo)
    fn = functools.partial(jax.jit, static_argnums=(0, 1),
                           donate_argnums=2)(train_iter)

    t0 = time.perf_counter()
    ts, m = fn(env_cfg, ppo, ts)
    jax.block_until_ready(m)
    log(f"{label} first call (incl. compile) {time.perf_counter()-t0:.1f}s")
    rates = []
    for i in range(reps):
        t0 = time.perf_counter()
        ts, m = fn(env_cfg, ppo, ts)
        jax.block_until_ready(m)
        dt = time.perf_counter() - t0
        rates.append(ppo.batch_size / dt)
        log(f"  rep {i}: {dt:.3f} s -> {rates[-1]/1e6:.2f} M train-steps/s")
    rates.sort()
    return rates[len(rates) // 2]


def _detect_contention() -> int:
    """Count live training processes sharing the chip.  The chip does not
    share well between processes; a contended bench measures nothing real
    (VERDICT r2 weak-point 2), so contention is recorded in the result JSON
    rather than only warned about."""
    try:
        import subprocess

        out = subprocess.run(["ps", "-eo", "args"], capture_output=True,
                             text=True).stdout
        trainers = [l for l in out.splitlines()
                    if "q1physrl_tpu.algo.train" in l
                    or "q1physrl_tpu.algo.sweep" in l]
        if trainers:
            log(f"WARNING: {len(trainers)} training process(es) running; "
                "bench numbers may be degraded or stall")
        return len(trainers)
    except Exception:
        return 0


def main():
    contended = _detect_contention()
    try:
        from q1physrl_tpu.algo.train import enable_compilation_cache

        enable_compilation_cache()
    except Exception as e:
        log(f"compilation cache unavailable: {e}")
    log(f"devices: {jax.devices()}")
    best_xla = 0.0
    for n, t in [(1 << 19, 256), (1 << 20, 256)]:
        try:
            best_xla = max(best_xla, bench_env(n, t))
        except Exception as e:  # e.g. OOM at the largest size
            log(f"xla n={n}: {type(e).__name__}: {e}")
    best_pallas = 0.0
    for n, be in [(1 << 20, 16384), (1 << 20, 32768)]:
        try:
            best_pallas = max(best_pallas, bench_env_pallas(n, block_envs=be))
        except Exception as e:
            log(f"pallas n={n} be={be}: {type(e).__name__}: {e}")
    train_rate = None
    try:
        with _time_limit(480, "train bench"):
            train_rate = bench_train("configs/run_tpu_e3.yml",
                                     "train_iter[tpu_fresh]")
    except Exception as e:
        log(f"train bench failed: {type(e).__name__}: {e}")
    train_mb8192 = None
    try:
        # Hard-bounded: the mb-8192 program is a SECONDARY figure, and a
        # cold compile or wedged tunnel RPC here must not starve the
        # already-measured headline of its print (code-review r5).
        with _time_limit(180, "train mb8192 bench"):
            train_mb8192 = bench_train("configs/params_tpu.yml",
                                       "train_iter[mb8192]")
    except Exception as e:
        log(f"train mb8192 bench failed: {type(e).__name__}: {e}")

    # Headline honesty (VERDICT r3 item 8): the parsed metric/vs_baseline
    # pair is the END-TO-END TRAINING throughput against the reference's
    # end-to-end 1,552 steps/s — apples to apples.  The env-kernel numbers
    # are reported alongside under explicit names; their only like-for-like
    # baseline is BASELINE.md's 10M steps/s single-chip target (the
    # reference has no env-only benchmark).
    baseline = 1552.0  # reference end-to-end training steps/s (BASELINE.md)
    env_best = max(best_xla, best_pallas)
    if train_rate is not None:
        result = {
            "metric": "train_steps_per_sec",
            "value": round(train_rate, 1),
            "unit": "steps/s",
            "vs_baseline": round(train_rate / baseline, 1),
        }
    elif train_mb8192 is not None:
        # Fresh-recipe bench failed but the mb-8192 geometry ran: still a
        # commensurate end-to-end figure vs the same 1,552 baseline.
        result = {
            "metric": "train_mb8192_steps_per_sec",
            "value": round(train_mb8192, 1),
            "unit": "steps/s",
            "vs_baseline": round(train_mb8192 / baseline, 1),
        }
    else:  # degraded: report the env kernel, clearly labeled.  No
        # "vs_baseline" here — its denominator would be the 10M/s kernel
        # target, incommensurate with the train-baseline ratio a consumer
        # tracks across runs (ADVICE r4); env_vs_10M_target below carries
        # the ratio under its own name.
        result = {
            "metric": "env_kernel_steps_per_sec",
            "value": round(env_best, 1),
            "unit": "steps/s",
        }
    result.update(
        env_kernel_steps_per_sec=round(best_pallas, 1),
        env_xla_steps_per_sec=round(best_xla, 1),
        env_vs_10M_target=round(env_best / 1e7, 1),
        # Env-only kernel over the reference's FULL-LOOP figure — kept under
        # an explicit apples-to-oranges name, never as the headline ratio.
        env_kernel_vs_reference_full_loop=round(env_best / baseline, 1),
    )
    if train_rate is not None:
        result["train_steps_per_sec"] = round(train_rate, 1)
        result["train_vs_baseline"] = round(train_rate / baseline, 1)
    if train_mb8192 is not None:
        result["train_mb8192_steps_per_sec"] = round(train_mb8192, 1)
    # Re-sample contention AFTER the (multi-minute) benches: a trainer
    # started mid-bench degrades the numbers just as silently (ADVICE r3).
    contended = _detect_contention() or contended
    if contended:
        result["contended"] = True
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
