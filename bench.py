"""Benchmark: batched-env throughput on the current accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is relative to the reference's 1,552 aggregate env-steps/s
(i7-6700K, 4 Ray workers x 100 envs; BASELINE.md).

The benchmarked program is the full PhysEnv semantics per frame — action
decode (rate limit, smoothing), physics, reward, protocol-quantized
observation, episode bookkeeping, and in-step auto-reset — driven by a
random-action source, scanned on-device.  Diagnostics go to stderr; only
the JSON line goes to stdout.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


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


def main():
    # The chip does not share well between processes: warn if a training
    # loop appears to be running (the bench may starve behind it).
    try:
        import subprocess

        out = subprocess.run(["ps", "-eo", "args"], capture_output=True,
                             text=True).stdout
        trainers = [l for l in out.splitlines()
                    if "q1physrl_tpu.algo.train" in l]
        if trainers:
            log(f"WARNING: {len(trainers)} training process(es) running; "
                "bench numbers may be degraded or stall")
    except Exception:
        pass
    log(f"devices: {jax.devices()}")
    best = 0.0
    for n, t in [(1 << 19, 256), (1 << 20, 256)]:
        try:
            best = max(best, bench_env(n, t))
        except Exception as e:  # e.g. OOM at the largest size
            log(f"xla n={n}: {type(e).__name__}: {e}")
    for n, be in [(1 << 20, 16384), (1 << 20, 32768)]:
        try:
            best = max(best, bench_env_pallas(n, block_envs=be))
        except Exception as e:
            log(f"pallas n={n} be={be}: {type(e).__name__}: {e}")
    baseline = 1552.0
    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": round(best, 1),
        "unit": "steps/s",
        "vs_baseline": round(best / baseline, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
