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

    return jax.jit(run, donate_argnums=0)


def bench_env(n=1 << 19, t=400, reps=5):
    from q1physrl_tpu import env as qenv

    cfg = qenv.Config.get_default()
    log(f"devices: {jax.devices()}")
    state = jax.jit(qenv.reset, static_argnums=(0, 2))(
        cfg, jax.random.key(0), n)
    run = make_rollout(cfg, n, t)

    t0 = time.perf_counter()
    state, sums = run(state)
    jax.block_until_ready(sums)
    log(f"n={n} t={t}: first call (incl. compile) {time.perf_counter()-t0:.2f}s")

    best = 0.0
    for i in range(reps):
        t0 = time.perf_counter()
        state, sums = run(state)
        jax.block_until_ready(sums)
        dt = time.perf_counter() - t0
        rate = n * t / dt
        best = max(best, rate)
        log(f"  rep {i}: {dt*1e3:.1f} ms -> {rate/1e6:.1f} M env-steps/s")
    return best


def main():
    candidates = [(1 << 17, 256), (1 << 19, 256), (1 << 20, 256)]
    best = 0.0
    for n, t in candidates:
        try:
            best = max(best, bench_env(n, t))
        except Exception as e:  # e.g. OOM at the largest size
            log(f"n={n}: {type(e).__name__}: {e}")
    baseline = 1552.0
    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": round(best, 1),
        "unit": "steps/s",
        "vs_baseline": round(best / baseline, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
