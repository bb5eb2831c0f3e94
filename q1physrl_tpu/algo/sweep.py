"""Population training sweep: P independent PPO runs in ONE XLA program.

The reference explored hyperparameters by sequential CPU runs (days each,
README.md:53-57).  On TPU the chip is mostly idle at the reference's 400-env
geometry, so we vmap ``train_iter`` over a population axis instead: P
members with different seeds and different entropy/lr schedules advance in
lockstep inside a single compiled program.  Schedules are per-iteration
*runtime* scalars (ppo.Coeffs), so every member shares one compilation —
sweeping a schedule costs nothing.

Usage:  python -m q1physrl_tpu.algo.sweep configs/sweep.yml

Sweep YAML format:
    base: configs/run4.yml          # RunConfig YAML; schedules ignored
    out_dir: runs/sweep_r2
    max_env_steps: 400000000        # per member
    checkpoint_every: 1000          # iterations, stacked resume checkpoint
    members:
      - label: control
        seed: 101
        entropy: [[0, 0.03], [40000000, 0.01]]     # piecewise-linear
        lr: [[0, 5.0e-6]]                          # piecewise-linear
        kl_target: 0.0036                          # constant

Per member, the driver tracks an EMA of the north-star metric
(zero_start_total_reward_mean) and snapshots the best params/opt_state seen
— each snapshot is a normal single-run checkpoint loadable by
``algo.evaluate`` / ``scripts/finalize_run.py``.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import checkpoint as ckpt
from .config import PPOConfig, RunConfig
from .ppo import Coeffs, TrainState, init_train_state, train_iter

__all__ = ("MemberSpec", "PopulationTrainer", "load_sweep", "main")

# EMA halflife for the noisy per-iteration north-star metric (~1-2 zero-start
# episodes per 50k-step iteration at zero_start_prob=0.01).  Sweeps at bigger
# per-iteration batches (more zero-start episodes per sample) should raise it
# via the ``ema_alpha`` sweep key so the EMA responds on a comparable
# env-step (not iteration) timescale.
EMA_ALPHA = 0.02


@dataclasses.dataclass(frozen=True)
class MemberSpec:
    seed: int
    entropy: tuple = ((0, 0.01),)  # ((x, coeff), ...); x per schedule_unit
    lr: tuple = ((0, 5e-6),)
    kl_target: float = 0.0036
    label: str = ""
    # Warm start: restore params/opt_state/env_steps from this checkpoint
    # (e.g. a best_member_* snapshot of a previous phase); the member's own
    # seed re-randomizes the rollout rng so warm-started members explore
    # decorrelated trajectories.
    init_from: Optional[str] = None
    # ENTROPY-GATED schedule (alternative to the x-axis schedules above):
    # stages of (policy_entropy_gate, entropy_coeff, lr).  Stage k+1
    # activates once the MEASURED policy entropy falls to its gate —
    # annealing keyed to how converged the policy actually is, not to how
    # many samples have passed.  Different data-freshness regimes converge
    # entropy at very different per-sample rates (docs/RESULTS.md round
    # 4), so entropy-space is the regime-invariant anneal coordinate the
    # way sgd_samples is the geometry-invariant one.  Stage 0's gate is
    # ignored (entry stage); stages only advance, never retreat.
    #
    # A stage whose coeff or lr is None follows the member's x-axis
    # schedule instead (hybrid form, round 5): the early 0.03->0.01
    # exploration ramp MUST ramp — holding a high coeff flat while
    # waiting on an entropy gate self-blocks, because the high coeff is
    # itself what keeps entropy above the gate (measured on the first
    # round-5 gated attempt: flat 0.03 equilibrated entropy ~4.2 vs the
    # 3.57 stage-1 gate).  Gates take over where round 4 showed sample
    # clocks mistime: the plateau end and the late octaves.
    #
    # A stage may carry a 4th element, an x-axis DEADLINE (in the
    # sweep's schedule_unit): the stage engages when the measured
    # entropy reaches its gate OR the clock reaches the deadline,
    # whichever comes first.  Rationale (round-5 attempt 2, measured):
    # a coefficient's equilibrium entropy depends on the data-freshness
    # regime — flat 0.01 at the fresh-data geometry equilibrates ~1.85,
    # ABOVE the 1.63 consensus gate, so a pure entropy gate stalls the
    # anneal forever.  With deadlines at the recipe's own sgd_samples
    # milestones, gates can only make stages EARLIER than the proven
    # gradient-work trajectory (when the policy converges fast), never
    # later (when the coefficient props entropy above the gate).
    gates: Optional[tuple] = None

    def coeffs_at(self, x: float, stage: int = 0) -> tuple:
        if self.gates is not None:
            _, e, l = self.gates[stage][:3]
            if e is None:
                e = _interp(self.entropy, x)
            if l is None:
                l = _interp(self.lr, x)
            return e, l, self.kl_target
        e = _interp(self.entropy, x)
        l = _interp(self.lr, x)
        return e, l, self.kl_target

    def next_stage(self, stage: int, measured_entropy: float,
                   x: float = -math.inf) -> int:
        if self.gates is None:
            return stage
        while stage + 1 < len(self.gates):
            nxt = self.gates[stage + 1]
            # A null gate means deadline-only (mirrors the null coeff/lr
            # hybrid form): the stage can engage ONLY by its deadline.
            gate_hit = (nxt[0] is not None
                        and not math.isnan(measured_entropy)
                        and measured_entropy <= nxt[0])
            deadline_hit = len(nxt) > 3 and x >= nxt[3]
            if not (gate_hit or deadline_hit):
                break
            stage += 1
        return stage


def _interp(schedule, x):
    xs = np.asarray([p[0] for p in schedule], np.float64)
    ys = np.asarray([p[1] for p in schedule], np.float64)
    return float(np.interp(x, xs, ys))


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _member_ckpt_tree(stacked: TrainState, i: int):
    """Slice member ``i`` out of the stacked state into the standard
    single-run checkpoint tree (algo.checkpoint._ckpt_tree layout)."""
    take = lambda t: jax.tree.map(lambda x: np.asarray(x[i]), t)
    return {
        "params": take(stacked.params),
        "opt_state": take(stacked.opt_state),
        "kl_coeff": np.asarray(stacked.kl_coeff[i]),
        "rng": np.asarray(jax.random.key_data(stacked.rng))[i],
        "iteration": np.asarray(stacked.iteration[i]),
        "env_steps": np.asarray(stacked.env_steps[i]),
    }


def _save_tree(directory: str, tree) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    return path


class PopulationTrainer:
    def __init__(self, run: RunConfig, members: list[MemberSpec],
                 out_dir: str, checkpoint_every: int = 1000,
                 schedule_unit: str = "env_steps",
                 ema_alpha: float = EMA_ALPHA,
                 snapshot_min_interval: int = 25,
                 allow_dead_zone: bool = False):
        # schedule_unit sets the x-axis of every member schedule:
        #   "env_steps"   — env steps collected (the historical unit);
        #   "sgd_samples" — cumulative samples processed by SGD
        #                   (= env_steps * num_sgd_iter).  This unit is
        #                   GEOMETRY-INVARIANT: a recipe tuned at the
        #                   reference's 400-env/30-epoch geometry transfers
        #                   to chip-filling geometries with different
        #                   epochs-per-sample by matching the gradient-work
        #                   trajectory, not the data-collection trajectory
        #                   (VERDICT r3 item 1: update-space schedules).
        if schedule_unit not in ("env_steps", "sgd_samples"):
            raise ValueError(f"unknown schedule_unit {schedule_unit!r}")
        self.schedule_unit = schedule_unit
        self.ema_alpha = ema_alpha
        self.snapshot_min_interval = snapshot_min_interval
        self.run = run
        self.members = members
        self.out_dir = out_dir
        self.checkpoint_every = checkpoint_every
        env_cfg = (dataclasses.replace(run.env, num_envs=None)
                   if run.env.num_envs is not None else run.env)
        self.env_cfg = env_cfg
        # Dynamic coeffs replace the static schedules entirely.
        self.ppo = dataclasses.replace(run.ppo, lr_schedule=None,
                                       entropy_coeff_schedule=None)
        self._check_dead_zone(len(members), self.ppo, allow_dead_zone)
        os.makedirs(f"{out_dir}/logs", exist_ok=True)

        states = []
        for m in members:
            ts = init_train_state(jax.random.key(m.seed), env_cfg, self.ppo)
            if m.init_from:
                ts = ckpt.restore_checkpoint(m.init_from, ts)
                ts = ts.replace(rng=jax.random.fold_in(
                    jax.random.key(m.seed), 17))
            states.append(ts)
        # Members may disagree on env_steps (e.g. warm starts from best
        # snapshots of a run whose members stopped at different
        # iterations): the host schedule clock is PER MEMBER (_coeffs
        # reads each member's own env_steps), and the stop condition is
        # the minimum across members, so every member completes at least
        # max_env_steps.
        self.ts = _stack(states)

        fn = lambda ts, c: train_iter(env_cfg, self.ppo, ts, c)
        self._fn = jax.jit(jax.vmap(fn), donate_argnums=0)

        resume = ckpt.latest_checkpoint(f"{out_dir}/stacked")
        if resume:
            print(f"Resuming sweep from {resume}", flush=True)
            self.ts = self._restore_stacked(resume)

        self.ema = [float("nan")] * len(members)
        # On resume, seed best_ema from the existing snapshot sidecars so a
        # restarted sweep cannot overwrite a better earlier best_member_XX
        # with its (still-rebuilding) current EMA.
        self.best_ema = []
        for i in range(len(members)):
            sidecar = f"{out_dir}/best_member_{i:02d}.json"
            prev = -float("inf")
            if resume and os.path.exists(sidecar):
                with open(sidecar) as f:
                    d = json.load(f)
                prev = max(float(d.get("ema", prev)),
                           float(d.get("best_ema", prev)))
            self.best_ema.append(prev)
        self._last_snap = [-(10 ** 9)] * len(members)
        # Entropy-gated schedule stage per member.  Re-derived at resume
        # from the last LOGGED policy entropy (below), so the first
        # post-resume iteration never runs one iteration of stage-0
        # coefficients against a converged policy (code-review r4).
        self._stage = [0] * len(members)
        if resume:
            for i, m in enumerate(members):
                if m.gates is None:
                    continue
                log_path = f"{out_dir}/logs/member_{i:02d}.jsonl"
                try:
                    last = None
                    with open(log_path) as f:
                        for line in f:
                            last = line
                    if last:
                        row = json.loads(last)
                        ent = float(row.get("entropy", float("nan")))
                        x = float(row.get("step", 0.0))
                        if self.schedule_unit == "sgd_samples":
                            x *= self.ppo.num_sgd_iter
                        # The logged stage is a FLOOR: logs flush every
                        # ~20 iterations and the supervisor kills with
                        # SIGKILL, so the last flushed row can predate a
                        # gate engagement (or show entropy noise-bounced
                        # back above the gate).  Stages only advance,
                        # never retreat — re-deriving from entropy alone
                        # could resume a converged member at a hotter
                        # stage (code-review r5).
                        logged = int(row.get("stage", 0))
                        self._stage[i] = max(logged,
                                             m.next_stage(0, ent, x))
                except (OSError, ValueError):
                    pass
        # A best-EMA rise suppressed by the snapshot rate limit is
        # remembered here and flushed in train()'s finally block, so a
        # peak inside the rate-limit window is never lost to a run end or
        # supervisor kill (ADVICE r3).
        self._pending_snap = [False] * len(members)
        self._log_files = [open(f"{out_dir}/logs/member_{i:02d}.jsonl", "a")
                           for i in range(len(members))]
        with open(f"{out_dir}/members.json", "w") as f:
            json.dump([dataclasses.asdict(m) for m in members], f, indent=2)

    @staticmethod
    def _check_dead_zone(n_members: int, ppo: PPOConfig, allow: bool):
        """Refuse the measured population-vmap dead zone (VERDICT r4
        item 6).

        Round-4 chip measurements (docs/RESULTS.md "filling the chip"):
        co-running P members in one vmapped program pays off when the
        per-iteration update chain is either tiny-and-few (3-epoch
        fresh-data regime, 18k updates/iter -> 1.55M agg steps/s) or
        MXU-sized (mb 8192), but in the update-dominated middle (30
        epochs x small minibatch, 92k updates/iter) the minibatch
        kernels are too small to hide the vmapped member axis and each
        member progresses ~4x SLOWER than it would alone (182k aggregate
        vs 170k single).  A user sweeping the reference hyperparameters
        at chip geometry lands exactly there, so refuse unless the sweep
        explicitly opts in with ``allow_dead_zone: true``.
        """
        if n_members <= 1 or allow:
            return
        updates_per_iter = ppo.num_sgd_iter * (
            ppo.batch_size // ppo.sgd_minibatch_size)
        if ppo.sgd_minibatch_size < 4096 and updates_per_iter > 25_000:
            raise ValueError(
                f"population dead zone: {n_members} members x "
                f"{updates_per_iter} updates/iter at minibatch "
                f"{ppo.sgd_minibatch_size} is the measured ~4x-slowdown "
                f"regime (update-dominated, sub-MXU minibatches; "
                f"docs/RESULTS.md round 4).  Use num_sgd_iter<=3 "
                f"(fresh-data regime), minibatch>=4096 (MXU-sized), one "
                f"member, or set allow_dead_zone: true to override.")

    def _restore_stacked(self, path):
        import orbax.checkpoint as ocp

        template = jax.tree.map(np.asarray, {
            "params": self.ts.params, "opt_state": self.ts.opt_state,
            "kl_coeff": self.ts.kl_coeff,
            "rng": jax.random.key_data(self.ts.rng),
            "iteration": self.ts.iteration, "env_steps": self.ts.env_steps,
        })
        with ocp.StandardCheckpointer() as ckptr:
            tree = ckptr.restore(os.path.abspath(path), template)
        return self.ts.replace(
            params=tree["params"], opt_state=tree["opt_state"],
            kl_coeff=tree["kl_coeff"],
            rng=jax.random.wrap_key_data(np.asarray(tree["rng"])),
            iteration=tree["iteration"], env_steps=tree["env_steps"])

    def _coeffs(self, env_steps) -> Coeffs:
        # Scalar (shared clock) or per-member vector of env steps: warm
        # starts from snapshots of a run whose members stopped at
        # different iterations give each member its own schedule clock.
        xs = np.broadcast_to(np.asarray(env_steps, np.float64),
                             (len(self.members),))
        if self.schedule_unit == "sgd_samples":
            xs = xs * self.ppo.num_sgd_iter
        vals = [m.coeffs_at(float(xs[i]), self._stage[i])
                for i, m in enumerate(self.members)]
        e, l, k = zip(*vals)
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return Coeffs(entropy_coeff=f32(e), lr=f32(l), kl_target=f32(k))

    def _snapshot_best(self, i: int):
        d = f"{self.out_dir}/best_member_{i:02d}"
        tmp = d + ".tmp"
        _save_tree(tmp, _member_ckpt_tree(self.ts, i))
        if os.path.exists(d):
            import shutil

            shutil.rmtree(d)
        os.rename(tmp, d)
        self._pending_snap[i] = False
        with open(f"{d}.json", "w") as f:
            # iteration from the checkpoint's own field (post-increment),
            # so the sidecar always agrees with the saved tree (ADVICE r2).
            # "ema" is the EMA at save time; "best_ema" the peak threshold
            # (they differ only for end-of-run flushes of a rate-limited
            # pending best).
            json.dump({"member": i, "label": self.members[i].label,
                       "iteration": int(np.asarray(self.ts.iteration)[i]),
                       "ema": self.ema[i], "best_ema": self.best_ema[i],
                       "env_steps": float(self.ts.env_steps[i])}, f)

    def train(self, max_env_steps: float,
              max_seconds: Optional[float] = None):
        i = int(np.asarray(self.ts.iteration)[0])
        start_iter = i  # EMA warmup counts iterations of THIS process: a
        # resumed sweep rebuilds its EMA from NaN, and the first few samples
        # are single-iteration noise that must not trigger best-snapshots.
        t_start = time.time()
        steps_per_iter = self.ppo.batch_size
        try:
            while float(np.min(np.asarray(self.ts.env_steps))) < max_env_steps:
                env_steps = np.asarray(self.ts.env_steps)
                coeffs = self._coeffs(env_steps)
                t0 = time.time()
                self.ts, metrics = self._fn(self.ts, coeffs)
                metrics = {k: np.asarray(v) for k, v in
                           jax.device_get(metrics).items()}
                dt = time.time() - t0
                env_steps = env_steps + steps_per_iter
                unit = (self.ppo.num_sgd_iter
                        if self.schedule_unit == "sgd_samples" else 1)
                for m in range(len(self.members)):
                    self._stage[m] = self.members[m].next_stage(
                        self._stage[m], float(metrics["entropy"][m]),
                        float(env_steps[m]) * unit)
                    zs = float(metrics["zero_start_total_reward_mean"][m])
                    if not math.isnan(zs):
                        prev = self.ema[m]
                        a = self.ema_alpha
                        self.ema[m] = (zs if math.isnan(prev) else
                                       (1 - a) * prev + a * zs)
                    row = {k: float(v[m]) for k, v in metrics.items()}
                    row.update(step=int(env_steps[m]), iteration=i,
                               zs_ema=self.ema[m], t=time.time(),
                               entropy_coeff=float(coeffs.entropy_coeff[m]),
                               lr=float(coeffs.lr[m]),
                               stage=self._stage[m])
                    self._log_files[m].write(json.dumps(row) + "\n")
                    # Snapshot on a new best smoothed north-star; warmup 30
                    # iterations so the EMA has support, and rate-limit the
                    # host-side saves so a steadily rising curve doesn't
                    # checkpoint every iteration.  A rise inside the
                    # rate-limit window is flushed in the finally block.
                    if (i - start_iter > 30 and not math.isnan(self.ema[m])
                            and self.ema[m] > self.best_ema[m] + 1e-6):
                        self.best_ema[m] = self.ema[m]
                        if i - self._last_snap[m] >= self.snapshot_min_interval:
                            self._last_snap[m] = i
                            self._snapshot_best(m)
                        else:
                            self._pending_snap[m] = True
                if i % 20 == 0:
                    for f in self._log_files:
                        f.flush()
                    emas = " ".join(f"{e:7.1f}" for e in self.ema)
                    print(f"iter {i} steps {int(env_steps.min()):,} "
                          f"steps/s {len(self.members) * steps_per_iter / dt:,.0f}"
                          f" ema [{emas}]", flush=True)
                i += 1
                if i % self.checkpoint_every == 0:
                    self._save_resume()
                if max_seconds and time.time() - t_start > max_seconds:
                    print("Time budget reached", flush=True)
                    break
        finally:
            self._save_resume()
            for m in range(len(self.members)):
                # Flush a rate-limit-suppressed best ONLY if the member is
                # still at (or within noise of) its peak: the flush saves
                # CURRENT params, and overwriting the last good snapshot
                # with a since-degraded policy would destroy the peak the
                # flag exists to protect (code-review r4).
                if (self._pending_snap[m]
                        and self.ema[m] >= self.best_ema[m] - 2.0):
                    self._snapshot_best(m)
            for f in self._log_files:
                f.close()
        print(f"Sweep done: {i} iterations in "
              f"{time.time() - t_start:.0f}s; best EMAs "
              f"{[round(b, 1) for b in self.best_ema]}", flush=True)

    def _save_resume(self):
        tree = {
            "params": self.ts.params, "opt_state": self.ts.opt_state,
            "kl_coeff": self.ts.kl_coeff,
            "rng": jax.random.key_data(self.ts.rng),
            "iteration": self.ts.iteration, "env_steps": self.ts.env_steps,
        }
        it = int(np.asarray(self.ts.iteration)[0])
        _save_tree(f"{self.out_dir}/stacked/iter_{it:07d}",
                   jax.device_get(tree))


def load_sweep(path: str):
    import yaml

    from .train import load_run_config

    with open(path) as f:
        spec = yaml.safe_load(f)
    run = load_run_config(spec["base"])
    members = [MemberSpec(
        seed=m["seed"],
        entropy=tuple(tuple(p) for p in m.get("entropy", [[0, 0.01]])),
        lr=tuple(tuple(p) for p in m.get("lr", [[0, run.ppo.lr]])),
        kl_target=m.get("kl_target", run.ppo.kl_target),
        label=m.get("label", f"member{j}"),
        init_from=m.get("init_from"),
        gates=(tuple(tuple(g) for g in m["gates"])
               if m.get("gates") else None),
    ) for j, m in enumerate(spec["members"])]
    trainer_kwargs = dict(
        checkpoint_every=spec.get("checkpoint_every", 1000),
        schedule_unit=spec.get("schedule_unit", "env_steps"),
        ema_alpha=spec.get("ema_alpha", EMA_ALPHA),
        snapshot_min_interval=spec.get("snapshot_min_interval", 25),
        allow_dead_zone=spec.get("allow_dead_zone", False),
    )
    return (run, members, spec["out_dir"],
            float(spec.get("max_env_steps", 4e8)),
            trainer_kwargs,
            spec.get("max_seconds"))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    import signal

    from .train import enable_compilation_cache

    # A plain SIGTERM (manual run management) must still run the train()
    # finally block — resume state + pending best-snapshot flush — so a
    # terminated sweep loses nothing.  (The supervisor's stale-kill is
    # SIGKILL; that path is covered by the periodic stacked checkpoint.)
    signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))

    enable_compilation_cache()
    run, members, out_dir, max_steps, trainer_kwargs, max_seconds = \
        load_sweep(argv[0])
    trainer = PopulationTrainer(run, members, out_dir, **trainer_kwargs)
    trainer.train(max_steps, max_seconds)


if __name__ == "__main__":
    main()
