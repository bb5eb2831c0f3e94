"""PPO learner tests: GAE math, loss semantics, adaptive KL, checkpoint
round-trip, and a does-it-learn smoke run.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from q1physrl_tpu import env as qenv
from q1physrl_tpu.algo import PPOConfig, RunConfig, init_train_state, train_iter
from q1physrl_tpu.algo import checkpoint as ckpt
from q1physrl_tpu.algo.ppo import compute_gae, update_kl_coeff
from q1physrl_tpu.algo.train import Trainer


def ref_gae(reward, done, value, bootstrap, gamma, lam):
    """Naive per-env python GAE for cross-checking."""
    T, N = reward.shape
    adv = np.zeros((T, N))
    values = np.concatenate([value, bootstrap[None]], axis=0)
    last = np.zeros(N)
    for t in reversed(range(T)):
        nd = 1.0 - done[t]
        delta = reward[t] + gamma * values[t + 1] * nd - value[t]
        last = delta + gamma * lam * nd * last
        adv[t] = last
    return adv


def test_gae_matches_naive():
    rng = np.random.default_rng(0)
    T, N = 37, 11
    reward = rng.normal(size=(T, N)).astype(np.float32)
    done = rng.random((T, N)) < 0.1
    value = rng.normal(size=(T, N)).astype(np.float32)
    bootstrap = rng.normal(size=N).astype(np.float32)
    ppo = PPOConfig()
    adv, vt = compute_gae(ppo, jnp.asarray(reward), jnp.asarray(done),
                          jnp.asarray(value), jnp.asarray(bootstrap))
    expected = ref_gae(reward, done, value, bootstrap, ppo.gamma, ppo.lam)
    np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vt), expected + value, rtol=1e-4,
                               atol=1e-4)


def test_gae_stops_at_episode_boundary():
    """Advantage must not flow across a done boundary."""
    ppo = PPOConfig()
    T, N = 10, 1
    reward = jnp.ones((T, N))
    done = jnp.zeros((T, N), bool).at[4, 0].set(True)
    value = jnp.zeros((T, N))
    adv, _ = compute_gae(ppo, reward, done, value, jnp.full((N,), 100.0))
    a = np.asarray(adv)[:, 0]
    # Step 4 (done) sees only its own reward.
    np.testing.assert_allclose(a[4], 1.0, rtol=1e-6)
    # Step 5 starts a fresh accumulation including the bootstrap far ahead.
    assert a[5] > a[4]


def test_update_kl_coeff_rule():
    ppo = PPOConfig(kl_target=0.01)
    c = jnp.asarray(0.2)
    assert float(update_kl_coeff(ppo, c, jnp.asarray(0.05))) == 0.2 * 1.5
    assert float(update_kl_coeff(ppo, c, jnp.asarray(0.001))) == 0.2 * 0.5
    assert float(update_kl_coeff(ppo, c, jnp.asarray(0.01))) == 0.2


def make_smoke_ts(num_envs=64, rollout=16, **ppo_over):
    env_cfg = dataclasses.replace(qenv.Config.get_default(), num_envs=None)
    ppo = PPOConfig(num_envs=num_envs, rollout_length=rollout,
                    num_sgd_iter=2, sgd_minibatch_size=256, **ppo_over)
    ts = init_train_state(jax.random.key(0), env_cfg, ppo)
    return env_cfg, ppo, ts


def test_train_iter_runs_and_metrics_sane():
    env_cfg, ppo, ts = make_smoke_ts()
    fn = jax.jit(train_iter, static_argnums=(0, 1))
    ts2, metrics = fn(env_cfg, ppo, ts)
    assert int(ts2.iteration) == 1
    assert float(ts2.env_steps) == ppo.batch_size
    assert np.isfinite(metrics["entropy"])
    assert np.isfinite(metrics["vf_loss"])
    assert np.isfinite(metrics["kl"]) and float(metrics["kl"]) >= 0
    # Params actually changed.
    diff = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, ts.params, ts2.params), 0.0)
    assert diff > 0


def test_checkpoint_roundtrip(tmp_path):
    env_cfg, ppo, ts = make_smoke_ts()
    fn = jax.jit(train_iter, static_argnums=(0, 1))
    ts, _ = fn(env_cfg, ppo, ts)
    path = ckpt.save_checkpoint(str(tmp_path), ts, 1)
    _, _, ts_fresh = make_smoke_ts()
    restored = ckpt.restore_checkpoint(path, ts_fresh)
    jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ts.params, restored.params))
    assert int(restored.iteration) == 1
    assert float(restored.kl_coeff) == float(ts.kl_coeff)
    # Restored state steps fine.
    fn(env_cfg, ppo, restored)


def test_learning_improves_reward():
    """With a workable lr, mean per-step reward (dt * vel_y) must rise —
    the policy discovers 'hold forward, face +y' within a few iterations."""
    env_cfg = dataclasses.replace(
        qenv.Config.get_default(), num_envs=None, zero_start_prob=0.0)
    ppo = PPOConfig(num_envs=256, rollout_length=32, num_sgd_iter=8,
                    sgd_minibatch_size=1024, lr=3e-3)
    ts = init_train_state(jax.random.key(1), env_cfg, ppo)
    fn = jax.jit(train_iter, static_argnums=(0, 1), donate_argnums=2)
    first = None
    for i in range(25):
        ts, metrics = fn(env_cfg, ppo, ts)
        if first is None:
            first = float(metrics["mean_reward"])
    last = float(metrics["mean_reward"])
    assert last > first + 0.5, (first, last)


def test_trainer_smoke_runs():
    import tempfile
    run = RunConfig(
        ppo=PPOConfig(num_envs=64, rollout_length=16, num_sgd_iter=2,
                      sgd_minibatch_size=256),
        max_iterations=2, checkpoint_dir=tempfile.mkdtemp())
    t = Trainer(run)
    best = t.train()
    assert int(t.ts.iteration) == 2


def test_schedules():
    from q1physrl_tpu.algo.ppo import _interp_schedule

    sched = ((0, 0.01), (1_000_000, 0.001))
    assert abs(float(_interp_schedule(sched, 0)) - 0.01) < 1e-8
    assert abs(float(_interp_schedule(sched, 500_000)) - 0.0055) < 1e-6
    assert abs(float(_interp_schedule(sched, 2_000_000)) - 0.001) < 1e-8

    env_cfg, _, _ = make_smoke_ts()
    ppo = PPOConfig(num_envs=64, rollout_length=16, num_sgd_iter=2,
                    sgd_minibatch_size=256,
                    lr_schedule=((0, 1e-3), (10_000, 1e-4)),
                    entropy_coeff_schedule=((0, 0.05), (10_000, 0.01)))
    ts = init_train_state(jax.random.key(0), env_cfg, ppo)
    fn = jax.jit(train_iter, static_argnums=(0, 1))
    ts, metrics = fn(env_cfg, ppo, ts)
    assert np.isfinite(metrics["entropy"])


def test_load_run_config_reference_format():
    """Our trainer reads the reference's own data/params.yml directly."""
    from q1physrl_tpu.algo.train import load_run_config

    run = load_run_config("/root/reference/data/params.yml")
    assert run.ppo.num_envs == 400           # 4 workers x 100 envs
    assert run.ppo.rollout_length == 125     # 50k batch / 400 envs
    assert run.ppo.kl_target == 0.0036
    assert run.ppo.lr == 5e-6
    assert run.ppo.vf_clip_param == 100
    assert run.env.smove_max == 1060
    assert run.env.zero_start_prob == 0.01
    assert abs(run.env.time_delta - 0.013888888888888) < 1e-12
    assert run.env.conforms_to_rules() is False  # 0.0138888... != 1/72 exactly


def test_train_iter_coeffs_override_matches_static():
    """Dynamic Coeffs (runtime entropy/lr/kl_target) produce the same
    update as the equivalent static config — the sweep path is the same
    program."""
    import dataclasses

    import jax.numpy as jnp

    from q1physrl_tpu import env as qenv
    from q1physrl_tpu.algo.ppo import (Coeffs, init_train_state, train_iter)
    from q1physrl_tpu.algo import PPOConfig

    env_cfg = dataclasses.replace(qenv.Config.get_default(), num_envs=None)
    ppo = PPOConfig(num_envs=16, rollout_length=8, num_sgd_iter=2,
                    sgd_minibatch_size=32)
    ts = init_train_state(jax.random.key(0), env_cfg, ppo)

    ts_a, m_a = jax.jit(train_iter, static_argnums=(0, 1))(env_cfg, ppo, ts)
    coeffs = Coeffs(jnp.float32(ppo.entropy_coeff), jnp.float32(ppo.lr),
                    jnp.float32(ppo.kl_target))
    ts_b, m_b = jax.jit(lambda t, c: train_iter(env_cfg, ppo, t, c))(
        ts, coeffs)

    for k in m_a:
        a, b = float(m_a[k]), float(m_b[k])
        assert (np.isnan(a) and np.isnan(b)) or np.isclose(a, b, rtol=1e-6), \
            (k, a, b)
    diffs = jax.tree.map(lambda x, y: float(jnp.abs(x - y).max()),
                         ts_a.params, ts_b.params)
    assert max(jax.tree.leaves(diffs)) < 1e-7


def test_population_sweep_trains_and_snapshots(tmp_path):
    """PopulationTrainer: P members advance independently in one program;
    member snapshots restore through the standard checkpoint loader; the
    stacked checkpoint resumes."""
    import dataclasses

    from q1physrl_tpu import env as qenv
    from q1physrl_tpu.algo import PPOConfig, RunConfig
    from q1physrl_tpu.algo import checkpoint as ck
    from q1physrl_tpu.algo.ppo import init_train_state
    from q1physrl_tpu.algo.sweep import MemberSpec, PopulationTrainer

    env_cfg = dataclasses.replace(qenv.Config.get_default(), num_envs=None)
    ppo = PPOConfig(num_envs=16, rollout_length=8, num_sgd_iter=2,
                    sgd_minibatch_size=32)
    run = RunConfig(env=env_cfg, ppo=ppo)
    members = [
        MemberSpec(seed=1, entropy=((0, 0.03), (1000, 0.01)), label="a"),
        MemberSpec(seed=2, entropy=((0, 0.01),),
                   lr=((0, 5e-6), (2000, 1e-6)), label="b"),
    ]
    out = str(tmp_path / "sweep")
    pt = PopulationTrainer(run, members, out, checkpoint_every=4)
    pt.train(max_env_steps=16 * 8 * 6)
    assert int(np.asarray(pt.ts.iteration)[0]) == 6

    # Members actually diverged (different seeds -> different params).
    p0 = jax.tree.leaves(pt.ts.params)[0]
    assert not np.allclose(np.asarray(p0[0]), np.asarray(p0[1]))

    # Member snapshot -> standard single-run checkpoint format; the sidecar
    # iteration must agree with the checkpoint's own field (ADVICE r2).
    pt.ema = [1.0, 2.0]
    pt._snapshot_best(1)
    with open(f"{out}/best_member_01.json") as f:
        sidecar = json.load(f)
    assert sidecar["iteration"] == int(np.asarray(pt.ts.iteration)[1])
    template = init_train_state(jax.random.key(0), env_cfg, ppo)
    ts = ck.restore_checkpoint(f"{out}/best_member_01", template)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(ts.params)[0]),
        np.asarray(p0[1]))

    # Stacked checkpoint resumes.
    pt2 = PopulationTrainer(run, members, out, checkpoint_every=4)
    assert int(np.asarray(pt2.ts.iteration)[0]) == 6


def test_sweep_schedule_units(tmp_path):
    """schedule_unit='sgd_samples' interprets member-schedule milestones as
    cumulative SGD samples (env_steps * num_sgd_iter) — the
    geometry-invariant coordinate (round-4 chip-geometry machinery)."""
    import dataclasses

    from q1physrl_tpu import env as qenv
    from q1physrl_tpu.algo import PPOConfig, RunConfig
    from q1physrl_tpu.algo.sweep import MemberSpec, PopulationTrainer

    run = RunConfig(
        env=dataclasses.replace(qenv.Config.get_default(), num_envs=None),
        ppo=PPOConfig(num_envs=16, rollout_length=8, num_sgd_iter=4,
                      sgd_minibatch_size=32))
    member = MemberSpec(seed=1, entropy=((0, 0.03), (1000, 0.01)),
                        lr=((0, 5e-6),))

    pt_steps = PopulationTrainer(run, [member], str(tmp_path / "a"))
    pt_samples = PopulationTrainer(run, [member], str(tmp_path / "b"),
                                   schedule_unit="sgd_samples")
    # At 500 env steps: env_steps unit reads x=500 (mid-anneal);
    # sgd_samples reads x=500*4=2000 (past the 1000-sample milestone).
    import numpy as np

    e_steps = float(pt_steps._coeffs(500.0).entropy_coeff[0])
    e_samples = float(pt_samples._coeffs(500.0).entropy_coeff[0])
    assert abs(e_steps - 0.02) < 1e-6
    assert abs(e_samples - 0.01) < 1e-6

    import pytest

    with pytest.raises(ValueError):
        PopulationTrainer(run, [member], str(tmp_path / "c"),
                          schedule_unit="bogus")


def test_sweep_entropy_gated_schedule(tmp_path):
    """Entropy-gated anneal stages (round-4 machinery): stages advance when
    the MEASURED policy entropy reaches each gate, never retreat, and are
    re-derived after a resume from the live measurement."""
    import dataclasses

    from q1physrl_tpu import env as qenv
    from q1physrl_tpu.algo import PPOConfig, RunConfig
    from q1physrl_tpu.algo.sweep import MemberSpec, PopulationTrainer

    gates = ((None, 0.03, 5e-6),      # entry stage
             (3.0, 0.01, 5e-6),       # at entropy <= 3.0 nats
             (1.5, 0.002, 1.5e-6))    # at entropy <= 1.5
    m = MemberSpec(seed=1, gates=gates)

    # next_stage mechanics (host-side, no training needed).
    assert m.next_stage(0, 4.2) == 0
    assert m.next_stage(0, 2.9) == 1
    assert m.next_stage(0, 1.2) == 2          # skips straight through
    assert m.next_stage(2, 5.0) == 2          # never retreats
    assert m.next_stage(1, float("nan")) == 1

    # Stage deadlines (round-5): a 4th element is an x-axis deadline —
    # the stage engages at the gate OR the deadline, whichever first,
    # so a coefficient whose equilibrium entropy sits above the gate
    # cannot stall the anneal.
    md = MemberSpec(seed=1, gates=((None, 0.03, 5e-6),
                                   (3.0, 0.01, 5e-6, 100.0),
                                   (1.5, 0.002, 1.5e-6, 500.0)))
    assert md.next_stage(0, 4.2, x=50.0) == 0      # neither condition
    assert md.next_stage(0, 2.9, x=50.0) == 1      # gate first
    assert md.next_stage(0, 4.2, x=150.0) == 1     # deadline first
    assert md.next_stage(0, 4.2, x=600.0) == 2     # deadlines cascade
    assert md.next_stage(0, float("nan"), x=600.0) == 2  # NaN can't block
    assert md.next_stage(2, 5.0, x=0.0) == 2       # never retreats

    run = RunConfig(
        env=dataclasses.replace(qenv.Config.get_default(), num_envs=None),
        ppo=PPOConfig(num_envs=16, rollout_length=8, num_sgd_iter=2,
                      sgd_minibatch_size=32))
    pt = PopulationTrainer(run, [m], str(tmp_path / "g"))
    c0 = pt._coeffs(0.0)
    assert abs(float(c0.entropy_coeff[0]) - 0.03) < 1e-9
    pt._stage[0] = 2
    c2 = pt._coeffs(12345.0)  # x-axis irrelevant for gated members
    assert abs(float(c2.entropy_coeff[0]) - 0.002) < 1e-9
    assert abs(float(c2.lr[0]) - 1.5e-6) < 1e-12

    # One real training step with gates drives the stage machinery
    # end-to-end (fresh policy entropy ~5.8 -> stays in stage 0).
    pt._stage[0] = 0
    pt.train(max_env_steps=run.ppo.batch_size, max_seconds=None)
    assert pt._stage[0] == 0


def test_sweep_gate_none_is_deadline_only(tmp_path):
    """A null gate means deadline-only (round-5 rescue form): the stage
    can engage only by its deadline — no -999 sentinel needed, and no
    TypeError from comparing entropy against None (code-review r5)."""
    from q1physrl_tpu.algo.sweep import MemberSpec

    m = MemberSpec(seed=1, gates=((None, 0.03, 5e-6),
                                  (None, 0.01, 5e-6, 100.0),
                                  (None, 0.002, 1.5e-6, 500.0)))
    assert m.next_stage(0, 0.0, x=50.0) == 0   # entropy can NEVER trigger
    assert m.next_stage(0, 5.0, x=150.0) == 1  # deadline does
    assert m.next_stage(0, 0.1, x=600.0) == 2  # deadlines cascade


def test_sweep_resume_stage_floor(tmp_path):
    """Resume must not retreat a gate-engaged stage: logs flush every ~20
    iterations and the supervisor kills with SIGKILL, so the last flushed
    row can predate an engagement (or show entropy noise-bounced above
    the gate).  The logged 'stage' field is the floor (code-review r5)."""
    import dataclasses
    import json

    from q1physrl_tpu import env as qenv
    from q1physrl_tpu.algo import PPOConfig, RunConfig
    from q1physrl_tpu.algo.sweep import MemberSpec, PopulationTrainer

    run = RunConfig(
        env=dataclasses.replace(qenv.Config.get_default(), num_envs=None),
        ppo=PPOConfig(num_envs=16, rollout_length=8, num_sgd_iter=2,
                      sgd_minibatch_size=32))
    gates = ((None, 0.03, 5e-6),
             (3.0, 0.01, 5e-6),
             (1.5, 0.002, 1.5e-6))
    m = MemberSpec(seed=1, gates=gates)
    out = str(tmp_path / "rs")
    pt = PopulationTrainer(run, [m], out, checkpoint_every=1)
    pt.train(max_env_steps=run.ppo.batch_size, max_seconds=None)

    # Simulate: stage 2 engaged after the last flush, then SIGKILL — the
    # flushed tail row records stage 2 but an entropy ABOVE every gate.
    with open(f"{out}/logs/member_00.jsonl", "a") as f:
        f.write(json.dumps({"entropy": 5.5, "step": 400, "stage": 2}) + "\n")
    pt2 = PopulationTrainer(run, [m], out, checkpoint_every=1)
    assert pt2._stage[0] == 2


def test_sweep_population_dead_zone_guard(tmp_path):
    """PopulationTrainer refuses the measured population-vmap dead zone
    (multi-member x 30-epoch x sub-MXU minibatch: ~4x per-member
    slowdown, docs/RESULTS.md round 4) unless allow_dead_zone is set
    (VERDICT r4 item 6)."""
    import dataclasses

    import pytest

    from q1physrl_tpu import env as qenv
    from q1physrl_tpu.algo import PPOConfig, RunConfig
    from q1physrl_tpu.algo.sweep import MemberSpec, PopulationTrainer

    env_cfg = dataclasses.replace(qenv.Config.get_default(), num_envs=None)
    # The measured-bad regime, scaled down in env count but with the real
    # update-chain arithmetic: 8192 envs x 96 frames, mb 256, 30 epochs
    # -> 92k updates/iter (round-4 attempt 1, 0.7x aggregate).
    bad = PPOConfig(num_envs=8192, rollout_length=96, num_sgd_iter=30,
                    sgd_minibatch_size=256)
    members = [MemberSpec(seed=1), MemberSpec(seed=2)]
    with pytest.raises(ValueError, match="dead zone"):
        PopulationTrainer(RunConfig(env=env_cfg, ppo=bad), members,
                          str(tmp_path / "bad"))

    # Host-side arithmetic only (no train state build) for the allowed
    # regimes, via the guard itself:
    check = PopulationTrainer._check_dead_zone
    # Single member: always fine.
    check(1, bad, False)
    # Fresh-data regime (3 epochs, tiny-and-few updates): fine.
    fresh = PPOConfig(num_envs=8192, rollout_length=96, num_sgd_iter=3,
                      sgd_minibatch_size=128)
    check(4, fresh, False)
    # MXU-sized minibatches: fine.
    big = PPOConfig(num_envs=8192, rollout_length=96, num_sgd_iter=30,
                    sgd_minibatch_size=8192)
    check(4, big, False)
    # Reference geometry (mb 128, 30 epochs, 50k batch -> 11.7k
    # updates/iter, the proven 189k-agg replication regime): fine.
    ref = PPOConfig(num_envs=400, rollout_length=125, num_sgd_iter=30,
                    sgd_minibatch_size=128)
    check(4, ref, False)
    # Explicit opt-in bypasses the refusal.
    check(2, bad, True)


def test_sweep_per_member_schedule_clock(tmp_path):
    """Members warm-started at different env_steps keep independent
    schedule clocks: _coeffs reads each member's own x, and train() runs
    until the SLOWEST member reaches max_env_steps (round-5 machinery
    for finishing a sweep whose members stopped at different points)."""
    import dataclasses

    from q1physrl_tpu import env as qenv
    from q1physrl_tpu.algo import PPOConfig, RunConfig
    from q1physrl_tpu.algo.sweep import MemberSpec, PopulationTrainer

    run = RunConfig(
        env=dataclasses.replace(qenv.Config.get_default(), num_envs=None),
        ppo=PPOConfig(num_envs=16, rollout_length=8, num_sgd_iter=2,
                      sgd_minibatch_size=32))
    sched = ((0, 0.03), (1000, 0.01))
    members = [MemberSpec(seed=1, entropy=sched),
               MemberSpec(seed=2, entropy=sched)]
    pt = PopulationTrainer(run, members, str(tmp_path / "s"))

    # Per-member clocks: member 0 at x=0 (coeff 0.03), member 1 at
    # x=1000 (coeff 0.01), in one Coeffs batch.
    c = pt._coeffs(np.asarray([0.0, 1000.0]))
    assert abs(float(c.entropy_coeff[0]) - 0.03) < 1e-9
    assert abs(float(c.entropy_coeff[1]) - 0.01) < 1e-9

    # Desynchronized env_steps: train() stops on the minimum, so the
    # lagging member still completes the budget.
    lag = 2 * run.ppo.batch_size
    pt.ts = pt.ts.replace(env_steps=pt.ts.env_steps.at[1].add(lag))
    pt.train(max_env_steps=3 * run.ppo.batch_size)
    steps = np.asarray(pt.ts.env_steps)
    assert steps[0] >= 3 * run.ppo.batch_size
    assert steps[1] == steps[0] + lag
    # Sidecar env_steps is the member's own value, not member 0's.
    pt.ema = [1.0, 2.0]
    pt._snapshot_best(1)
    with open(f"{tmp_path}/s/best_member_01.json") as f:
        assert json.load(f)["env_steps"] == float(steps[1])


def test_tpu_fresh_preset_matches_canonical_config():
    """PPOConfig.tpu_fresh() and configs/run_tpu_e3.yml are the same
    recipe — the preset is the API form, the YAML the CLI form; this
    guards them against drifting apart."""
    from q1physrl_tpu.algo import PPOConfig
    from q1physrl_tpu.algo.train import load_run_config

    run = load_run_config("configs/run_tpu_e3.yml")
    preset = PPOConfig.tpu_fresh()
    assert preset == run.ppo
