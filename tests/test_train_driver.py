"""Training-driver behaviours not covered elsewhere: auto-resume, the
best-stat checkpoint policy (reference train.py:119-133), the evaluate CLI,
and reference parity for the counterfactual wish-angle sweep
(reference analyse.py:91-118).
"""

import dataclasses

import jax
import numpy as np
import yaml

from q1physrl_tpu import analyse, env as qenv, models
from q1physrl_tpu.algo import PPOConfig, RunConfig
from q1physrl_tpu.algo.train import Trainer

from _reference import load_reference

SMOKE_PPO = dict(num_envs=64, rollout_length=16, num_sgd_iter=2,
                 sgd_minibatch_size=256)


def test_auto_resume_from_latest(tmp_path):
    """A fresh Trainer on the same checkpoint_dir resumes where the last
    run stopped (SURVEY.md section 5.3: recovery = checkpoint-restart)."""
    run = RunConfig(ppo=PPOConfig(**SMOKE_PPO), max_iterations=2,
                    checkpoint_dir=str(tmp_path))
    t1 = Trainer(run)
    t1.train()
    assert int(t1.ts.iteration) == 2

    t2 = Trainer(run)  # auto_resume defaults True
    assert int(t2.ts.iteration) == 2
    assert float(t2.ts.env_steps) == float(t1.ts.env_steps)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), t1.ts.params, t2.ts.params)

    t3 = Trainer(dataclasses.replace(run, auto_resume=False))
    assert int(t3.ts.iteration) == 0


def test_resume_of_finished_run_exits_cleanly(tmp_path):
    """Resuming a run whose budget is already spent must exit with a final
    save and run ZERO further train iterations (VERDICT r2 weak-point 5:
    the round-2 loop checked its budget only after stepping, so the
    supervisor's restart-after-completion path re-trained one iteration —
    and could hit an unbound ``last_saved`` on the final-save line)."""
    run = RunConfig(ppo=PPOConfig(**SMOKE_PPO), max_iterations=2,
                    checkpoint_dir=str(tmp_path))
    t1 = Trainer(run)
    t1.train()
    steps_done = float(t1.ts.env_steps)

    # Resume by max_iterations already reached.
    t2 = Trainer(run)
    t2.step = lambda: (_ for _ in ()).throw(
        AssertionError("train_iter ran on a finished run"))
    t2.train()  # must not raise (NameError or the poisoned step)
    assert float(t2.ts.env_steps) == steps_done

    # Resume by max_env_steps already reached.
    run3 = dataclasses.replace(run, max_iterations=None,
                               max_env_steps=steps_done)
    t3 = Trainer(run3)
    t3.step = t2.step
    t3.train()
    assert float(t3.ts.env_steps) == steps_done

    # The clean exit still left a resumable checkpoint.
    t4 = Trainer(run)
    assert float(t4.ts.env_steps) == steps_done


def test_best_stat_checkpoint_policy(tmp_path):
    """Save when any tracked stat beats its best or every N iterations;
    NaN stats never count (reference train.py:67-74, 119-133)."""
    run = RunConfig(ppo=PPOConfig(**SMOKE_PPO), checkpoint_dir=str(tmp_path),
                    auto_resume=False, checkpoint_every=100)
    t = Trainer(run)

    m = dict(episode_reward_mean=1.0, episode_reward_max=2.0,
             zero_start_total_reward_mean=float("nan"))
    assert t.maybe_checkpoint(1, m) is not None          # first values: best
    assert "zero_start_total_reward_mean" not in t.best  # NaN ignored
    assert t.maybe_checkpoint(2, m) is None              # no improvement
    m2 = dict(m, episode_reward_max=3.0)
    assert t.maybe_checkpoint(3, m2) is not None         # one stat improved
    assert t.best["episode_reward_max"].val == 3.0
    assert t.best["episode_reward_mean"].val == 1.0
    assert t.maybe_checkpoint(100, m) is not None        # periodic save
    m3 = dict(m, zero_start_total_reward_mean=5.0)
    assert t.maybe_checkpoint(101, m3) is not None       # NaN -> value: best
    assert t.best["zero_start_total_reward_mean"].val == 5.0


def test_evaluate_cli(tmp_path):
    """python -m q1physrl_tpu.algo.evaluate <run.yml> <ckpt_dir> [episodes]"""
    from q1physrl_tpu.algo import evaluate

    run = RunConfig(ppo=PPOConfig(**SMOKE_PPO), max_iterations=1,
                    checkpoint_dir=str(tmp_path / "ckpt"))
    Trainer(run).train()

    cfg_path = tmp_path / "run.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"ppo": SMOKE_PPO,
                        "checkpoint_dir": str(tmp_path / "ckpt")}, f)
    sto, det = evaluate.main([str(cfg_path), str(tmp_path / "ckpt"), "4"])
    assert sto["num_episodes"] == 4
    assert np.isfinite(sto["mean"]) and np.isfinite(det["mean"])


def test_hypothetical_delta_speeds_matches_reference():
    """Our vmapped counterfactual sweep reproduces the reference's 360
    sequential batched phys.apply calls (reference analyse.py:91-118)."""
    ref_phys, _ = load_reference()

    cfg = dataclasses.replace(qenv.Config.get_default(), num_envs=None,
                              zero_start_prob=1.0)
    params = models.init_params(jax.random.key(4), cfg)
    r = analyse.eval_sim(params, cfg, seed=5, max_steps=150)

    ours = r.hypothetical_delta_speeds()

    ps = r.player_state
    vel = np.stack([np.asarray(ps.vel_x), np.asarray(ps.vel_y),
                    np.asarray(ps.vel_z)], axis=1).astype(np.float64)
    ref_state = ref_phys.PlayerState(
        z_pos=np.asarray(ps.z_pos, np.float64),
        vel=vel,
        on_ground=np.asarray(ps.on_ground),
        jump_released=np.asarray(ps.jump_released))
    move_angle = 180.0 * np.arctan2(vel[:, 1], vel[:, 0]) / np.pi
    jump = np.asarray(r.jump)

    deltas = []
    for rel in np.arange(-180.0, 180.0):
        inputs = ref_phys.Inputs(
            yaw=move_angle + rel,
            pitch=np.zeros_like(move_angle),
            roll=np.zeros_like(move_angle),
            fmove=np.full_like(move_angle, 800.0),
            smove=np.zeros_like(move_angle),
            button2=jump,
            time_delta=np.full_like(move_angle, 0.014))
        before = np.linalg.norm(vel[:, :2], axis=1)
        nxt = ref_phys.apply(inputs, ref_state)
        deltas.append(np.linalg.norm(nxt.vel[:, :2], axis=1) - before)
    expected = np.stack(deltas)

    assert ours.shape == expected.shape == (360, 150)
    np.testing.assert_allclose(ours, expected, atol=5e-3, rtol=1e-4)
