"""Evaluation and trajectory analysis.

TPU-native counterpart of the reference's q1physrl/analyse.py: the episode
rollout is one jitted ``lax.scan`` (vs the reference's per-frame Python
loop, analyse.py:213-228), and the 360-angle counterfactual sweep is a
single ``vmap`` over the whole trajectory (vs 360 sequential ``phys.apply``
calls, analyse.py:99-118).

``parse_demo`` reads .dem files via our own protocol-15 reader
(utils/demfile.py), replacing the reference's pyquake dependency
(analyse.py:34-68).
"""

from __future__ import annotations

import dataclasses
import functools
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from . import models, phys
from .env import core as env_core
from .env.config import Config, Key

__all__ = ("EvalSimResult", "eval_sim", "eval_zero_start", "parse_demo",
           "draw_inputs", "plot_all_checkpoints")


def parse_demo(fname):
    """Read a .dem file -> (times, origins, yaws, finish_time), tracking the
    view entity like the reference's pyquake-based parser (analyse.py:34-68).
    """
    from .utils import demfile

    return demfile.parse_demo(fname)


@dataclasses.dataclass
class EvalSimResult:
    """A recorded episode plus derived analytics (reference analyse.py:71-148).

    Per-frame arrays have leading axis T; ``player_state`` holds the
    *pre-step* state of each frame.
    """

    time_delta: float
    player_state: phys.PlayerState
    action: np.ndarray     # (T, num_keys [+1]) raw action vector
    obs: np.ndarray        # (T, 6)
    reward: np.ndarray     # (T,)
    yaw: np.ndarray        # (T,) decoded view yaw (degrees)
    smove: np.ndarray      # (T,)
    fmove: np.ndarray      # (T,)
    jump: np.ndarray       # (T,) bool

    @property
    def move_angle(self):
        return 180.0 * np.arctan2(np.asarray(self.player_state.vel_y),
                                  np.asarray(self.player_state.vel_x)) / np.pi

    @property
    def wish_angle(self):
        return self.yaw - 180.0 * np.arctan2(self.smove, self.fmove) / np.pi

    @property
    def speed(self):
        return np.hypot(np.asarray(self.player_state.vel_x),
                        np.asarray(self.player_state.vel_y))

    def hypothetical_delta_speeds(self, fmove=800.0, time_delta=0.014):
        """Counterfactual sweep: speed gain at each frame for each of 360
        candidate wish angles (relative to the move angle).  Shape (360, T).

        One vmapped phys.apply over (angle, frame) — the reference loops
        360 sequential batched applies (analyse.py:99-118).  Defaults
        (fmove=800, dt=0.014) match the reference's hardcoded values.
        """
        move_angle = jnp.asarray(self.move_angle)
        ps = jax.tree.map(jnp.asarray, self.player_state)
        jump = jnp.asarray(self.jump)

        def delta_for(rel_wish_angle):
            inputs = phys.Inputs(
                yaw=move_angle + rel_wish_angle,
                pitch=jnp.zeros_like(move_angle),
                roll=jnp.zeros_like(move_angle),
                fmove=jnp.full_like(move_angle, fmove),
                smove=jnp.zeros_like(move_angle),
                button2=jump,
                time_delta=jnp.full_like(move_angle, time_delta),
            )
            before = jnp.hypot(ps.vel_x, ps.vel_y)
            nxt = phys.apply(inputs, ps)
            return jnp.hypot(nxt.vel_x, nxt.vel_y) - before

        sweep = jax.jit(jax.vmap(delta_for))
        return np.asarray(sweep(jnp.arange(-180.0, 180.0)))

    def wish_angle_yaw_plot(self, figsize=(20, 16), top_fraction=0.05,
                            ax=None):
        """Heat map of near-optimal wish angles per frame with the agent's
        actual wish angle overlaid — same diagnostic as the reference's
        plot (analyse.py:120-148): is the agent steering its wish direction
        into the band of angles that maximizes speed gain?

        Per frame, angles whose counterfactual speed gain falls in the top
        ``top_fraction`` quantile are highlighted with intensity scaled
        from the quantile threshold up to the frame optimum (frames where
        no angle changes speed stay dark).
        """
        import matplotlib.pyplot as plt

        delta = self.hypothetical_delta_speeds()      # (360, T)
        q = np.quantile(delta, 1.0 - top_fraction, axis=0, keepdims=True)
        top = delta.max(axis=0, keepdims=True)
        band = np.clip((delta - q) / np.maximum(top - q, 1e-9), 0.0, 1.0)
        band = np.where(np.abs(delta) < 1e-3, 0.0, band)

        if ax is None:
            _, ax = plt.subplots(figsize=figsize)
        im = ax.imshow(band, cmap="viridis", aspect="auto",
                       extent=(0, delta.shape[1], 180, -180))
        rel = ((self.wish_angle - self.move_angle + 180) % 360) - 180
        ax.plot(rel, color="#ff00ff", linestyle="--",
                label="agent wish angle")
        ax.set_ylim(180, -180)
        ax.set_ylabel("wish_angle - move_angle")
        ax.set_xlabel("frame")
        ax.figure.colorbar(im, ax=ax, orientation="horizontal")
        return ax


def _policy_from(policy, env_cfg: Config, deterministic: bool):
    """Normalize a policy spec (params pytree | callable) to
    fn(obs, rng) -> (key_actions (K, N), yaw_action (N,))."""
    if callable(policy) and not isinstance(policy, dict):
        return policy

    params = policy

    def fn(obs, rng):
        logits, _ = models.forward(params, obs.astype(jnp.float32))
        dist = models.action_dist(env_cfg, logits)
        return dist.mode() if deterministic else dist.sample(rng)

    return fn


def eval_sim(policy, env_config: Config, *, seed: int = 0,
             deterministic: bool = False, zero_start: bool = True,
             max_steps: int | None = None) -> EvalSimResult:
    """Roll out one episode and record the trajectory
    (reference analyse.py:197-240).

    ``policy`` is either a params pytree (our models) or a callable
    ``fn(obs, rng) -> (key_actions, yaw_action)`` for scripted policies.
    """
    cfg = dataclasses.replace(env_config, num_envs=None)
    if zero_start:
        cfg = dataclasses.replace(cfg, zero_start_prob=1.0)
    if max_steps is None:
        max_steps = int(np.ceil(cfg.time_limit / cfg.time_delta)) + 2
    policy_fn = _policy_from(policy, cfg, deterministic)

    def body(carry, _):
        st, rng, alive = carry
        obs = env_core.compute_obs(cfg, st.player, st.yaw, st.time_remaining)
        rng, k = jax.random.split(rng)
        ka, ya = policy_fn(obs, k)
        yaw, smove, fmove, jump = env_core.decode_actions(cfg, st, ka, ya)
        pre_state = st.player
        st, out = env_core.step(cfg, st, ka, ya, compute_observation=False)
        rec = (pre_state, obs, ka, ya, out.reward * alive, yaw, smove, fmove,
               jump, alive)
        alive = alive & ~out.done
        return (st, rng, alive), rec

    k_reset, k_policy = jax.random.split(jax.random.key(seed))
    state = env_core.reset(cfg, k_reset, 1)
    (state, _, _), rec = jax.jit(
        lambda c: jax.lax.scan(body, c, None, length=max_steps))(
            (state, k_policy, jnp.ones((1,), bool)))

    (pre_state, obs, ka, ya, reward, yaw, smove, fmove, jump, alive) = rec
    t_len = int(np.asarray(alive)[:, 0].sum())
    cut = lambda x: np.asarray(x)[:t_len, ..., 0]
    action = np.concatenate(
        [np.asarray(ka)[:t_len, :, 0], np.asarray(ya)[:t_len]], axis=1)
    return EvalSimResult(
        time_delta=cfg.time_delta,
        player_state=phys.PlayerState(
            z_pos=cut(pre_state.z_pos), vel_x=cut(pre_state.vel_x),
            vel_y=cut(pre_state.vel_y), vel_z=cut(pre_state.vel_z),
            on_ground=cut(pre_state.on_ground),
            jump_released=cut(pre_state.jump_released)),
        action=action,
        obs=np.asarray(obs)[:t_len, 0],
        reward=cut(reward),
        yaw=cut(yaw),
        smove=cut(smove),
        fmove=cut(fmove),
        jump=cut(jump),
    )


@functools.lru_cache(maxsize=None)
def _zero_start_runner(cfg: Config, n: int, steps: int, deterministic: bool):
    """Compiled zero-start episode batch, cached per (config, geometry) —
    params are a runtime argument, so evaluating many checkpoints (e.g. a
    sweep's members) reuses one compilation."""

    def run(params, key_reset, key_policy):
        def body(carry, _):
            st, rng, ret, alive = carry
            obs = env_core.compute_obs(cfg, st.player, st.yaw,
                                       st.time_remaining)
            rng, k = jax.random.split(rng)
            ka, ya = _policy_from(params, cfg, deterministic)(obs, k)
            st, out = env_core.step(cfg, st, ka, ya,
                                    compute_observation=False)
            ret = ret + out.reward * alive
            alive = alive & ~out.done
            return (st, rng, ret, alive), None

        state = env_core.reset(cfg, key_reset, n)
        init = (state, key_policy, jnp.zeros(n), jnp.ones(n, bool))
        (_, _, ret, _), _ = jax.lax.scan(body, init, None, length=steps)
        return ret

    return jax.jit(run)


def eval_zero_start(policy, env_config: Config, *, num_episodes: int = 512,
                    deterministic: bool = False, seed: int = 0) -> dict:
    """Batch-evaluate zero-start performance: the proper, low-variance
    measurement of the training north-star (the per-iteration
    ``zero_start_total_reward_mean`` sees only ~batch*1% episodes).

    Runs ``num_episodes`` full zero-start episodes in lockstep under one
    jitted scan and returns summary stats.
    """
    cfg = dataclasses.replace(env_config, num_envs=None, zero_start_prob=1.0)
    n = num_episodes
    steps = int(np.ceil(cfg.time_limit / cfg.time_delta)) + 2

    if callable(policy) and not isinstance(policy, dict):
        # Scripted policies close over arbitrary Python state — compile
        # per call (rare, test-only path).
        policy_fn = _policy_from(policy, cfg, deterministic)

        def body(carry, _):
            st, rng, ret, alive = carry
            obs = env_core.compute_obs(cfg, st.player, st.yaw,
                                       st.time_remaining)
            rng, k = jax.random.split(rng)
            ka, ya = policy_fn(obs, k)
            st, out = env_core.step(cfg, st, ka, ya,
                                    compute_observation=False)
            ret = ret + out.reward * alive
            alive = alive & ~out.done
            return (st, rng, ret, alive), None

        state = env_core.reset(cfg, jax.random.key(seed), n)
        init = (state, jax.random.key(seed + 1), jnp.zeros(n),
                jnp.ones(n, bool))
        (_, _, ret, _), _ = jax.jit(
            lambda c: jax.lax.scan(body, c, None, length=steps))(init)
    else:
        run = _zero_start_runner(cfg, n, steps, deterministic)
        ret = run(policy, jax.random.key(seed), jax.random.key(seed + 1))
    ret = np.asarray(ret)
    return {
        "mean": float(ret.mean()), "median": float(np.median(ret)),
        "std": float(ret.std()), "min": float(ret.min()),
        "max": float(ret.max()), "num_episodes": n,
    }


def _arrow_polygon(length, width, head_frac):
    """Arrow outline pointing +y from the origin: a shaft rectangle topped
    by a triangular head, counter-clockwise (our own construction; the
    visual contract — filled directional arrows — matches the reference's
    key overlay, analyse.py:151-182)."""
    body = length * (1.0 - head_frac)
    half = 0.5 * width
    barb = length * head_frac
    return np.array([
        (half, 0.0), (half, body), (barb, body), (0.0, length),
        (-barb, body), (-half, body), (-half, 0.0)])


def _rasterize_polygon(im, pts, color, supersample=2):
    """Alpha-composite a filled polygon onto an RGBA uint8 image.

    Coverage is computed by point-in-polygon tests on a ``supersample``x
    subpixel grid over the polygon's bounding box (numpy + matplotlib.path
    — no OpenCV dependency)."""
    from matplotlib.path import Path

    h, w = im.shape[:2]
    x0 = max(int(np.floor(pts[:, 0].min())), 0)
    x1 = min(int(np.ceil(pts[:, 0].max())) + 1, w)
    y0 = max(int(np.floor(pts[:, 1].min())), 0)
    y1 = min(int(np.ceil(pts[:, 1].max())) + 1, h)
    if x0 >= x1 or y0 >= y1:
        return

    s = supersample
    xs = x0 + (np.arange((x1 - x0) * s) + 0.5) / s
    ys = y0 + (np.arange((y1 - y0) * s) + 0.5) / s
    gx, gy = np.meshgrid(xs, ys)
    inside = Path(pts).contains_points(
        np.column_stack([gx.ravel(), gy.ravel()]))
    cov = (inside.reshape(y1 - y0, s, x1 - x0, s)
           .astype(np.float32).mean(axis=(1, 3)))

    region = im[y0:y1, x0:x1].astype(np.float32)
    color = np.asarray(color, np.float32)
    a = cov[..., None]
    region[..., :3] = region[..., :3] * (1 - a) + color[:3] * a
    region[..., 3] = np.maximum(region[..., 3], color[3] * cov)
    im[y0:y1, x0:x1] = region.astype(np.uint8)


def _draw_arrow(im, pos, vec, width, head_size, color, xform):
    """Render a filled arrow onto an RGBA image at ``pos`` pointing along
    ``vec`` (length = |vec|), under the affine ``xform``."""
    length = float(np.linalg.norm(vec))
    if length < 1e-5:
        return
    d = np.asarray(vec, float) / length
    # Rotate the +y-pointing template onto d, translate to pos, then apply
    # the caller's placement transform.
    local = np.array([[d[1], d[0], pos[0]],
                      [-d[0], d[1], pos[1]],
                      [0.0, 0.0, 1.0]])
    poly = _arrow_polygon(length, width, head_size)
    pts_h = np.column_stack([poly, np.ones(len(poly))]) @ (xform @ local).T
    _rasterize_polygon(im, pts_h[:, :2], color)


def _draw_arrow_key(im, pos, vec, pressed, xform):
    color = [0, 255, 255, 255] if pressed else [200, 200, 200, 255]
    _draw_arrow(im, np.asarray(pos, float), np.asarray(vec, float),
                8.0, 0.4, color, xform)


def draw_inputs(im, keys, yaw, xform):
    """Overlay pressed-key arrows (WASD layout) onto a video frame —
    the reference's input overlay (analyse.py:185-194): forward up,
    strafes sideways, an always-unpressed back arrow for symmetry."""
    _draw_arrow_key(im, [40, 20], [0, -20], keys[Key.FORWARD], xform)
    _draw_arrow_key(im, [20, 40], [-20, 0], keys[Key.STRAFE_LEFT], xform)
    _draw_arrow_key(im, [40, 30], [0, 20], False, xform)
    _draw_arrow_key(im, [60, 40], [20, 0], keys[Key.STRAFE_RIGHT], xform)


def plot_all_checkpoints(argv=None):
    """CLI: render a wish-angle plot per checkpoint in a run directory
    (working replacement for the reference's bit-rotted version,
    analyse.py:243-278)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from .algo import checkpoint as ckpt_mod
    from .algo.train import load_run_config

    argv = argv if argv is not None else sys.argv[1:]
    run_yaml, checkpoint_dir, output_dir = argv[:3]
    run = load_run_config(run_yaml)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    from .algo.ppo import init_train_state
    template = init_train_state(jax.random.key(0), run.env, run.ppo)

    paths = sorted(Path(checkpoint_dir).glob("iter_*"))
    for i, path in enumerate(paths):
        ts = ckpt_mod.restore_checkpoint(str(path), template)
        r = eval_sim(ts.params, run.env)
        r.wish_angle_yaw_plot()
        output_path = out / f"{i:04d}.png"
        plt.savefig(output_path)
        plt.close()
        print(f"Wrote {output_path}")
