"""Video overlay tooling — counterpart of the reference's
``q1physrl_make_speed_anim`` (reference vidtools.py): renders per-frame
speed-bar + "N ups" text overlays at 60fps from a demo file, for
compositing over game footage.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

from . import analyse

__all__ = ("make_speed_anim", "main")


def _draw_speed_text(a, speed):
    import PIL.Image
    import PIL.ImageDraw
    import PIL.ImageFont

    image = PIL.Image.fromarray(a)
    draw = PIL.ImageDraw.Draw(image)
    try:
        font = PIL.ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf", 28)
    except OSError:
        font = PIL.ImageFont.load_default()
    draw.text((10, 0), f"{int(speed)} ups", (255, 255, 255), font=font)
    return np.array(image)


def _draw_speed_bar(speed, shape, border=2, max_speed=700):
    from matplotlib import cm

    cmap = cm.get_cmap("hot", shape[1]) if hasattr(cm, "get_cmap") else None
    if cmap is None:  # matplotlib >= 3.9
        import matplotlib

        cmap = matplotlib.colormaps["hot"].resampled(shape[1])
    g = cmap(np.linspace(0, 1, shape[1])) * 255
    g[np.linspace(0, max_speed, shape[1]) > speed] = [0, 0, 0, 128]
    g = np.stack([g] * shape[0], axis=0)

    im = np.empty((shape[0] + border * 2, shape[1] + border * 2, 4),
                  dtype=np.uint8)
    im[:, :] = np.array([0, 0, 0, 255])
    im[border:-border, border:-border] = g
    return im.astype(np.uint8)


def rgba_to_bgra(im):
    bgr = np.flip(im[:, :, :3], axis=2)
    return np.concatenate([bgr, im[:, :, 3][:, :, None]], axis=2)


def make_speed_anim(demo_file_path, output_dir, anim_fps=60, shape=(32, 256)):
    """Render speed-overlay PNG frames from a demo's origin trace."""
    import PIL.Image

    demo_file_path = pathlib.Path(demo_file_path)
    output_dir = pathlib.Path(output_dir)

    times, origins, yaws, _finish = analyse.parse_demo(demo_file_path)
    vels = np.diff(origins, axis=0) / np.diff(times)[:, None]
    speeds = np.linalg.norm(vels[:, :2], axis=1)

    output_dir.mkdir(exist_ok=True, parents=True)
    frame_times = np.arange(times[0] * anim_fps, times[-1] * anim_fps) / anim_fps
    frame_speeds = np.interp(frame_times, times[:-1], speeds)
    for i, s in enumerate(frame_speeds):
        frame_im = _draw_speed_text(_draw_speed_bar(s, shape), s)
        PIL.Image.fromarray(frame_im).save(output_dir / f"{i:05d}.png")
    return len(frame_speeds)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    demo, out = argv[:2]
    n = make_speed_anim(demo, out)
    print(f"wrote {n} frames to {out}")


if __name__ == "__main__":
    main()
