"""Render a camera path from a trained checkpoint.

Reference: ``scripts/render.py`` (RenderTrajectory) — loads a run via
eval_setup and writes frames/video along an orbit or a saved camera
path.  Video encoding is delegated to PNG frames (+ ffmpeg if present),
matching the reference's imageio/ffmpeg split.

Usage:
    python -m samnerf_tpu.scripts.render <run_dir> --output frames/ \
        [--num-frames 60] [--width 512 --height 512] [--orbit-radius 1.5]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def orbit_c2w(theta: float, radius: float, height: float = 0.3,
              target=np.zeros(3)) -> np.ndarray:
    """Simple orbit used by the reference's debug video
    (``samnerf/sam_pipeline.py:36-40`` get_c2w_t)."""
    position = np.array([radius * np.cos(theta), radius * np.sin(theta),
                         height])
    forward = target - position
    forward = forward / np.linalg.norm(forward)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(forward, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, forward)
    c2w = np.eye(4)[:3]
    c2w[:, 0] = right
    c2w[:, 1] = true_up
    c2w[:, 2] = -forward
    c2w[:, 3] = position
    return c2w


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--output", default="renders")
    ap.add_argument("--num-frames", type=int, default=60)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--orbit-radius", type=float, default=1.5)
    ap.add_argument("--fov-deg", type=float, default=60.0)
    ap.add_argument("--traj", default="orbit",
                    choices=("orbit", "spiral", "interpolate", "filename"),
                    help="trajectory source (reference scripts/render.py "
                         "--traj: spiral | interpolate | filename)")
    ap.add_argument("--camera-path-filename", default="camera_path.json",
                    help="viewer camera-path export (with --traj filename)")
    ap.add_argument("--video", default=None,
                    help="also assemble frames into this video/gif "
                         "(mp4 needs an ffmpeg backend; gif always works)")
    args = ap.parse_args(argv)

    from PIL import Image

    from samnerf_tpu.core.cameras import Cameras
    from samnerf_tpu.engine.eval_render import ImageRenderer
    from samnerf_tpu.utils.eval_utils import eval_setup

    import jax.numpy as jnp

    from samnerf_tpu.core import camera_paths as cp

    trainer, config = eval_setup(Path(args.run_dir))
    renderer = ImageRenderer(trainer.model)
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    focal = 0.5 * args.width / np.tan(np.deg2rad(args.fov_deg) / 2)
    if args.traj == "filename":
        import json
        path_cams = cp.get_path_from_json(
            json.loads(Path(args.camera_path_filename).read_text()))
        w, h = path_cams.width, path_cams.height
    elif args.traj == "interpolate":
        import jax
        eval_cams = jax.tree.map(jnp.asarray,
                                 trainer.datamanager.eval_cameras)
        steps = max(args.num_frames // max(eval_cams.num_cameras - 1, 1), 1)
        path_cams = cp.get_interpolated_camera_path(eval_cams, steps)
        # dataset intrinsics belong to the dataset resolution
        w, h = path_cams.width, path_cams.height
    elif args.traj == "spiral":
        import jax
        cams0 = jax.tree.map(jnp.asarray, trainer.datamanager.cameras)
        start = jax.tree.map(lambda x: x[:1] if hasattr(x, "ndim") else x,
                             cams0)
        path_cams = cp.get_spiral_path(start, steps=args.num_frames,
                                       radius=0.1)
        w, h = path_cams.width, path_cams.height
    else:
        c2ws = np.stack([orbit_c2w(2 * np.pi * i / args.num_frames,
                                   args.orbit_radius)
                         for i in range(args.num_frames)])
        n = c2ws.shape[0]
        path_cams = Cameras(
            camera_to_worlds=jnp.asarray(c2ws, jnp.float32),
            fx=jnp.full((n, 1), focal), fy=jnp.full((n, 1), focal),
            cx=jnp.full((n, 1), args.width / 2.0),
            cy=jnp.full((n, 1), args.height / 2.0),
            width=args.width, height=args.height)
        w, h = args.width, args.height

    num = path_cams.num_cameras
    for i in range(num):
        out = renderer.render_image(trainer.state.params, path_cams, i,
                                    width=w, height=h)
        img = (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(out_dir / f"frame_{i:05d}.png")
        print(f"frame {i + 1}/{num}", end="\r")
    print(f"\nwrote {num} frames to {out_dir}")
    if args.video:
        try:
            import imageio
            frames = [imageio.imread(out_dir / f"frame_{i:05d}.png")
                      for i in range(num)]
            imageio.mimsave(args.video, frames, fps=24)
            print(f"wrote {args.video}")
        except Exception as e:   # mp4 without an ffmpeg backend etc.
            print(f"video assembly failed ({e}); frames are in {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
