"""Geometry export CLI.

Reference: ``scripts/exporter.py:35-326`` (ExportPointCloud /
ExportTSDFMesh / ExportPoissonMesh subcommands over a trained run).

Usage:
    python -m samnerf_tpu.scripts.exporter pointcloud <run_dir> --output cloud.ply
    python -m samnerf_tpu.scripts.exporter tsdf <run_dir> --output mesh.obj
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["pointcloud", "tsdf", "poisson"])
    ap.add_argument("run_dir")
    ap.add_argument("--output", required=True)
    ap.add_argument("--num-views", type=int, default=8)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--resolution", type=int, default=128,
                    help="TSDF voxel grid resolution")
    ap.add_argument("--aabb-scale", type=float, default=1.5)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from samnerf_tpu.engine.eval_render import ImageRenderer
    from samnerf_tpu.exporter import exporter as ex
    from samnerf_tpu.scripts.render import orbit_c2w
    from samnerf_tpu.core.cameras import Cameras
    from samnerf_tpu.utils.eval_utils import eval_setup

    trainer, config = eval_setup(Path(args.run_dir))
    renderer = ImageRenderer(trainer.model)
    focal = 0.5 * args.width / np.tan(np.deg2rad(30.0))
    aabb = np.array([[-args.aabb_scale] * 3, [args.aabb_scale] * 3],
                    np.float32)

    views = []
    for i in range(args.num_views):
        c2w = orbit_c2w(2 * np.pi * i / args.num_views, args.aabb_scale)
        cams = Cameras(
            camera_to_worlds=jnp.asarray(c2w[None], jnp.float32),
            fx=jnp.asarray([[focal]]), fy=jnp.asarray([[focal]]),
            cx=jnp.asarray([[args.width / 2.0]]),
            cy=jnp.asarray([[args.height / 2.0]]),
            width=args.width, height=args.height)
        out = renderer.render_image(trainer.state.params, cams, 0,
                                    width=args.width, height=args.height)
        intrin = np.array([[focal, 0, args.width / 2],
                           [0, focal, args.height / 2], [0, 0, 1]])
        views.append((out, intrin, c2w))
        print(f"rendered view {i + 1}/{args.num_views}", end="\r")
    print()

    if args.mode == "pointcloud":
        pts, cols = [], []
        for out, intrin, c2w in views:
            p, c = ex.backproject_depth(out["depth"], out["rgb"],
                                        out["accumulation"], intrin, c2w,
                                        min_accumulation=0.5)
            pts.append(p)
            cols.append(c)
        pts = np.concatenate(pts)
        cols = np.concatenate(cols)
        ex.export_ply(Path(args.output), pts, colors=cols)
        print(f"wrote {len(pts)} points to {args.output}")
    elif args.mode == "poisson":
        pts, nrms = [], []
        for out, intrin, c2w in views:
            p, n = ex.depth_to_oriented_points(
                out["depth"], out["accumulation"], intrin, c2w,
                min_accumulation=0.5)
            pts.append(p)
            nrms.append(n)
        pts = np.concatenate(pts)
        nrms = np.concatenate(nrms)
        ex.export_poisson(Path(args.output), pts, nrms, aabb,
                          resolution=args.resolution)
        print(f"wrote poisson mesh from {len(pts)} oriented points to "
              f"{args.output}")
    else:  # tsdf
        state = ex.tsdf_init(args.resolution)
        for out, intrin, c2w in views:
            state = ex.tsdf_integrate(
                state, jnp.asarray(out["depth"][..., 0]),
                jnp.asarray(out["rgb"]), jnp.asarray(intrin),
                jnp.asarray(c2w), jnp.asarray(aabb))
        tsdf, weight, color = state
        verts, faces = ex.marching_tetrahedra(
            np.asarray(tsdf), aabb, mask=np.asarray(weight) > 0)
        ex.export_obj(Path(args.output), verts, faces)
        print(f"wrote mesh ({len(verts)} verts, {len(faces)} faces) to "
              f"{args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
