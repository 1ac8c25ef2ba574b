"""Camera trajectories for offline rendering.

Reference: ``nerfstudio/cameras/camera_paths.py`` — the three path
sources the reference's ``scripts/render.py`` consumes:

- ``get_path_from_json``: the viewer's camera-path editor export
  (``camera_path.json`` with per-keyframe three.js ``camera_to_world``
  and ``fov``; ``camera_paths.py:118-177``),
- ``get_interpolated_camera_path``: quaternion-slerp between dataset
  cameras (``camera_paths.py:30-45`` via
  ``camera_utils.get_interpolated_poses_many:205-230``),
- ``get_spiral_path``: local spiral around a camera
  (``camera_paths.py:48-114``).

All pure numpy (host-side trajectory construction); outputs are the
jax-pytree ``Cameras``.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from samnerf_tpu.core.cameras import (EQUIRECTANGULAR, FISHEYE, PERSPECTIVE,
                                      Cameras)


def three_js_perspective_camera_focal_length(fov_deg: float,
                                             image_height: int) -> float:
    """three.js vertical-fov -> focal length in pixels
    (``viewer/server/utils.py:48-60``)."""
    if fov_deg is None:
        return 50.0
    return (image_height / 2.0) / np.tan(np.deg2rad(fov_deg) / 2.0)


def _rot_to_quat(m: np.ndarray) -> np.ndarray:
    """3x3 rotation -> (w, x, y, z) unit quaternion."""
    t = np.trace(m)
    if t > 0:
        s = 0.5 / np.sqrt(t + 1.0)
        return np.array([0.25 / s, (m[2, 1] - m[1, 2]) * s,
                         (m[0, 2] - m[2, 0]) * s, (m[1, 0] - m[0, 1]) * s])
    i = int(np.argmax(np.diag(m)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = 2.0 * np.sqrt(max(1.0 + m[i, i] - m[j, j] - m[k, k], 1e-12))
    q = np.empty(4)
    q[0] = (m[k, j] - m[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (m[j, i] + m[i, j]) / s
    q[1 + k] = (m[k, i] + m[i, k]) / s
    return q / np.linalg.norm(q)


def _quat_to_rot(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def quaternion_slerp(q0: np.ndarray, q1: np.ndarray,
                     fraction: float) -> np.ndarray:
    """Shortest-path slerp (``camera_utils.py:106-140``)."""
    q0 = q0 / np.linalg.norm(q0)
    q1 = q1 / np.linalg.norm(q1)
    if fraction <= 0.0:
        return q0
    if fraction >= 1.0:
        return q1
    d = float(np.dot(q0, q1))
    if d < 0.0:
        d, q1 = -d, -q1
    if abs(abs(d) - 1.0) < 1e-8:
        return q0
    angle = np.arccos(np.clip(d, -1.0, 1.0))
    if abs(angle) < 1e-8:
        return q0
    isin = 1.0 / np.sin(angle)
    return (np.sin((1.0 - fraction) * angle) * isin * q0
            + np.sin(fraction * angle) * isin * q1)


def get_interpolated_poses(pose_a: np.ndarray, pose_b: np.ndarray,
                           steps: int = 10) -> np.ndarray:
    """[steps, 3, 4] interpolation: slerp rotation, lerp translation
    (``camera_utils.py:164-186``)."""
    qa = _rot_to_quat(pose_a[:3, :3])
    qb = _rot_to_quat(pose_b[:3, :3])
    out = []
    for t in np.linspace(0.0, 1.0, steps, endpoint=False):
        r = _quat_to_rot(quaternion_slerp(qa, qb, float(t)))
        trans = (1.0 - t) * pose_a[:3, 3] + t * pose_b[:3, 3]
        out.append(np.concatenate([r, trans[:, None]], axis=1))
    return np.stack(out)


def get_interpolated_camera_path(cameras: Cameras, steps: int) -> Cameras:
    """Slerp path visiting every camera in order
    (``camera_paths.py:30-45``): ``steps`` interpolated poses per
    transition; intrinsics linearly interpolated."""
    poses = np.asarray(cameras.camera_to_worlds)
    if poses.shape[0] < 2:
        return cameras            # nothing to interpolate between
    fx = np.asarray(cameras.fx)[:, 0]
    fy = np.asarray(cameras.fy)[:, 0]
    all_poses, all_fx, all_fy = [], [], []
    for a in range(poses.shape[0] - 1):
        seg = get_interpolated_poses(poses[a], poses[a + 1], steps)
        all_poses.append(seg)
        ts = np.linspace(0.0, 1.0, steps, endpoint=False)
        all_fx.append((1 - ts) * fx[a] + ts * fx[a + 1])
        all_fy.append((1 - ts) * fy[a] + ts * fy[a + 1])
    poses_out = np.concatenate(all_poses)
    n = poses_out.shape[0]
    cx = float(np.asarray(cameras.cx)[0, 0])
    cy = float(np.asarray(cameras.cy)[0, 0])
    return Cameras(
        camera_to_worlds=jnp.asarray(poses_out.astype(np.float32)),
        fx=jnp.asarray(np.concatenate(all_fx).astype(np.float32))[:, None],
        fy=jnp.asarray(np.concatenate(all_fy).astype(np.float32))[:, None],
        cx=jnp.full((n, 1), cx), cy=jnp.full((n, 1), cy),
        width=cameras.width, height=cameras.height)


def _viewmatrix(lookat: np.ndarray, up: np.ndarray,
                pos: np.ndarray) -> np.ndarray:
    """Camera-to-world from look direction (``camera_utils.py`` viewmatrix
    convention: looking down -z)."""
    vec2 = lookat / np.linalg.norm(lookat)
    vec0 = np.cross(up, vec2)
    vec0 = vec0 / np.linalg.norm(vec0)
    vec1 = np.cross(vec2, vec0)
    return np.stack([vec0, vec1, vec2, pos], axis=1)


def get_spiral_path(camera: Cameras, steps: int = 30,
                    radius: Optional[float] = None,
                    radiuses: Optional[Tuple[float, ...]] = None,
                    rots: int = 2, zrate: float = 0.5) -> Cameras:
    """Local spiral around ``camera`` (``camera_paths.py:48-114``)."""
    assert (radius is None) != (radiuses is None), \
        "exactly one of radius / radiuses"
    rad = np.array([radius] * 3 if radius is not None else radiuses)
    c2w = np.asarray(camera.camera_to_worlds)[0]
    up = c2w[:3, 2]
    focal = float(min(np.asarray(camera.fx)[0, 0],
                      np.asarray(camera.fy)[0, 0]))
    target = np.array([0.0, 0.0, -focal])
    c2wh = np.eye(4)
    c2wh[:3] = c2w
    out = []
    for theta in np.linspace(0.0, 2.0 * np.pi * rots, steps + 1)[:-1]:
        center = np.array([np.cos(theta), -np.sin(theta),
                           -np.sin(theta * zrate)]) * rad
        local = np.eye(4)
        local[:3] = _viewmatrix(center - target, up, center)
        out.append((c2wh @ local)[:3])
    poses = np.stack(out).astype(np.float32)
    n = poses.shape[0]
    return Cameras(
        camera_to_worlds=jnp.asarray(poses),
        fx=jnp.full((n, 1), float(np.asarray(camera.fx)[0, 0])),
        fy=jnp.full((n, 1), float(np.asarray(camera.fy)[0, 0])),
        cx=jnp.full((n, 1), float(np.asarray(camera.cx)[0, 0])),
        cy=jnp.full((n, 1), float(np.asarray(camera.cy)[0, 0])),
        width=camera.width, height=camera.height)


def get_path_from_json(camera_path: Dict[str, Any]) -> Cameras:
    """Viewer camera-path export -> Cameras
    (``camera_paths.py:118-177``)."""
    h = int(camera_path["render_height"])
    w = int(camera_path["render_width"])
    kind = camera_path.get("camera_type", "perspective")
    ctype = {"perspective": PERSPECTIVE, "fisheye": FISHEYE,
             "equirectangular": EQUIRECTANGULAR}.get(kind, PERSPECTIVE)
    c2ws, fxs, fys = [], [], []
    for cam in camera_path["camera_path"]:
        c2ws.append(np.asarray(cam["camera_to_world"],
                               np.float32).reshape(4, 4)[:3])
        if ctype == EQUIRECTANGULAR:
            fxs.append(w / 2.0)
            fys.append(float(h))
        else:
            f = three_js_perspective_camera_focal_length(cam.get("fov"), h)
            fxs.append(f)
            fys.append(f)
    n = len(c2ws)
    return Cameras(
        camera_to_worlds=jnp.asarray(np.stack(c2ws)),
        fx=jnp.asarray(np.asarray(fxs, np.float32))[:, None],
        fy=jnp.asarray(np.asarray(fys, np.float32))[:, None],
        cx=jnp.full((n, 1), w / 2.0), cy=jnp.full((n, 1), h / 2.0),
        camera_type=jnp.full((n, 1), ctype, jnp.int32),
        width=w, height=h)
