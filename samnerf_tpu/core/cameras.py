"""Cameras pytree + device-side ray generation.

Reference: ``nerfstudio/cameras/cameras.py`` (Cameras :62-310,
``_generate_rays_from_coords`` :490-727).  Conventions preserved exactly:

- coords are (row, col) pixel indices; pixel centers at +0.5
  (``cameras.py:284-299``);
- camera space direction = [(x-cx)/fx, -(y-cy)/fy, -1] (OpenGL, -z forward,
  ``cameras.py:607``), rotated by c2w and normalized;
- pixel_area = |d(x+1)-d(x)| * |d(y+1)-d(y)| on the *normalized* world
  directions (``cameras.py:700-707``).

TPU redesign: ray generation is a pure jittable function of (Cameras pytree,
indices, coords) that runs inside the train step, so only integer pixel
indices cross host->device.  PERSPECTIVE / FISHEYE / EQUIRECTANGULAR are
supported (the reference's three types, ``cameras.py:649-689``); rather
than the reference's boolean-mask scatter per type, all three direction
formulas are computed dense and selected per ray with jnp.where — the
XLA-friendly equivalent.  OpenCV distortion hooks in via
``undistort_coords`` when parameters are present.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from samnerf_tpu.core.rays import RayBundle

PERSPECTIVE = 1
FISHEYE = 2
EQUIRECTANGULAR = 3


@struct.dataclass
class Cameras:
    camera_to_worlds: jax.Array  # [N, 3, 4]
    fx: jax.Array  # [N, 1]
    fy: jax.Array  # [N, 1]
    cx: jax.Array  # [N, 1]
    cy: jax.Array  # [N, 1]
    width: jax.Array = struct.field(pytree_node=False, default=None)  # int
    height: jax.Array = struct.field(pytree_node=False, default=None)  # int
    distortion_params: Optional[jax.Array] = None  # [N, 6] k1 k2 k3 k4 p1 p2
    camera_type: Optional[jax.Array] = None  # [N, 1] int32, default PERSPECTIVE

    @property
    def num_cameras(self) -> int:
        return self.camera_to_worlds.shape[0]

    def rescale_output_resolution(self, scaling_factor: float) -> "Cameras":
        """``cameras.py:777-801``."""
        return self.replace(
            fx=self.fx * scaling_factor, fy=self.fy * scaling_factor,
            cx=self.cx * scaling_factor, cy=self.cy * scaling_factor,
            width=int(round(self.width * scaling_factor)),
            height=int(round(self.height * scaling_factor)))


def undistort_coords(coords: jax.Array, distortion: jax.Array,
                     num_iters: int = 3) -> jax.Array:
    """Iterative Newton undistortion of ideal coords (OpenCV model).

    Reference: ``nerfstudio/cameras/camera_utils.py``
    (radial_and_tangential_undistort); fixed iteration count for jit.
    """
    k1, k2, k3, k4 = (distortion[..., i] for i in range(4))
    p1, p2 = distortion[..., 4], distortion[..., 5]
    x = coords[..., 0]
    y = coords[..., 1]
    xd, yd = x, y

    for _ in range(num_iters):
        r2 = x * x + y * y
        d = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
        fx_ = d * x + 2 * p1 * x * y + p2 * (r2 + 2 * x * x) - xd
        fy_ = d * y + 2 * p2 * x * y + p1 * (r2 + 2 * y * y) - yd
        # Gauss-Newton step with analytic 2x2 Jacobian approx d (diag)
        x = x - fx_ / jnp.maximum(d, 1e-6)
        y = y - fy_ / jnp.maximum(d, 1e-6)
    return jnp.stack([x, y], axis=-1)


def generate_rays(cameras: Cameras, camera_indices: jax.Array,
                  coords: jax.Array, pixel_offset: float = 0.5,
                  camera_opt_to_camera: Optional[jax.Array] = None,
                  aabb_box: Optional[jax.Array] = None
                  ) -> RayBundle:
    """Generate world-space rays.

    Args:
        cameras: Cameras pytree.
        camera_indices: [R] int32.
        coords: [R, 2] float or int (row, col) pixel coords (offset added).
        camera_opt_to_camera: optional [R, 3, 4] learned pose deltas
            (``cameras.py:696-697``).
        aabb_box: optional [2, 3] crop box (min corner, max corner); sets
            per-ray near/far from the ray/aabb intersection so models only
            render inside the box (the reference's viewer crop,
            ``cameras.py:463-482`` via ``math.intersect_aabb``).
    """
    ci = camera_indices.astype(jnp.int32)
    y = coords[..., 0].astype(jnp.float32) + pixel_offset
    x = coords[..., 1].astype(jnp.float32) + pixel_offset
    fx = cameras.fx[ci, 0]
    fy = cameras.fy[ci, 0]
    cx = cameras.cx[ci, 0]
    cy = cameras.cy[ci, 0]

    # camera-plane coords + the +1-pixel offsets for pixel_area (cameras.py:607-617)
    cxs = jnp.stack([(x - cx) / fx, (x - cx + 1.0) / fx, (x - cx) / fx], axis=0)
    cys = jnp.stack([-(y - cy) / fy, -(y - cy) / fy, -(y - cy + 1.0) / fy], axis=0)
    coord_stack = jnp.stack([cxs, cys], axis=-1)  # [3, R, 2]

    if cameras.distortion_params is not None:
        dist = cameras.distortion_params[ci]  # [R, 6]
        coord_stack = undistort_coords(coord_stack, dist[None])

    # PERSPECTIVE: [x, y, -1] (cameras.py:652-656)
    dirs_persp = jnp.concatenate(
        [coord_stack, -jnp.ones_like(coord_stack[..., :1])], axis=-1)

    if cameras.camera_type is not None:
        ctype = cameras.camera_type[ci, 0][None, :, None]  # [1, R, 1]
        # FISHEYE: equidistant model (cameras.py:658-670)
        theta_f = jnp.clip(
            jnp.sqrt(jnp.sum(coord_stack ** 2, axis=-1)), 1e-6, jnp.pi)
        sin_t = jnp.sin(theta_f) / theta_f
        dirs_fish = jnp.stack(
            [coord_stack[..., 0] * sin_t, coord_stack[..., 1] * sin_t,
             -jnp.cos(theta_f)], axis=-1)
        # EQUIRECTANGULAR: fx = fy = height = width/2 (cameras.py:672-683)
        theta_e = -jnp.pi * coord_stack[..., 0]
        phi = jnp.pi * (0.5 - coord_stack[..., 1])
        dirs_eq = jnp.stack(
            [-jnp.sin(theta_e) * jnp.sin(phi), jnp.cos(phi),
             -jnp.cos(theta_e) * jnp.sin(phi)], axis=-1)
        dirs_cam = jnp.where(ctype == FISHEYE, dirs_fish,
                             jnp.where(ctype == EQUIRECTANGULAR, dirs_eq,
                                       dirs_persp))
    else:
        dirs_cam = dirs_persp

    c2w = cameras.camera_to_worlds[ci]  # [R, 3, 4]
    if camera_opt_to_camera is not None:
        from samnerf_tpu.core.lie_groups import multiply_poses
        c2w = multiply_poses(c2w, camera_opt_to_camera)
    rotation = c2w[..., :3, :3]
    dirs_world = jnp.sum(dirs_cam[..., None, :] * rotation[None], axis=-1)  # [3, R, 3]
    norms = jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
    dirs_world = dirs_world / jnp.maximum(norms, 1e-12)

    directions = dirs_world[0]
    dx = jnp.sqrt(jnp.sum((directions - dirs_world[1]) ** 2, axis=-1))
    dy = jnp.sqrt(jnp.sum((directions - dirs_world[2]) ** 2, axis=-1))
    pixel_area = (dx * dy)[..., None]

    nears = fars = None
    if aabb_box is not None:
        from samnerf_tpu.utils.misc import intersect_aabb
        t_min, t_max = intersect_aabb(c2w[..., :3, 3], directions,
                                      aabb_box.reshape(6))
        nears = t_min          # [..., 1] (keepdims from intersect_aabb)
        fars = jnp.maximum(t_max, t_min)

    return RayBundle(
        origins=c2w[..., :3, 3],
        directions=directions,
        pixel_area=pixel_area,
        camera_indices=ci[..., None],
        nears=nears,
        fars=fars)


def full_image_coords(height: int, width: int) -> np.ndarray:
    """[H*W, 2] (row, col) integer coords, row-major (``cameras.py:284-310``)."""
    yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    return np.stack([yy, xx], axis=-1).reshape(-1, 2).astype(np.float32)
