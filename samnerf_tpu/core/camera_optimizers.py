"""Learned per-camera pose refinement.

Reference: ``nerfstudio/cameras/camera_optimizers.py:40-133`` — zero-init
per-camera 6-dof tangent vectors, exponentiated to [R|t] deltas that
right-multiply the dataset camera-to-worlds.  Off by default in the
samnerf configs (``samnerf/samconfigs.py:69-71``) but part of the
training surface (own optimizer group "camera_opt").
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from samnerf_tpu.core.lie_groups import (exp_map_SE3, exp_map_SO3xR3,
                                         multiply_poses)


class CameraOptimizer(nn.Module):
    """mode: "off" | "SO3xR3" | "SE3" (``camera_optimizers.py:46``).

    Limitation: the hash encodings in ``ops/encodings.py`` deliberately
    return zero gradients w.r.t. positions (matching samnerf's detach), so
    pose gradients flow only through ray *directions* and the density
    field's view-dependent terms — weaker than the reference's full
    position gradient. If pose optimization underperforms, use the
    frequency encodings or enable position grads in the hash encode.
    """

    num_cameras: int
    mode: str = "off"

    @nn.compact
    def __call__(self, indices: jax.Array) -> jax.Array:
        """indices [R] int32 -> camera_opt_to_camera deltas [R, 3, 4]."""
        eye = jnp.broadcast_to(jnp.eye(4)[None, :3, :4],
                               (indices.shape[0], 3, 4))
        if self.mode == "off":
            return eye
        adj = self.param("pose_adjustment", nn.initializers.zeros,
                         (self.num_cameras, 6))
        tangent = adj[indices]
        if self.mode == "SO3xR3":
            return exp_map_SO3xR3(tangent)
        if self.mode == "SE3":
            return exp_map_SE3(tangent)
        raise ValueError(f"unknown camera optimizer mode {self.mode!r}")


def apply_pose_adjustment(c2w: jax.Array,
                          camera_opt_to_camera: Optional[jax.Array]):
    """c2w [R, 3, 4] composed with per-ray deltas
    (``cameras.py:696-697``)."""
    if camera_opt_to_camera is None:
        return c2w
    return multiply_poses(c2w, camera_opt_to_camera)
