"""Lie-group exponential maps for pose optimization.

Reference: ``nerfstudio/cameras/lie_groups.py:23-120`` — same tangent
conventions ([tx ty tz, wx wy wz] -> [R|t]) so learned pose deltas are
interchangeable.  Pure jnp; fully branch-free (jnp.where for the
small-angle series) so it jits cleanly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _skew(w: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
        jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
        jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
    ], axis=-2)


def exp_map_SO3xR3(tangent: jax.Array) -> jax.Array:
    """Exponential map of SO(3) x R^3 (``lie_groups.py:23-59``).

    tangent [..., 6] (translation first) -> [..., 3, 4].
    """
    t = tangent[..., :3]
    log_rot = tangent[..., 3:]
    nrms = jnp.sum(log_rot * log_rot, axis=-1)
    angle = jnp.sqrt(jnp.clip(nrms, 1e-4))
    fac1 = jnp.sin(angle) / angle
    fac2 = (1.0 - jnp.cos(angle)) / (angle * angle)
    skews = _skew(log_rot)
    skews_sq = skews @ skews
    rot = (fac1[..., None, None] * skews
           + fac2[..., None, None] * skews_sq
           + jnp.eye(3, dtype=tangent.dtype))
    return jnp.concatenate([rot, t[..., None]], axis=-1)


def exp_map_SE3(tangent: jax.Array) -> jax.Array:
    """Exponential map se(3) -> SE(3) (``lie_groups.py:62-120``).

    tangent [..., 6] (translation first) -> [..., 3, 4].
    """
    lin = tangent[..., :3]
    ang = tangent[..., 3:]
    theta2 = jnp.sum(ang * ang, axis=-1)
    theta = jnp.sqrt(theta2)
    near_zero = theta < 1e-2
    one = jnp.ones_like(theta)
    theta_nz = jnp.where(near_zero, one, theta)
    theta2_nz = jnp.where(near_zero, one, theta2)
    theta3_nz = theta_nz * theta2_nz

    sine = jnp.sin(theta)
    cosine = jnp.where(near_zero, 8.0 / (4.0 + theta2) - 1.0, jnp.cos(theta))
    sine_by_theta = jnp.where(near_zero, 0.5 * cosine + 0.5, sine / theta_nz)
    omc_by_theta2 = jnp.where(near_zero, 0.5 * sine_by_theta,
                              (1.0 - cosine) / theta2_nz)

    outer = ang[..., :, None] * ang[..., None, :]
    rot = (omc_by_theta2[..., None, None] * outer
           + cosine[..., None, None] * jnp.eye(3, dtype=tangent.dtype)
           + sine_by_theta[..., None, None] * _skew(ang))

    sbt_t = jnp.where(near_zero, 1.0 - theta2 / 6.0, sine_by_theta)
    omc_t = jnp.where(near_zero, 0.5 - theta2 / 24.0, omc_by_theta2)
    tms_t = jnp.where(near_zero, 1.0 / 6.0 - theta2 / 120.0,
                      (theta - sine) / theta3_nz)
    trans = (sbt_t[..., None] * lin
             + omc_t[..., None] * jnp.cross(ang, lin)
             + tms_t[..., None] * ang * jnp.sum(ang * lin, axis=-1,
                                                keepdims=True))
    return jnp.concatenate([rot, trans[..., None]], axis=-1)


def multiply_poses(a: jax.Array, b: jax.Array) -> jax.Array:
    """[..., 3, 4] x [..., 3, 4] -> [..., 3, 4]
    (``nerfstudio/utils/poses.py`` multiply)."""
    rot = a[..., :3, :3] @ b[..., :3, :3]
    t = a[..., :3, 3:] + a[..., :3, :3] @ b[..., :3, 3:]
    return jnp.concatenate([rot, t], axis=-1)
