"""Scene colliders: set per-ray near/far before sampling.

Reference: ``nerfstudio/model_components/scene_colliders.py``
(NearFarCollider :170-188, AABBBoxCollider :47-131,
SphereCollider :134-167).  Pure jittable functions of a RayBundle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from samnerf_tpu.core.rays import RayBundle


def near_far_collider(ray_bundle: RayBundle, near: float,
                      far: float) -> RayBundle:
    """Constant near/far (``scene_colliders.py:170-188``)."""
    ones = jnp.ones_like(ray_bundle.origins[..., :1])
    return ray_bundle.replace(nears=ones * near, fars=ones * far)


def aabb_collider(ray_bundle: RayBundle, aabb: jax.Array,
                  near_plane: float = 0.0) -> RayBundle:
    """Ray/AABB slab intersection (``scene_colliders.py:47-131``).

    aabb: [2, 3] (min corner, max corner).  Rays that miss the box get
    near == far (zero-length segment -> zero weights).
    """
    d = ray_bundle.directions
    o = ray_bundle.origins
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-10, 1e-10, d)
    t0 = (aabb[0][None] - o) * inv
    t1 = (aabb[1][None] - o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1, keepdims=True)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1, keepdims=True)
    nears = jnp.maximum(tmin, near_plane)
    fars = jnp.maximum(tmax, nears + 1e-6)
    return ray_bundle.replace(nears=nears, fars=fars)


def sphere_collider(ray_bundle: RayBundle, center: jax.Array, radius: float,
                    near_plane: float = 0.0) -> RayBundle:
    """Ray/sphere intersection (``scene_colliders.py:134-167``)."""
    o = ray_bundle.origins - center[None]
    d = ray_bundle.directions
    a = jnp.sum(d * d, axis=-1, keepdims=True)
    b = 2.0 * jnp.sum(o * d, axis=-1, keepdims=True)
    c = jnp.sum(o * o, axis=-1, keepdims=True) - radius ** 2
    disc = jnp.maximum(b * b - 4 * a * c, 0.0)
    sq = jnp.sqrt(disc)
    nears = jnp.maximum((-b - sq) / (2 * a), near_plane)
    fars = jnp.maximum((-b + sq) / (2 * a), nears + 1e-6)
    return ray_bundle.replace(nears=nears, fars=fars)
