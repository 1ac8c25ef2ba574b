"""Small cross-cutting helpers.

Reference: ``nerfstudio/utils/{misc,math}.py`` — ``step_check``,
``intersect_aabb`` (used by ``cameras.py:476`` for viewer crops),
``safe_normalize``, dict scaling helpers.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def step_check(step: int, step_size: int, run_at_zero: bool = False) -> bool:
    """True every ``step_size`` steps (``misc.py`` step_check)."""
    if step_size == 0:
        return False
    return (run_at_zero or step != 0) and step % step_size == 0


def intersect_aabb(origins: jax.Array, directions: jax.Array,
                   aabb: jax.Array, max_bound: float = 1e10):
    """Slab-method ray/AABB intersection (``math.py`` intersect_aabb).

    origins/directions [..., 3]; aabb [6] (min xyz, max xyz) ->
    (t_min [..., 1], t_max [..., 1]); misses give t_min > t_max clamped.
    """
    inv = 1.0 / jnp.where(jnp.abs(directions) < 1e-10, 1e-10, directions)
    t0 = (aabb[:3][None] - origins) * inv
    t1 = (aabb[3:][None] - origins) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1, keepdims=True)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1, keepdims=True)
    tmin = jnp.clip(tmin, 0.0, max_bound)
    tmax = jnp.clip(tmax, 0.0, max_bound)
    return tmin, tmax


def safe_normalize(v: jax.Array, eps: float = 1e-10) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def scale_dict(d: Dict[str, jax.Array], scales: Dict[str, float]):
    """Multiply matching entries (``misc.py`` scale_dict)."""
    return {k: v * scales.get(k, 1.0) for k, v in d.items()}
