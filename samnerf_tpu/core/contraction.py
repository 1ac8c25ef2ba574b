"""MipNeRF-360 scene contraction.

Reference: ``nerfstudio/field_components/spatial_distortions.py:42-88``
(SceneContraction with order=inf, as used by all samnerf fields).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def scene_contraction(x: jax.Array, order: float = math.inf) -> jax.Array:
    """f(x) = x if ||x|| <= 1 else (2 - 1/||x||) * x/||x||.

    ``order`` is a static Python float. ``order=inf`` (L-inf norm)
    contracts space into the cube [-2, 2]^3, which is what the hash-grid
    fields want (reference docstring, ``spatial_distortions.py:53-56``).
    """
    if math.isinf(order):
        mag = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    else:
        mag = jnp.linalg.norm(x, ord=order, axis=-1, keepdims=True)
    mag = jnp.maximum(mag, 1e-12)
    return jnp.where(mag < 1.0, x, (2.0 - 1.0 / mag) * (x / mag))


def contract_to_unit(x: jax.Array) -> jax.Array:
    """Contract then map [-2, 2] -> [0, 1].

    Reference: the ``(positions + 2.0) / 4.0`` normalization applied after
    contraction in every field (``nerfstudio/fields/nerfacto_field.py:244-247``,
    ``samnerf/sam_field.py:116-118``).
    """
    return (scene_contraction(x) + 2.0) / 4.0
