"""Dense occupancy grid for empty-space culling (instant-ngp style).

Reference: nerfacc's ``OccupancyGrid`` + ``ray_marching`` used by
``nerfstudio/models/instant_ngp.py:117-124`` and ``VolumetricSampler``
(``ray_samplers.py:372-506``).

TPU redesign: the GPU path *packs* surviving samples into a ragged
buffer (dynamic shapes).  Here shapes stay dense [R, S]: rays are
sampled uniformly, the grid is queried per sample, and unoccupied
samples contribute zero density — XLA-friendly, and the renderers
already ignore zero-weight samples.  The grid itself is a dense
[res^3] EMA of sampled densities thresholded into a float mask, updated
outside jit-critical sections (``update_occupancy``).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def occupancy_mask(grid: jax.Array, positions: jax.Array,
                   aabb: jax.Array) -> jax.Array:
    """Nearest-cell occupancy lookup.

    grid [res, res, res] float (0/1); positions [..., 3] world;
    aabb [2, 3] -> mask [..., 1]."""
    res = grid.shape[0]
    p = (positions - aabb[0]) / (aabb[1] - aabb[0])
    inside = ((p >= 0.0) & (p < 1.0)).all(axis=-1)
    ijk = jnp.clip((p * res).astype(jnp.int32), 0, res - 1)
    flat = (ijk[..., 0] * res + ijk[..., 1]) * res + ijk[..., 2]
    vals = jnp.take(grid.reshape(-1), flat)
    return (vals * inside)[..., None]


def update_occupancy(grid_density: jax.Array, density_fn: Callable,
                     aabb: jax.Array, rng: jax.Array,
                     num_samples: int = 262144, ema: float = 0.95,
                     threshold: float = 0.01):
    """One EMA update round (nerfacc ``every_n_step`` semantics).

    Samples random cells + random points inside them, takes the max of
    the stored EMA density and the fresh density.  Returns
    (new grid_density [res^3], occupancy mask grid [res,res,res])."""
    res = round(grid_density.shape[0] ** (1 / 3))
    k1, k2 = jax.random.split(rng)
    idx = jax.random.randint(k1, (num_samples,), 0, grid_density.shape[0])
    ijk = jnp.stack([(idx // (res * res)) % res, (idx // res) % res,
                     idx % res], axis=-1)
    jitter = jax.random.uniform(k2, (num_samples, 3))
    pos = aabb[0] + (ijk + jitter) / res * (aabb[1] - aabb[0])
    d = density_fn(pos)[..., 0]
    decayed = grid_density * ema
    updated = decayed.at[idx].max(d)
    occ = (updated > threshold).astype(jnp.float32).reshape(res, res, res)
    return updated, occ
