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

from typing import Callable, NamedTuple, Tuple

import numpy as np

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


# --- serve-time occupancy over the hash-kernel gather machinery ---------------
#
# The SAMModel serve path (reference view-time chunk loop,
# ``samnerf/sam_model.py:358-418``) evaluates every proposal/nerf sample
# through the full-capacity tables even in empty space.  TPU-shaped fix:
# a dense occupancy grid in CONTRACTED unit space, stored as a one-level
# *dense* parity table and looked up through the same int8 Pallas kernel
# as the field encodings (scalar-core ``jnp.take`` gathers would cost more
# than they save).  Culled samples keep static shapes: their position is
# replaced by a constant sentinel BEFORE the field encode — whole point
# tiles then touch almost no table slabs, which the v4 prefetch-gather
# kernel turns into skipped DMA + skipped scan — and their density is
# multiplied to zero, which the renderers already ignore.


class ServeOccupancy(NamedTuple):
    """int8-packed one-level dense occupancy table (pytree of 2 arrays).

    Built by :func:`pack_serve_occupancy`; consumed by
    :func:`occupancy_live`.  ``res``/``num_steps`` travel in model config
    (static), not here, so this tuple can be a traced jit argument.
    """
    packed: jax.Array     # [1, steps8*8, 128] f32-bitcast int8 lanes
    scales: jax.Array     # [1]


def occupancy_num_steps(res: int) -> int:
    """Table row-groups per parity class for a res^3 dense level: the
    next power of two holding ceil((res//2+2)^3 / 128) (the kernel's
    dense addressing masks the step index with num_steps-1, so the
    capacity must be a power of two)."""
    half = res // 2 + 2
    need = -(-half ** 3 // 128)
    return 1 << max(0, (need - 1).bit_length())


def pack_serve_occupancy(occ_cells: np.ndarray) -> ServeOccupancy:
    """[res, res, res] cell occupancy (0/1, unit-cube cells) -> int8
    parity table whose trilinear interpolation is > 0 iff ANY cell
    adjacent to any corner of the query point's cell is occupied (i.e.
    lattice values are the max over neighboring cells — a conservative
    one-cell dilation built into the table)."""
    from samnerf_tpu.ops.hash_pallas import quantize_parity_table

    res = occ_cells.shape[0]
    half = res // 2 + 2
    steps = occupancy_num_steps(res)
    occ = np.asarray(occ_cells, np.float32)
    pad = np.pad(occ, 1)
    lat = np.zeros((res + 1, res + 1, res + 1), np.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                lat = np.maximum(
                    lat, pad[dx:dx + res + 1, dy:dy + res + 1,
                             dz:dz + res + 1])
    cx, cy, cz = np.meshgrid(np.arange(res + 1), np.arange(res + 1),
                             np.arange(res + 1), indexing="ij")
    s = (cx & 1) | ((cy & 1) << 1) | ((cz & 1) << 2)
    idx = (cx >> 1) + half * ((cy >> 1) + half * (cz >> 1))
    table = np.zeros((1, steps * 8, 128, 2), np.float32)
    table[0, (idx >> 7) * 8 + s, idx & 127, 0] = lat
    table[0, (idx >> 7) * 8 + s, idx & 127, 1] = lat
    packed, scales = quantize_parity_table(jnp.asarray(table))
    return ServeOccupancy(packed=packed, scales=scales)


def occupancy_live(occ: ServeOccupancy, p_unit: jax.Array, res: int
                   ) -> jax.Array:
    """[N, 3] contracted-unit positions -> [N, 1] float 0/1 liveness
    (1 = any neighboring cell occupied).  N padded internally."""
    from samnerf_tpu.ops.hash_pallas import LANES, parity_hash_encode_q8

    n = p_unit.shape[0]
    pad = (-n) % LANES
    if pad:
        p_unit = jnp.concatenate(
            [p_unit, jnp.full((pad, 3), 0.5, p_unit.dtype)])
    out = parity_hash_encode_q8(occ.packed, occ.scales, p_unit,
                                (float(res),), occupancy_num_steps(res))
    live = (out[:, :1] > 1e-4).astype(p_unit.dtype)
    return live[:n] if pad else live


def cells_from_density(density: jax.Array, threshold: float = 0.01
                       ) -> jax.Array:
    """[res, res, res] max-pooled cell densities -> 0/1 cell mask."""
    return (density > threshold).astype(jnp.float32)


def grid_cell_positions(res: int, sub: int = 2) -> np.ndarray:
    """[res^3 * sub^3, 3] stratified query points in the unit cube
    (sub^3 fixed sub-cell offsets per cell, for max-pooled cell density).
    Row-major cell order, sub-offsets fastest."""
    c = np.arange(res, dtype=np.float32)
    cx, cy, cz = np.meshgrid(c, c, c, indexing="ij")
    cells = np.stack([cx, cy, cz], -1).reshape(-1, 1, 3)
    o = (np.arange(sub, dtype=np.float32) + 0.5) / sub
    ox, oy, oz = np.meshgrid(o, o, o, indexing="ij")
    offs = np.stack([ox, oy, oz], -1).reshape(1, -1, 3)
    return ((cells + offs) / res).reshape(-1, 3).astype(np.float32)
