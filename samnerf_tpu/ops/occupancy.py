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
    """Dense dilated-occupancy max-mip pyramid (pytree of arrays).

    Built by :func:`pack_serve_occupancy`; consumed by
    :func:`occupancy_live` / :func:`tile_live_points`.  ``mips[k]`` is
    the flattened max-mip of the 27-neighborhood-DILATED cell grid at
    resolution ``res >> k`` (down to 3), so ``mips[0][cell(p)] > 0`` ==
    "any cell in the 3x3x3 neighborhood of p's cell is occupied" — a
    conservative one-cell dilation baked into the table.  ``res``
    travels in model config (static), not here, so this tuple can be a
    traced jit argument.
    """
    mips: Tuple[jax.Array, ...]


def pack_serve_occupancy(occ_cells: np.ndarray) -> ServeOccupancy:
    """[res, res, res] cell occupancy (0/1, unit-cube cells) -> dilated
    max-mip pyramid (see :class:`ServeOccupancy`)."""
    res = occ_cells.shape[0]
    occ = np.asarray(occ_cells, np.float32)
    pad27 = np.pad(occ, 1)
    dil = np.zeros_like(occ)
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                dil = np.maximum(dil, pad27[dx:dx + res, dy:dy + res,
                                            dz:dz + res])
    mips = []
    cur, r = dil, res
    while r >= 3:
        mips.append(jnp.asarray(cur.reshape(-1)))
        if r % 2 or r // 2 < 3:
            break
        r //= 2
        cur = cur.reshape(r, 2, r, 2, r, 2).max((1, 3, 5))
    return ServeOccupancy(mips=tuple(mips))


def occupancy_live(occ: ServeOccupancy, p_unit: jax.Array, res: int
                   ) -> jax.Array:
    """[N, 3] contracted-unit positions -> [N, 1] float 0/1 liveness
    (1 = any cell in the 3x3x3 neighborhood of p's cell occupied): one
    gather from the full-res dilated mip."""
    i = jnp.clip((p_unit * res).astype(jnp.int32), 0, res - 1)
    flat = (i[:, 0] * res + i[:, 1]) * res + i[:, 2]
    return jnp.take(occ.mips[0], flat)[:, None].astype(p_unit.dtype)


def tile_live_points(occ: ServeOccupancy, p_unit: jax.Array, res: int,
                     tile: int = 0) -> jax.Array:
    """Per-tile conservative liveness, broadcast per point: [N, 3]
    contracted-unit positions -> [N, 1] float 0/1.

    Each encode tile (the hash kernel's point granularity) is tested as
    one AABB against the dilated-occupancy max-mips: a tile is dead only
    if a mip level whose cells cover its AABB (span <= 2 cells/axis) has
    zeros at all 8 covering corners.  ~tile-times cheaper than the
    per-point :func:`occupancy_live` and exactly the granularity the
    kernel's dead-tile skip consumes; per-point culling inside live
    tiles is intentionally NOT applied (results there stay exact).
    """
    from samnerf_tpu.ops.hash_pallas import _pick_tile

    n = p_unit.shape[0]
    tile = tile or _pick_tile(n, 8192)
    t = n // tile
    if t * tile != n or not occ.mips:
        return occupancy_live(occ, p_unit, res)
    pts = p_unit.reshape(t, tile, 3)
    mn = pts.min(axis=1)
    mx = pts.max(axis=1)
    live = jnp.ones((t,), bool)
    covered = jnp.zeros((t,), bool)
    r = res
    for mip in occ.mips:
        lo = jnp.clip((mn * r).astype(jnp.int32), 0, r - 1)
        hi = jnp.clip((mx * r).astype(jnp.int32), 0, r - 1)
        fits = ((hi - lo) <= 1).all(axis=-1)
        v = jnp.zeros((t,), mip.dtype)
        for cx in (0, 1):
            for cy in (0, 1):
                for cz in (0, 1):
                    c = jnp.stack([jnp.where(cx, hi[:, 0], lo[:, 0]),
                                   jnp.where(cy, hi[:, 1], lo[:, 1]),
                                   jnp.where(cz, hi[:, 2], lo[:, 2])], -1)
                    flat = (c[:, 0] * r + c[:, 1]) * r + c[:, 2]
                    v = jnp.maximum(v, jnp.take(mip, flat))
        use = fits & ~covered
        live = jnp.where(use, v > 0, live)
        covered = covered | fits
        r //= 2
    # AABB larger than the coarsest mip cells: conservatively live
    out = jnp.broadcast_to(live.astype(p_unit.dtype)[:, None],
                           (t, tile)).reshape(n, 1)
    return out


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
