"""Pixel samplers: uniform random pixels and random patches.

Reference: ``nerfstudio/data/pixel_samplers.py`` (uniform :47-74,
PatchPixelSampler :248-296).  Host-side numpy (the input pipeline); returns
``indices [B, 3] = (image, row, col)`` in the same layout the reference
feeds its RayGenerator.  Patch layout is patch-major row-major within each
patch, matching the reshape in ``samnerf/sam_model.py:260-263`` and the
patch-center feature lookup in ``samnerf/datamanager.py:108-111``.
"""
from __future__ import annotations

import numpy as np


def sample_uniform(rng: np.random.Generator, batch_size: int, num_images: int,
                   height: int, width: int) -> np.ndarray:
    """[B, 3] int32 (img, row, col)."""
    u = rng.random((batch_size, 3))
    idx = np.floor(u * np.array([num_images, height, width])).astype(np.int32)
    return idx


def sample_patches(rng: np.random.Generator, batch_size: int, num_images: int,
                   height: int, width: int, patch_size: int) -> np.ndarray:
    """[B', 3] with B' = (B // ps^2) * ps^2, patch-major
    (``pixel_samplers.py:265-296``)."""
    ps = patch_size
    sub_bs = batch_size // (ps * ps)
    base = rng.random((sub_bs, 3)) * np.array(
        [num_images, height - ps, width - ps])
    base = np.broadcast_to(base[:, None, None, :], (sub_bs, ps, ps, 3)).copy()
    yys, xxs = np.meshgrid(np.arange(ps), np.arange(ps), indexing="ij")
    base[..., 1] += yys
    base[..., 2] += xxs
    return np.floor(base).astype(np.int32).reshape(-1, 3)


def patch_center_indices(indices: np.ndarray, patch_size: int) -> np.ndarray:
    """Per-patch center pixel (``samnerf/datamanager.py:108-111``)."""
    ps = patch_size
    patches = indices.reshape(-1, ps, ps, 3)
    return patches[:, ps // 2, ps // 2, :]


def sample_equirectangular(rng: np.random.Generator, batch_size: int,
                           num_images: int, height: int,
                           width: int) -> np.ndarray:
    """Equirectangular sampling (``pixel_samplers.py:205-245``): rows drawn
    with cos-latitude weighting (inverse-CDF of sin) so poles are not
    oversampled; columns uniform."""
    imgs = rng.integers(0, num_images, batch_size)
    # phi in [0, pi] with p(phi) ∝ sin(phi): phi = acos(1 - 2u)
    u = rng.random(batch_size)
    rows = np.floor(np.arccos(1.0 - 2.0 * u) / np.pi * height).astype(np.int64)
    rows = np.clip(rows, 0, height - 1)
    cols = rng.integers(0, width, batch_size)
    return np.stack([imgs, rows, cols], axis=-1).astype(np.int32)
