"""Device-resident training data + in-jit batch sampling.

TPU redesign of the input pipeline: the reference re-gathers pixels and
feature targets on the host every step and ships them to the GPU
(``base_datamanager.py:475-484``, ``samnerf/datamanager.py:97-117``).  Here
the whole training set (uint8 images + feature maps) lives in HBM once and
every batch is sampled *inside* the jitted train step with ``jax.random`` —
zero host->device traffic per step, which also lets the trainer fuse many
steps into one dispatch (see ``engine/trainer.py``).

Sampling semantics match the reference exactly:
- uniform pixels: ``pixel_samplers.py:47-74``;
- patch sampling: ``pixel_samplers.py:265-296`` (patch-major layout);
- SAM feature target at the patch-center pixel (``samnerf/datamanager.py:
  108-111``), nearest lookup at scaled coords (``feature_loader.py:45-52``).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def build_device_dataset(datamanager, feature_dtype=jnp.float32
                         ) -> Dict[str, jax.Array]:
    """Pack the DataManager's host arrays into device arrays."""
    data = {"images": jnp.asarray(datamanager.images)}  # [N, H, W, 3] uint8
    if datamanager.sam_loader is not None:
        data["sam_features"] = jnp.asarray(
            datamanager.sam_loader.features, dtype=feature_dtype)
    if datamanager.dino_loader is not None:
        data["dino_features"] = jnp.asarray(
            datamanager.dino_loader.features, dtype=feature_dtype)
    if datamanager.clipseg_loader is not None:
        data["clipseg_features"] = jnp.asarray(
            datamanager.clipseg_loader.features, dtype=feature_dtype)
    return data


def sample_indices(key: jax.Array, batch_size: int, num_images: int,
                   height: int, width: int, patch_size: int = 1) -> jax.Array:
    """[B, 3] int32 (img, row, col); patch-major when patch_size > 1."""
    if patch_size <= 1:
        u = jax.random.uniform(key, (batch_size, 3))
        scale = jnp.asarray([num_images, height, width], jnp.float32)
        return jnp.floor(u * scale).astype(jnp.int32)
    ps = patch_size
    sub = batch_size // (ps * ps)
    u = jax.random.uniform(key, (sub, 3))
    scale = jnp.asarray([num_images, height - ps, width - ps], jnp.float32)
    base = u * scale  # float, floored after offset add (reference order)
    base = jnp.broadcast_to(base[:, None, None, :], (sub, ps, ps, 3))
    yy, xx = jnp.meshgrid(jnp.arange(ps), jnp.arange(ps), indexing="ij")
    offs = jnp.stack([jnp.zeros_like(yy), yy, xx], -1).astype(jnp.float32)
    return jnp.floor(base + offs).astype(jnp.int32).reshape(-1, 3)


def lookup_features(features: jax.Array, indices: jax.Array,
                    image_hw) -> jax.Array:
    """Nearest feature lookup at scaled pixel coords
    (``feature_loader.py:45-52``).

    features: [N, fh, fw, C]; indices: [B, 3] (img, row, col).
    """
    fh, fw = features.shape[1], features.shape[2]
    r = (indices[:, 1].astype(jnp.float32) * (fh / image_hw[0])).astype(jnp.int32)
    c = (indices[:, 2].astype(jnp.float32) * (fw / image_hw[1])).astype(jnp.int32)
    return features[indices[:, 0], r, c].astype(jnp.float32)


def sample_batch(key: jax.Array, data: Dict[str, jax.Array],
                 batch_size: int, patch_size: int,
                 image_hw) -> Dict[str, jax.Array]:
    """One training batch, fully on device."""
    n, h, w = data["images"].shape[:3]
    indices = sample_indices(key, batch_size, n, h, w, patch_size)
    batch = {"indices": indices}
    pix = data["images"][indices[:, 0], indices[:, 1], indices[:, 2]]
    batch["image"] = pix.astype(jnp.float32) / 255.0
    if "sam_features" in data:
        ps = patch_size
        if ps > 1:
            centers = indices.reshape(-1, ps, ps, 3)[:, ps // 2, ps // 2, :]
        else:
            centers = indices
        batch["sam"] = lookup_features(data["sam_features"], centers, image_hw)
    if "dino_features" in data:
        batch["dino"] = lookup_features(data["dino_features"], indices, image_hw)
    if "clipseg_features" in data:
        batch["clipseg"] = lookup_features(data["clipseg_features"], indices,
                                           image_hw)
    return batch
