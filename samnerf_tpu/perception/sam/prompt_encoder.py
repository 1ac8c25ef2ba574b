"""SAM prompt encoder in flax.

Reference: ``samnerf/segment_anything/modeling/prompt_encoder.py:16-214`` —
points/boxes/masks -> sparse [B, N, 256] + dense [B, 64, 64, 256]
embeddings; random-Fourier positional encoding (:171-214); 4 learned
point-type embeddings + not-a-point (:45-48); mask downscaling CNN
(:50-59); ``no_mask_embed`` dense default (:60, 164-166).

TPU redesign: label-driven branches (``labels == -1`` writes, :87-90)
become ``jnp.where`` selects so prompt counts can be padded to a static
max with label -1 — that is exactly the reference's own padding trick
(:81-85), which makes the whole decoder jit-static.  Dense output is NHWC.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from samnerf_tpu.perception.sam.image_encoder import LayerNorm2d


class PositionEmbeddingRandom(nn.Module):
    """Random spatial-frequency PE (``prompt_encoder.py:171-214``)."""
    num_pos_feats: int = 64
    scale: float = 1.0

    def setup(self):
        self.gaussian_matrix = self.param(
            "positional_encoding_gaussian_matrix",
            lambda key: self.scale * jax.random.normal(
                key, (2, self.num_pos_feats)))

    def _pe_encoding(self, coords: jax.Array) -> jax.Array:
        coords = 2.0 * coords - 1.0
        coords = coords @ self.gaussian_matrix
        coords = 2.0 * jnp.pi * coords
        return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)

    def __call__(self, size: Tuple[int, int]) -> jax.Array:
        """Dense grid PE -> [H, W, C] (reference returns C,H,W)."""
        h, w = size
        y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)  # [h,w,2]
        return self._pe_encoding(grid)

    def forward_with_coords(self, coords: jax.Array,
                            image_size: Tuple[int, int]) -> jax.Array:
        """coords [..., 2] in pixels (x, y) -> [..., C]."""
        scaled = jnp.stack([coords[..., 0] / image_size[1],
                            coords[..., 1] / image_size[0]], axis=-1)
        return self._pe_encoding(scaled)


class PromptEncoder(nn.Module):
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        self.point_embeddings = [
            nn.Embed(1, self.embed_dim, name=f"point_embeddings_{i}")
            for i in range(4)]
        self.not_a_point_embed = nn.Embed(1, self.embed_dim)
        self.no_mask_embed = nn.Embed(1, self.embed_dim)
        c = self.mask_in_chans
        self.mask_conv1 = nn.Conv(c // 4, (2, 2), strides=(2, 2),
                                  name="mask_downscaling_0")
        self.mask_ln1 = LayerNorm2d(c // 4, name="mask_downscaling_1")
        self.mask_conv2 = nn.Conv(c, (2, 2), strides=(2, 2),
                                  name="mask_downscaling_3")
        self.mask_ln2 = LayerNorm2d(c, name="mask_downscaling_4")
        self.mask_conv3 = nn.Conv(self.embed_dim, (1, 1),
                                  name="mask_downscaling_6")

    def get_dense_pe(self) -> jax.Array:
        """[1, H, W, C] (``prompt_encoder.py:62-71``)."""
        return self.pe_layer(self.image_embedding_size)[None]

    def _embed_points(self, points: jax.Array, labels: jax.Array,
                      pad: bool) -> jax.Array:
        """points [B, N, 2] (x, y) pixels; labels [B, N] in {-1, 0, 1}."""
        points = points + 0.5
        if pad:
            points = jnp.concatenate(
                [points, jnp.zeros((points.shape[0], 1, 2))], axis=1)
            labels = jnp.concatenate(
                [labels, -jnp.ones((labels.shape[0], 1), labels.dtype)], axis=1)
        pe = self.pe_layer.forward_with_coords(points, self.input_image_size)
        lab = labels[..., None]
        emb = jnp.where(lab == -1,
                        self.not_a_point_embed.embedding[0],
                        pe)
        emb = emb + jnp.where(lab == 0, self.point_embeddings[0].embedding[0], 0.0)
        emb = emb + jnp.where(lab == 1, self.point_embeddings[1].embedding[0], 0.0)
        return emb

    def _embed_boxes(self, boxes: jax.Array) -> jax.Array:
        """boxes [B, 4] -> [B, 2, C] (``prompt_encoder.py:93-100``)."""
        boxes = boxes + 0.5
        coords = boxes.reshape(-1, 2, 2)
        emb = self.pe_layer.forward_with_coords(coords, self.input_image_size)
        emb = emb.at[:, 0, :].add(self.point_embeddings[2].embedding[0])
        emb = emb.at[:, 1, :].add(self.point_embeddings[3].embedding[0])
        return emb

    def _embed_masks(self, masks: jax.Array) -> jax.Array:
        """masks [B, 4*eh, 4*ew, 1] NHWC -> [B, eh, ew, C]."""
        x = self.mask_conv1(masks)
        x = nn.gelu(self.mask_ln1(x), approximate=False)
        x = self.mask_conv2(x)
        x = nn.gelu(self.mask_ln2(x), approximate=False)
        return self.mask_conv3(x)

    def __call__(self, points=None, boxes=None, masks=None
                 ) -> Tuple[jax.Array, jax.Array]:
        """Returns (sparse [B, N, C], dense [B, eh, ew, C])."""
        if points is not None:
            bs = points[0].shape[0]
        elif boxes is not None:
            bs = boxes.shape[0]
        elif masks is not None:
            bs = masks.shape[0]
        else:
            bs = 1
        sparse = jnp.zeros((bs, 0, self.embed_dim))
        if points is not None:
            coords, labels = points
            emb = self._embed_points(coords, labels, pad=(boxes is None))
            sparse = jnp.concatenate([sparse, emb], axis=1)
        if boxes is not None:
            sparse = jnp.concatenate([sparse, self._embed_boxes(boxes)], axis=1)
        if masks is not None:
            dense = self._embed_masks(masks)
        else:
            eh, ew = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed.embedding[0].reshape(1, 1, 1, -1),
                (bs, eh, ew, self.embed_dim))
        return sparse, dense
