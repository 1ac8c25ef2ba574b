"""Sam top module: preprocess, end-to-end forward, postprocess.

Reference: ``samnerf/segment_anything/modeling/sam.py:18-174``.
All image tensors are NHWC.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from samnerf_tpu.perception.sam.image_encoder import ImageEncoderViT
from samnerf_tpu.perception.sam.mask_decoder import MaskDecoder
from samnerf_tpu.perception.sam.prompt_encoder import PromptEncoder

PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


class Sam(nn.Module):
    """mask_threshold = 0.0 (``sam.py:19``)."""
    image_encoder: ImageEncoderViT
    prompt_encoder: PromptEncoder
    mask_decoder: MaskDecoder
    mask_threshold: float = 0.0

    def preprocess(self, x: jax.Array) -> jax.Array:
        """Normalize + pad to square (``sam.py:164-174``). x: [B, h, w, 3]."""
        mean = jnp.asarray(PIXEL_MEAN)
        std = jnp.asarray(PIXEL_STD)
        x = (x - mean) / std
        size = self.image_encoder.img_size
        padh = size - x.shape[1]
        padw = size - x.shape[2]
        return jnp.pad(x, ((0, 0), (0, padh), (0, padw), (0, 0)))

    def encode_image(self, x: jax.Array) -> jax.Array:
        """Preprocessed NHWC image -> [B, 64, 64, 256]."""
        return self.image_encoder(x)

    def get_dense_pe(self) -> jax.Array:
        return self.prompt_encoder.get_dense_pe()

    def decode_masks(self, features: jax.Array, points=None, boxes=None,
                     mask_input=None, multimask_output: bool = True,
                     num_valid_points=None):
        """Prompt-encode + mask-decode (``predictor.py:254-273`` flow).

        ``num_valid_points`` (scalar or [B] int, optional): how many of the
        supplied points are real.  The remainder are static-bucket padding
        and get masked out of the decoder attention entirely, making the
        output exactly equal to the reference's dynamic-count path (which
        carries n real points + one canonical not-a-point pad token,
        ``prompt_encoder.py:81-88``)."""
        sparse, dense = self.prompt_encoder(points=points, boxes=boxes,
                                            masks=mask_input)
        sparse_valid = None
        if num_valid_points is not None and points is not None:
            nv = jnp.atleast_1d(jnp.asarray(num_valid_points))[:, None]
            n_pts = points[0].shape[1]
            pt_iota = jnp.arange(n_pts)[None, :]
            if boxes is None:
                # layout: n_pts points + 1 canonical pad; keep nv + 1
                valid = jnp.concatenate(
                    [pt_iota < nv,
                     jnp.ones((nv.shape[0], 1), bool)], axis=1)
            else:
                # layout: n_pts points + 2 box corner tokens
                valid = jnp.concatenate(
                    [pt_iota < nv, jnp.ones((nv.shape[0], 2), bool)], axis=1)
            sparse_valid = valid
        return self.mask_decoder(
            image_embeddings=features,
            image_pe=self.get_dense_pe(),
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=multimask_output,
            sparse_valid=sparse_valid)

    def __call__(self, image: jax.Array, points=None, boxes=None,
                 mask_input=None, multimask_output: bool = True):
        feats = self.encode_image(self.preprocess(image))
        return self.decode_masks(feats, points, boxes, mask_input,
                                 multimask_output)


def postprocess_masks(masks: jax.Array, input_size: Tuple[int, int],
                      original_size: Tuple[int, int],
                      img_size: int = 1024) -> jax.Array:
    """Double bilinear resize + unpad (``sam.py:133-162``).

    masks: [B, k, H, W] low-res logits (H=W=256).
    """
    b, k = masks.shape[:2]
    # antialias=False matches torch F.interpolate(..., mode="bilinear",
    # align_corners=False), which never antialiases; jax.image.resize
    # antialiases downscales by default, shifting mask boundaries.
    m = jax.image.resize(masks, (b, k, img_size, img_size), method="bilinear",
                         antialias=False)
    m = m[..., :input_size[0], :input_size[1]]
    return jax.image.resize(m, (b, k, *original_size), method="bilinear",
                            antialias=False)
