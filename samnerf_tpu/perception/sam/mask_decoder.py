"""SAM mask decoder in flax.

Reference: ``samnerf/segment_anything/modeling/mask_decoder.py`` —
iou_token + 4 mask tokens (:49-51), TwoWayTransformer, 2x
ConvTranspose upscaling to 256x256 (:53-59), per-token hypernetwork MLPs
dotted with the upscaled embedding (:139-144), IoU head (:67-69),
multimask slice logic (:101-107).  NHWC image embeddings.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from samnerf_tpu.perception.sam.image_encoder import LayerNorm2d
from samnerf_tpu.perception.sam.transformer import TwoWayTransformer


class MLP(nn.Module):
    """``mask_decoder.py:154-176``."""
    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    compute_dtype: Any = jnp.float32

    def setup(self):
        d = self.transformer_dim
        self.transformer = TwoWayTransformer(
            depth=2, embedding_dim=d, mlp_dim=2048, num_heads=8,
            compute_dtype=self.compute_dtype)
        self.num_mask_tokens = self.num_multimask_outputs + 1
        self.iou_token = nn.Embed(1, d)
        self.mask_tokens = nn.Embed(self.num_mask_tokens, d)
        # padding VALID == torch ConvTranspose2d(k=2, s=2, p=0)
        self.upscale_conv1 = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2),
                                              padding="VALID",
                                              name="output_upscaling_0")
        self.upscale_ln = LayerNorm2d(d // 4, name="output_upscaling_1")
        self.upscale_conv2 = nn.ConvTranspose(d // 8, (2, 2), strides=(2, 2),
                                              padding="VALID",
                                              name="output_upscaling_3")
        self.hyper_mlps = [MLP(d, d // 8, 3, name=f"output_hypernetworks_mlps_{i}")
                           for i in range(self.num_mask_tokens)]
        self.iou_prediction_head = MLP(self.iou_head_hidden_dim,
                                       self.num_mask_tokens,
                                       self.iou_head_depth)

    def __call__(self, image_embeddings: jax.Array, image_pe: jax.Array,
                 sparse_prompt_embeddings: jax.Array,
                 dense_prompt_embeddings: jax.Array,
                 multimask_output: bool,
                 sparse_valid: jax.Array | None = None
                 ) -> Tuple[jax.Array, jax.Array]:
        """image_embeddings [1, h, w, C]; image_pe [1, h, w, C];
        sparse [B, N, C]; dense [B, h, w, C] -> (masks [B, k, 4h, 4w],
        iou_pred [B, k]).  ``sparse_valid`` [B, N] marks which sparse
        prompt tokens are real (vs static-bucket padding)."""
        masks, iou_pred = self.predict_masks(
            image_embeddings, image_pe, sparse_prompt_embeddings,
            dense_prompt_embeddings, sparse_valid)
        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks[:, sl], iou_pred[:, sl]

    def predict_masks(self, image_embeddings, image_pe,
                      sparse_prompt_embeddings, dense_prompt_embeddings,
                      sparse_valid=None):
        """``mask_decoder.py:112-149``."""
        bs = sparse_prompt_embeddings.shape[0]
        output_tokens = jnp.concatenate(
            [self.iou_token.embedding, self.mask_tokens.embedding], axis=0)
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (bs, *output_tokens.shape))
        tokens = jnp.concatenate([output_tokens, sparse_prompt_embeddings],
                                 axis=1)
        token_valid = None
        if sparse_valid is not None:
            token_valid = jnp.concatenate(
                [jnp.ones((bs, 1 + self.num_mask_tokens), bool),
                 jnp.broadcast_to(sparse_valid,
                                  (bs, sparse_valid.shape[-1]))], axis=1)

        src = jnp.repeat(image_embeddings, bs, axis=0) + dense_prompt_embeddings
        pos_src = jnp.repeat(image_pe, bs, axis=0)
        b, h, w, c = src.shape

        hs, src = self.transformer(src, pos_src, tokens, token_valid)
        iou_token_out = hs[:, 0, :]
        mask_tokens_out = hs[:, 1:1 + self.num_mask_tokens, :]

        src = src.reshape(b, h, w, c)
        up = self.upscale_conv1(src)
        up = nn.gelu(self.upscale_ln(up), approximate=False)
        up = nn.gelu(self.upscale_conv2(up), approximate=False)  # [b,4h,4w,c/8]

        hyper_in = jnp.stack(
            [self.hyper_mlps[i](mask_tokens_out[:, i, :])
             for i in range(self.num_mask_tokens)], axis=1)  # [b, k, c/8]
        bh, uh, uw, uc = up.shape
        masks = jnp.einsum("bkc,bhwc->bkhw", hyper_in, up)
        iou_pred = self.iou_prediction_head(iou_token_out)
        return masks, iou_pred
