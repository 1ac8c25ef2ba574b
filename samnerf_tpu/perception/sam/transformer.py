"""SAM two-way transformer in flax.

Reference: ``samnerf/segment_anything/modeling/transformer.py`` —
TwoWayTransformer (:37-106), TwoWayAttentionBlock (:109-182: token
self-attn, token->image cross-attn, MLP, image->token cross-attn),
Attention with channel downsample rate (:185-240).

Image embeddings here are NHWC [B, h, w, C] (torch reference is NCHW).
"""
from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from samnerf_tpu.perception.sam.image_encoder import MLPBlock


class Attention(nn.Module):
    """Downsampled multi-head attention (``transformer.py:185-240``).

    ``key_valid`` ([B, Nk] bool, optional) masks keys out of the softmax.
    The torch reference has no such argument because its prompt counts are
    dynamic; here prompts are padded to static buckets and the mask makes
    the padding numerically invisible (exact-parity requirement)."""
    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: jax.Array, k: jax.Array, v: jax.Array,
                 key_valid: jax.Array | None = None) -> jax.Array:
        internal = self.embedding_dim // self.downsample_rate
        head = internal // self.num_heads
        dt = self.compute_dtype

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, head).transpose(0, 2, 1, 3)

        q = split(nn.Dense(internal, dtype=dt, name="q_proj")(q))
        k = split(nn.Dense(internal, dtype=dt, name="k_proj")(k))
        v = split(nn.Dense(internal, dtype=dt, name="v_proj")(v))
        attn = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(head)
        attn = attn.astype(jnp.float32)
        if key_valid is not None:
            attn = jnp.where(key_valid[:, None, None, :], attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        out = attn @ v  # [B, H, Nq, head]
        b, h, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, internal)
        return nn.Dense(self.embedding_dim, dtype=dt, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """``transformer.py:109-182``."""
    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe, token_valid=None):
        """``token_valid`` [B, Nq] masks padded prompt tokens wherever the
        tokens act as attention KEYS (self-attn and image->token), so
        bucket padding cannot shift valid-token outputs."""
        dt = self.compute_dtype
        if self.skip_first_layer_pe:
            queries = Attention(self.embedding_dim, self.num_heads,
                                compute_dtype=dt, name="self_attn")(
                                    queries, queries, queries, token_valid)
        else:
            q = queries + query_pe
            queries = queries + Attention(self.embedding_dim, self.num_heads,
                                          compute_dtype=dt, name="self_attn")(
                                              q, q, queries, token_valid)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + Attention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate, compute_dtype=dt,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)

        queries = queries + MLPBlock(mlp_dim=self.mlp_dim,
                                     out_dim=self.embedding_dim,
                                     activation="relu",
                                     compute_dtype=dt, name="mlp")(queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + Attention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate, compute_dtype=dt,
            name="cross_attn_image_to_token")(k, q, queries, token_valid)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """``transformer.py:16-106``.  image_embedding/image_pe are NHWC."""
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embedding: jax.Array, image_pe: jax.Array,
                 point_embedding: jax.Array,
                 token_valid: jax.Array | None = None
                 ) -> Tuple[jax.Array, jax.Array]:
        bs, h, w, c = image_embedding.shape
        image_embedding = image_embedding.reshape(bs, h * w, c)
        image_pe = image_pe.reshape(image_pe.shape[0], h * w, c)

        queries, keys = point_embedding, image_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                embedding_dim=self.embedding_dim, num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                compute_dtype=self.compute_dtype,
                name=f"layers_{i}")(queries, keys, point_embedding, image_pe,
                                    token_valid)

        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + Attention(
            self.embedding_dim, self.num_heads,
            downsample_rate=self.attention_downsample_rate,
            compute_dtype=self.compute_dtype,
            name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final_attn")(queries)
        return queries, keys
