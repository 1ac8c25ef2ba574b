"""SAM ViT-Det image encoder in flax (NHWC, bf16-capable).

Reference: ``samnerf/segment_anything/modeling/image_encoder.py`` —
1024^2 image -> 64x64x256 embedding.  PatchEmbed conv (:364-395), absolute
pos embed (:65-70), transformer blocks with 14x14 window attention except
the global layers (:74-86), decomposed relative position bias (:292-361),
2-conv neck with LayerNorm2d (:88-104).

TPU notes:
- everything stays NHWC; windows are batched into one [B*nw, ws^2, C]
  attention so the MXU sees large matmuls;
- the rel-pos lookup tables are gathered with *static* indices (q==k here),
  so XLA constant-folds the index math;
- compute dtype is configurable (bf16 for the big matmuls), softmax and
  LayerNorm accumulate in fp32.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC features
    (``modeling/common.py`` LayerNorm2d, eps 1e-6)."""
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        x32 = x.astype(jnp.float32)
        mu = x32.mean(axis=-1, keepdims=True)
        var = ((x32 - mu) ** 2).mean(axis=-1, keepdims=True)
        y = (x32 - mu) / jnp.sqrt(var + self.eps)
        return (y * w + b).astype(x.dtype)


class MLPBlock(nn.Module):
    """Linear -> act -> Linear (``modeling/common.py`` MLPBlock).

    Default GELU (image encoder); the two-way transformer passes ReLU
    (``modeling/transformer.py:115``).
    """
    mlp_dim: int
    out_dim: int
    activation: str = "gelu"
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.mlp_dim, dtype=self.compute_dtype, name="lin1")(x)
        x = (nn.relu(x) if self.activation == "relu"
             else nn.gelu(x, approximate=False))
        return nn.Dense(self.out_dim, dtype=self.compute_dtype, name="lin2")(x)


def get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """Select (and if needed linearly resize) rel-pos rows
    (``image_encoder.py:292-322``)."""
    max_rel_dist = int(2 * max(q_size, k_size) - 1)
    if rel_pos.shape[0] != max_rel_dist:
        # linear interpolation along the length axis (F.interpolate 'linear',
        # align_corners=False)
        L, C = rel_pos.shape
        pos = (np.arange(max_rel_dist) + 0.5) * L / max_rel_dist - 0.5
        lo = np.clip(np.floor(pos).astype(int), 0, L - 1)
        hi = np.clip(lo + 1, 0, L - 1)
        w = np.clip(pos - lo, 0.0, 1.0).astype(np.float32)
        rel_pos = (rel_pos[lo] * (1 - w[:, None]) + rel_pos[hi] * w[:, None])
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(np.int64)]  # [q, k, C]


def add_decomposed_rel_pos(attn: jax.Array, q: jax.Array, rel_pos_h: jax.Array,
                           rel_pos_w: jax.Array, q_size: Tuple[int, int],
                           k_size: Tuple[int, int]) -> jax.Array:
    """``image_encoder.py:325-361``: attn [B, qh*qw, kh*kw] += Rh + Rw."""
    q_h, q_w = q_size
    k_h, k_w = k_size
    Rh = get_rel_pos(q_h, k_h, rel_pos_h)
    Rw = get_rel_pos(q_w, k_w, rel_pos_w)
    B, _, dim = q.shape
    r_q = q.reshape(B, q_h, q_w, dim)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh.astype(q.dtype))
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw.astype(q.dtype))
    attn = attn.reshape(B, q_h, q_w, k_h, k_w)
    attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return attn.reshape(B, q_h * q_w, k_h * k_w)


def window_partition(x: jax.Array, window_size: int):
    """[B, H, W, C] -> [B*nw, ws, ws, C] (``image_encoder.py:243-264``)."""
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window_size, window_size, Wp // window_size,
                  window_size, C)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size,
                                                    window_size, C)
    return windows, (Hp, Wp)


def window_unpartition(windows: jax.Array, window_size: int, pad_hw, hw):
    """Inverse of window_partition (``image_encoder.py:267-289``)."""
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.reshape(B, Hp // window_size, Wp // window_size, window_size,
                        window_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class Attention(nn.Module):
    """MHA with optional decomposed rel-pos (``image_encoder.py:185-240``).

    Token counts >= ``flash_min_tokens`` (the 64x64 global layers) route
    through the Pallas flash kernel (``ops/attention_pallas.py``), which
    never materializes the [N, N] logits; 14x14 windows use plain XLA.
    """
    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    use_rel_pos: bool = False
    input_size: Optional[Tuple[int, int]] = None
    compute_dtype: Any = jnp.float32
    use_flash: bool = True
    flash_min_tokens: int = 1024

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, _ = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                       dtype=self.compute_dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * self.num_heads,
                                                   H * W, head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]

        rel_pos_h = rel_pos_w = None
        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * self.input_size[0] - 1, head_dim))
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * self.input_size[1] - 1, head_dim))

        n = H * W
        flash_ok = (self.use_flash and self.use_rel_pos
                    and n >= self.flash_min_tokens
                    and jax.default_backend() == "tpu"
                    and n % 512 == 0 and 512 % W == 0)
        if flash_ok:
            from samnerf_tpu.ops.attention_pallas import flash_attention_relpos
            Rh = get_rel_pos(H, H, rel_pos_h).astype(q.dtype)  # [H, H, d]
            Rw = get_rel_pos(W, W, rel_pos_w).astype(q.dtype)
            r_q = q.reshape(-1, H, W, head_dim)
            rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh).reshape(-1, n, H)
            rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw).reshape(-1, n, W)
            out = flash_attention_relpos(q, k, v, rel_h, rel_w, scale)
            x = out.reshape(B, self.num_heads, H, W, head_dim)
        else:
            attn = (q * scale) @ k.swapaxes(-2, -1)
            if self.use_rel_pos:
                attn = add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w,
                                              (H, W), (H, W))
            attn = jax.nn.softmax(attn.astype(jnp.float32),
                                  axis=-1).astype(q.dtype)
            x = (attn @ v).reshape(B, self.num_heads, H, W, head_dim)
        x = x.transpose(0, 2, 3, 1, 4).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, dtype=self.compute_dtype, name="proj")(x)


class Block(nn.Module):
    """Windowed/global transformer block (``image_encoder.py:119-182``)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_rel_pos: bool = False
    window_size: int = 0
    input_size: Optional[Tuple[int, int]] = None
    compute_dtype: Any = jnp.float32
    use_flash: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window_size > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
        x = Attention(
            dim=self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            use_rel_pos=self.use_rel_pos,
            input_size=(self.input_size if self.window_size == 0 else
                        (self.window_size, self.window_size)),
            compute_dtype=self.compute_dtype, use_flash=self.use_flash,
            name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))
        x = shortcut + x
        x = x + MLPBlock(mlp_dim=int(self.dim * self.mlp_ratio),
                         out_dim=self.dim, compute_dtype=self.compute_dtype,
                         name="mlp")(nn.LayerNorm(epsilon=1e-6, name="norm2")(x))
        return x


class ImageEncoderViT(nn.Module):
    """``image_encoder.py:17-116``. Input NHWC [B, img, img, 3] (normalized),
    output [B, 64, 64, out_chans] (NHWC; the torch reference is NCHW)."""
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    qkv_bias: bool = True
    use_abs_pos: bool = True
    use_rel_pos: bool = True
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = ()
    compute_dtype: Any = jnp.float32
    use_flash: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        grid = self.img_size // self.patch_size
        x = nn.Conv(self.embed_dim,
                    (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.compute_dtype, name="patch_embed")(x)
        if self.use_abs_pos:
            pos = self.param("pos_embed", nn.initializers.zeros,
                             (1, grid, grid, self.embed_dim))
            x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            x = Block(
                dim=self.embed_dim, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                use_rel_pos=self.use_rel_pos,
                window_size=(self.window_size
                             if i not in self.global_attn_indexes else 0),
                input_size=(grid, grid),
                compute_dtype=self.compute_dtype, use_flash=self.use_flash,
                name=f"blocks_{i}")(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False,
                    dtype=self.compute_dtype, name="neck_conv1")(x)
        x = LayerNorm2d(self.out_chans, name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                    dtype=self.compute_dtype, name="neck_conv2")(x)
        x = LayerNorm2d(self.out_chans, name="neck_ln2")(x)
        return x.astype(jnp.float32)
