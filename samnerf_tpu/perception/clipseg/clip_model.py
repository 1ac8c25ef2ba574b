"""OpenAI CLIP ViT-B/16 (visual + text) in flax.

Reference behavior: the vendored ClipSeg fork drives CLIP through
``samnerf/clipseg/models/clipseg.py`` — ``visual_forward`` (:135-214)
re-implements the visual stack with activation extraction and rescaled
position embeddings; ``compute_conditional`` (:246-262) embeds text via
``clip.encode_text``.  Architecture facts (patch conv without bias,
QuickGELU, pre-norm resblocks, causal text mask, argmax-EOT text pooling)
follow the public CLIP model definition that ``clip.load`` provides.

Weights load from an OpenAI ``ViT-B/16`` checkpoint state_dict via
:func:`convert_clip_state_dict` (no torchvision/clip package needed).
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    """Pre-norm CLIP block: x += attn(ln_1(x)); x += mlp(ln_2(x))."""
    d_model: int
    n_head: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, attn_mask: Optional[jax.Array] = None,
                 return_aff: bool = False):
        """x: [B, N, D]."""
        dt = self.compute_dtype
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        B, N, D = y.shape
        head = D // self.n_head
        qkv = nn.Dense(3 * D, dtype=dt, name="attn_in_proj")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(B, N, self.n_head, head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = (q @ k.transpose(0, 1, 3, 2)) * (head ** -0.5)
        if attn_mask is not None:
            attn = attn + attn_mask
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
        out = nn.Dense(D, dtype=dt, name="attn_out_proj")(out)
        x = x + out
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = nn.Dense(4 * D, dtype=dt, name="mlp_c_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(D, dtype=dt, name="mlp_c_proj")(y)
        x = x + y
        if return_aff:
            return x, attn
        return x


class CLIPVisual(nn.Module):
    """CLIP VisionTransformer; forward mirrors ``clipseg.py:135-214``
    (activation extraction + bicubic-rescaled pos embed for non-224 inputs)."""
    input_resolution: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.conv1 = nn.Conv(self.width, (self.patch_size, self.patch_size),
                             strides=(self.patch_size, self.patch_size),
                             use_bias=False, dtype=self.compute_dtype)
        scale = self.width ** -0.5
        self.class_embedding = self.param(
            "class_embedding",
            lambda k: scale * jax.random.normal(k, (self.width,)))
        n_tok = (self.input_resolution // self.patch_size) ** 2 + 1
        self.positional_embedding = self.param(
            "positional_embedding",
            lambda k: scale * jax.random.normal(k, (n_tok, self.width)))
        self.ln_pre = nn.LayerNorm(epsilon=1e-5)
        self.resblocks = [ResidualAttentionBlock(
            self.width, self.heads, self.compute_dtype, name=f"resblocks_{i}")
            for i in range(self.layers)]
        self.ln_post = nn.LayerNorm(epsilon=1e-5)
        self.proj = self.param(
            "proj", lambda k: scale * jax.random.normal(
                k, (self.width, self.output_dim)))

    def rescaled_pos_emb(self, new_size: Tuple[int, int]) -> jax.Array:
        """Bicubic-resized grid pos embed (``clipseg.py:123-133``)."""
        grid = self.input_resolution // self.patch_size
        pe = self.positional_embedding[1:].reshape(grid, grid, self.width)
        pe = jax.image.resize(pe, (new_size[0], new_size[1], self.width),
                              method="bicubic")
        pe = pe.reshape(new_size[0] * new_size[1], self.width)
        return jnp.concatenate([self.positional_embedding[:1], pe], axis=0)

    def __call__(self, x: jax.Array,
                 extract_layers: Sequence[int] = ()) -> Tuple[jax.Array, List[jax.Array]]:
        """x: NHWC [B, H, W, 3] normalized.

        Returns (pooled+projected [B, output_dim], activations) where each
        activation is [B, tokens+1, width] (the reference keeps LND
        [tokens+1, B, width]; transpose at the compatibility boundary).
        """
        x = self.conv1(x)  # [B, g, g, width]
        B, gh, gw, _ = x.shape
        x = x.reshape(B, gh * gw, self.width)
        cls = jnp.broadcast_to(self.class_embedding[None, None],
                               (B, 1, self.width)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        n_standard = (self.input_resolution // self.patch_size) ** 2 + 1
        if x.shape[1] != n_standard:
            pos = self.rescaled_pos_emb((gh, gw))
        else:
            pos = self.positional_embedding
        x = x + pos[None].astype(x.dtype)
        x = self.ln_pre(x)
        activations = []
        for i, blk in enumerate(self.resblocks):
            x = blk(x)
            if i in extract_layers:
                activations.append(x)
        pooled = self.ln_post(x[:, 0, :])
        return pooled @ self.proj, activations


class CLIPText(nn.Module):
    """CLIP text encoder: token embed + causal transformer + EOT pooling."""
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    output_dim: int = 512
    compute_dtype: Any = jnp.float32

    def setup(self):
        self.token_embedding = nn.Embed(self.vocab_size, self.width)
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width))
        self.resblocks = [ResidualAttentionBlock(
            self.width, self.heads, self.compute_dtype, name=f"resblocks_{i}")
            for i in range(self.layers)]
        self.ln_final = nn.LayerNorm(epsilon=1e-5)
        self.text_projection = self.param(
            "text_projection", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.output_dim))

    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens: [B, 77] int32 -> [B, output_dim]."""
        x = self.token_embedding(tokens) + self.positional_embedding[None]
        n = self.context_length
        mask = jnp.triu(jnp.full((n, n), -jnp.inf), k=1)[None, None]
        for blk in self.resblocks:
            x = blk(x, attn_mask=mask)
        x = self.ln_final(x)
        eot = jnp.argmax(tokens, axis=-1)  # EOT token has the highest id
        pooled = x[jnp.arange(x.shape[0]), eot]
        return pooled @ self.text_projection


# --- weight conversion --------------------------------------------------------

def _np(x):
    import torch
    if isinstance(x, torch.Tensor):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, np.float32)


def _resblock(sd, prefix):
    return {
        "ln_1": {"scale": _np(sd[f"{prefix}.ln_1.weight"]),
                 "bias": _np(sd[f"{prefix}.ln_1.bias"])},
        "ln_2": {"scale": _np(sd[f"{prefix}.ln_2.weight"]),
                 "bias": _np(sd[f"{prefix}.ln_2.bias"])},
        "attn_in_proj": {"kernel": _np(sd[f"{prefix}.attn.in_proj_weight"]).T,
                         "bias": _np(sd[f"{prefix}.attn.in_proj_bias"])},
        "attn_out_proj": {"kernel": _np(sd[f"{prefix}.attn.out_proj.weight"]).T,
                          "bias": _np(sd[f"{prefix}.attn.out_proj.bias"])},
        "mlp_c_fc": {"kernel": _np(sd[f"{prefix}.mlp.c_fc.weight"]).T,
                     "bias": _np(sd[f"{prefix}.mlp.c_fc.bias"])},
        "mlp_c_proj": {"kernel": _np(sd[f"{prefix}.mlp.c_proj.weight"]).T,
                       "bias": _np(sd[f"{prefix}.mlp.c_proj.bias"])},
    }


def convert_clip_state_dict(sd) -> Tuple[dict, dict]:
    """OpenAI CLIP state_dict -> (visual params, text params)."""
    n_vis = len({k.split(".")[3] for k in sd
                 if k.startswith("visual.transformer.resblocks.")})
    vis = {
        "conv1": {"kernel": _np(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0)},
        "class_embedding": _np(sd["visual.class_embedding"]),
        "positional_embedding": _np(sd["visual.positional_embedding"]),
        "ln_pre": {"scale": _np(sd["visual.ln_pre.weight"]),
                   "bias": _np(sd["visual.ln_pre.bias"])},
        "ln_post": {"scale": _np(sd["visual.ln_post.weight"]),
                    "bias": _np(sd["visual.ln_post.bias"])},
        "proj": _np(sd["visual.proj"]),
    }
    for i in range(n_vis):
        vis[f"resblocks_{i}"] = _resblock(sd, f"visual.transformer.resblocks.{i}")

    n_txt = len({k.split(".")[2] for k in sd
                 if k.startswith("transformer.resblocks.")})
    txt = {
        "token_embedding": {"embedding": _np(sd["token_embedding.weight"])},
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": {"scale": _np(sd["ln_final.weight"]),
                     "bias": _np(sd["ln_final.bias"])},
        "text_projection": _np(sd["text_projection"]),
    }
    for i in range(n_txt):
        txt[f"resblocks_{i}"] = _resblock(sd, f"transformer.resblocks.{i}")
    return vis, txt
