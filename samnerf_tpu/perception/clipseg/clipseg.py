"""CLIPDensePredT (ClipSeg) in flax: CLIP-conditioned dense prediction.

Reference: ``samnerf/clipseg/models/clipseg.py`` — CLIPDensePredT
(:397-499): extract CLIP ViT-B/16 activations at layers (3, 6, 9), reduce
768->64, FiLM-condition on the text embedding at block 0
(``film_mul(cond) * a + film_add(cond)``, :447), 3 torch
TransformerEncoderLayer blocks (:379-381), transposed-conv 16x upsample to
dense logits (:488).  Includes the **``inp_feature`` path** (:455-477) —
the distillation hook that skips the CLIP backbone and consumes
externally-provided reduced activations (fed from the rendered ClipSeg
feature field, ``samnerf/sam_model.py:487-498``).

Token tensors are [B, N, D] (the torch reference uses [N, B, D]); the
``inp_feature`` dict keeps the reference's [N, 1, 64] layout for on-disk
compatibility and is transposed at the boundary.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from samnerf_tpu.perception.clipseg.clip_model import (CLIPText, CLIPVisual,
                                                       convert_clip_state_dict)


class TorchTransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer matching ``torch.nn.TransformerEncoderLayer``
    defaults (dim_feedforward=2048, relu, eps 1e-5) used at
    ``clipseg.py:379-381``."""
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, N, D]."""
        dt = self.compute_dtype
        B, N, D = x.shape
        head = D // self.nhead
        qkv = nn.Dense(3 * D, dtype=dt, name="self_attn_in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(B, N, self.nhead, head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = (q @ k.transpose(0, 1, 3, 2)) * (head ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
        out = nn.Dense(D, dtype=dt, name="self_attn_out_proj")(out)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + out)
        y = nn.Dense(self.dim_feedforward, dtype=dt, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dense(D, dtype=dt, name="linear2")(y)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + y)


class CLIPDensePredT(nn.Module):
    """Decoder-only flax module; the (frozen) CLIP backbone is a separate
    module so the distillation path never pays for its params."""
    extract_layers: Tuple[int, ...] = (3, 6, 9)
    cond_layer: int = 0
    reduce_dim: int = 64
    n_heads: int = 4
    trans_conv_ks: int = 16
    rev_activations: bool = False
    compute_dtype: Any = jnp.float32

    def setup(self):
        depth = len(self.extract_layers)
        self.reduces = [nn.Dense(self.reduce_dim, name=f"reduces_{i}")
                        for i in range(depth)]
        self.blocks = [TorchTransformerEncoderLayer(
            self.reduce_dim, self.n_heads, compute_dtype=self.compute_dtype,
            name=f"blocks_{i}") for i in range(depth)]
        self.film_mul = nn.Dense(self.reduce_dim, name="film_mul")
        self.film_add = nn.Dense(self.reduce_dim, name="film_add")
        self.trans_conv = nn.ConvTranspose(
            1, (self.trans_conv_ks, self.trans_conv_ks),
            strides=(self.trans_conv_ks, self.trans_conv_ks),
            padding="VALID", name="trans_conv")

    def reduce_activations(self, activations: Sequence[jax.Array],
                           ) -> List[jax.Array]:
        """Per-slot reduced activations [B, N, 64] (reversed order applied,
        ``clipseg.py:439``); exactly what gets saved to
        ``clipseg_features/*.pt`` / rendered by the field."""
        acts = (list(activations)[::-1] if not self.rev_activations
                else list(activations))
        return [reduce(a) for reduce, a in zip(self.reduces, acts)]

    def decode(self, reduced_activations: Sequence[jax.Array],
               cond: jax.Array) -> jax.Array:
        """The ``inp_feature`` path core (``clipseg.py:455-477``).

        Args:
            reduced_activations: depth x [B, N+1, 64] (CLS first).
            cond: [B, 512] conditional embedding.
        Returns:
            dense logits [B, H*ks, W*ks, 1].
        """
        a = None
        for i, (ra, block) in enumerate(zip(reduced_activations, self.blocks)):
            a = ra if a is None else ra + a
            if i == self.cond_layer:
                a = self.film_mul(cond)[:, None, :] * a + \
                    self.film_add(cond)[:, None, :]
            a = block(a)
        a = a[:, 1:, :]  # drop CLS (clipseg.py:482)
        bs, n, c = a.shape
        size = int(np.sqrt(n))
        a = a.reshape(bs, size, size, c)
        return self.trans_conv(a)  # [B, size*ks, size*ks, 1]

    def __call__(self, activations: Sequence[jax.Array],
                 cond: jax.Array) -> jax.Array:
        """Full path given raw CLIP activations (depth x [B, N+1, 768])."""
        return self.decode(self.reduce_activations(activations), cond)


# --- weight conversion (rd64-uni.pth) ----------------------------------------

def _np(x):
    import torch
    if isinstance(x, torch.Tensor):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x, np.float32)


def convert_clipseg_state_dict(sd, depth: int = 3) -> dict:
    """rd64-uni.pth (decoder weights) -> flax params tree.

    The reference loads this checkpoint with ``strict=False``
    (``samnerf/sam_model.py:216-222``) on top of the frozen CLIP backbone;
    only decoder keys are used.
    """
    p = {
        "film_mul": {"kernel": _np(sd["film_mul.weight"]).T,
                     "bias": _np(sd["film_mul.bias"])},
        "film_add": {"kernel": _np(sd["film_add.weight"]).T,
                     "bias": _np(sd["film_add.bias"])},
        # torch ConvTranspose2d (in,out,kh,kw) -> flax flipped (kh,kw,in,out)
        "trans_conv": {
            "kernel": _np(sd["trans_conv.weight"]).transpose(2, 3, 0, 1)[::-1, ::-1].copy(),
            "bias": _np(sd["trans_conv.bias"])},
    }
    for i in range(depth):
        p[f"reduces_{i}"] = {"kernel": _np(sd[f"reduces.{i}.weight"]).T,
                             "bias": _np(sd[f"reduces.{i}.bias"])}
        b = f"blocks.{i}"
        p[f"blocks_{i}"] = {
            "self_attn_in_proj": {
                "kernel": _np(sd[f"{b}.self_attn.in_proj_weight"]).T,
                "bias": _np(sd[f"{b}.self_attn.in_proj_bias"])},
            "self_attn_out_proj": {
                "kernel": _np(sd[f"{b}.self_attn.out_proj.weight"]).T,
                "bias": _np(sd[f"{b}.self_attn.out_proj.bias"])},
            "linear1": {"kernel": _np(sd[f"{b}.linear1.weight"]).T,
                        "bias": _np(sd[f"{b}.linear1.bias"])},
            "linear2": {"kernel": _np(sd[f"{b}.linear2.weight"]).T,
                        "bias": _np(sd[f"{b}.linear2.bias"])},
            "norm1": {"scale": _np(sd[f"{b}.norm1.weight"]),
                      "bias": _np(sd[f"{b}.norm1.bias"])},
            "norm2": {"scale": _np(sd[f"{b}.norm2.weight"]),
                      "bias": _np(sd[f"{b}.norm2.bias"])},
        }
    return p
