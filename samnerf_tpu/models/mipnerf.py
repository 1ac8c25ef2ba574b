"""Mip-NeRF model.

Reference: ``nerfstudio/models/mipnerf.py`` — a single shared MLP
evaluated with integrated positional encoding (conical-frustum Gaussian,
mip-NeRF eq. 7), uniform 128 then PDF 128 samples (include_original).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from samnerf_tpu.core.rays import RayBundle
from samnerf_tpu.fields.mlp import MLP, trunc_exp
from samnerf_tpu.ops.colliders import aabb_collider
from samnerf_tpu.ops import rendering as render_ops
from samnerf_tpu.ops import samplers as S
from samnerf_tpu.ops.encodings import (conical_frustum_to_gaussian,
                                       integrated_pos_enc,
                                       nerf_frequency_encoding)


@dataclasses.dataclass(frozen=True)
class MipNerfConfig:
    num_coarse_samples: int = 128
    num_importance_samples: int = 128
    near_plane: float = 0.05
    aabb_scale: float = 1.5
    far_plane: float = 1000.0
    pos_frequencies: int = 16
    dir_frequencies: int = 4
    hidden_dim: int = 256
    background_color: str = "white"


class MipNerfField(nn.Module):
    pos_frequencies: int = 16
    dir_frequencies: int = 4
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, ray_samples) -> Dict:
        mean, cov = conical_frustum_to_gaussian(ray_samples)
        p_enc = integrated_pos_enc(mean, cov, self.pos_frequencies)
        d_enc = nerf_frequency_encoding(ray_samples.directions,
                                        self.dir_frequencies)
        d_enc = jnp.broadcast_to(d_enc[..., None, :],
                                 (*mean.shape[:-1], d_enc.shape[-1]))
        h = MLP(hidden_dim=self.hidden_dim, num_hidden_layers=3,
                out_dim=self.hidden_dim, output_activation=nn.relu,
                name="trunk_a")(p_enc)
        h = MLP(hidden_dim=self.hidden_dim, num_hidden_layers=3,
                out_dim=self.hidden_dim, output_activation=nn.relu,
                name="trunk_b")(jnp.concatenate([h, p_enc], axis=-1))
        density = trunc_exp(nn.Dense(1, name="density")(h))
        rgb = MLP(hidden_dim=self.hidden_dim // 2, num_hidden_layers=0,
                  out_dim=3, output_activation=nn.sigmoid, name="color")(
                      jnp.concatenate([h, d_enc], axis=-1))
        return {"density": density, "rgb": rgb}


class MipNerfModel(nn.Module):
    config: MipNerfConfig

    def setup(self):
        self.field = MipNerfField(
            pos_frequencies=self.config.pos_frequencies,
            dir_frequencies=self.config.dir_frequencies,
            hidden_dim=self.config.hidden_dim, name="field")

    def __call__(self, ray_bundle: RayBundle,
                 rng: Optional[jax.Array] = None,
                 train: bool = True) -> Dict[str, Any]:
        cfg = self.config
        # Deliberate deviation: the reference uses the base model's
        # NearFarCollider(near=2, far=6) (``nerfstudio/models/base_model.py:105-107``),
        # which assumes blender-scale scenes.  This repo auto-scales poses,
        # so an AABB-intersection collider is used instead — a constant
        # near/far window with LINEAR spacing would put most uniform
        # samples outside the rescaled scene box.
        aabb = jnp.asarray([[-cfg.aabb_scale] * 3, [cfg.aabb_scale] * 3])
        rb = aabb_collider(ray_bundle, aabb, near_plane=cfg.near_plane)
        rb = rb.replace(fars=jnp.minimum(rb.fars, cfg.far_plane))
        coarse = S.initial_samples(rng, rb, cfg.num_coarse_samples,
                                   stratified=train,
                                   spacing_fn=lambda x: x,
                                   spacing_inv=lambda x: x)
        out_c = self.field(coarse)
        w_c = coarse.get_weights(out_c["density"])
        fine = S.pdf_samples(rng, rb, coarse, w_c,
                             cfg.num_importance_samples, stratified=train,
                             include_original=True,
                             spacing_inv=lambda x: x)
        out_f = self.field(fine)
        w_f = fine.get_weights(out_f["density"])
        return {
            "rgb_coarse": render_ops.render_rgb(
                out_c["rgb"], w_c, cfg.background_color, training=train),
            "rgb_fine": render_ops.render_rgb(
                out_f["rgb"], w_f, cfg.background_color, training=train),
            "rgb": render_ops.render_rgb(
                out_f["rgb"], w_f, cfg.background_color, training=train),
            "accumulation": render_ops.render_accumulation(w_f),
            "depth": render_ops.render_depth_expected(w_f, fine),
        }


def get_loss_dict(outputs: Dict[str, jax.Array],
                  batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    img = batch["image"]
    return {
        "rgb_loss_coarse": 0.1 * jnp.mean((outputs["rgb_coarse"] - img) ** 2),
        "rgb_loss_fine": jnp.mean((outputs["rgb_fine"] - img) ** 2),
    }
