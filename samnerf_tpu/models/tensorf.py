"""TensoRF model (VM decomposition).

Reference: ``nerfstudio/models/tensorf.py`` + the TensorVM encoding
(``field_components/encodings.py:422-503``): factorized density and
color grids (3 planes x 3 lines each), a small MLP color head, uniform +
PDF sampling, L1 sparsity regularization on the factors.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from samnerf_tpu.core.rays import RayBundle
from samnerf_tpu.fields.mlp import MLP
from samnerf_tpu.ops.colliders import aabb_collider
from samnerf_tpu.ops import rendering as render_ops
from samnerf_tpu.ops import samplers as S
from samnerf_tpu.ops.encodings import (nerf_frequency_encoding,
                                       tensor_vm_encode)


@dataclasses.dataclass(frozen=True)
class TensoRFConfig:
    num_uniform_samples: int = 200
    num_samples: int = 50
    near_plane: float = 0.05
    far_plane: float = 1000.0
    resolution: int = 128
    density_components: int = 16
    color_components: int = 48
    appearance_dim: int = 27
    aabb_scale: float = 1.5
    background_color: str = "white"
    l1_weight: float = 8e-5


class TensoRFField(nn.Module):
    resolution: int = 128
    density_components: int = 16
    color_components: int = 48
    appearance_dim: int = 27
    aabb_scale: float = 1.5

    def setup(self):
        r = self.resolution
        init = nn.initializers.normal(0.1)
        self.density_planes = self.param(
            "density_planes", init, (3, r, r, self.density_components))
        self.density_lines = self.param(
            "density_lines", init, (3, r, self.density_components))
        self.color_planes = self.param(
            "color_planes", init, (3, r, r, self.color_components))
        self.color_lines = self.param(
            "color_lines", init, (3, r, self.color_components))
        self.basis = nn.Dense(self.appearance_dim, use_bias=False,
                              name="basis_mat")
        self.head = MLP(hidden_dim=128, num_hidden_layers=1, out_dim=3,
                        output_activation=nn.sigmoid, name="color_head")

    def _normalize(self, positions: jax.Array):
        s = self.aabb_scale
        p = (positions + s) / (2 * s)
        sel = ((p > 0.0) & (p < 1.0)).all(axis=-1)
        return jnp.clip(p, 0.0, 1.0), sel

    def get_density(self, positions: jax.Array) -> jax.Array:
        """[R, S, 3] -> [R, S, 1]."""
        p, sel = self._normalize(positions)
        flat = p.reshape(-1, 3)
        feats = tensor_vm_encode(self.density_planes, self.density_lines,
                                 flat)
        density = jax.nn.relu(jnp.sum(feats, axis=-1))
        return (density.reshape(*positions.shape[:-1]) * sel)[..., None]

    def get_color(self, positions: jax.Array,
                  directions: jax.Array) -> jax.Array:
        p, _ = self._normalize(positions)
        flat = p.reshape(-1, 3)
        feats = self.basis(
            tensor_vm_encode(self.color_planes, self.color_lines, flat))
        d_enc = nerf_frequency_encoding(directions, 2)
        d_enc = jnp.broadcast_to(
            d_enc[..., None, :],
            (*positions.shape[:-1], d_enc.shape[-1])).reshape(
                flat.shape[0], -1)
        rgb = self.head(jnp.concatenate([feats, d_enc], axis=-1))
        return rgb.reshape(*positions.shape[:-1], 3)

    def __call__(self, positions, directions):
        return {"density": self.get_density(positions),
                "rgb": self.get_color(positions, directions)}


class TensoRFModel(nn.Module):
    config: TensoRFConfig

    def setup(self):
        self.field = TensoRFField(
            resolution=self.config.resolution,
            density_components=self.config.density_components,
            color_components=self.config.color_components,
            appearance_dim=self.config.appearance_dim,
            aabb_scale=self.config.aabb_scale, name="field")

    def __call__(self, ray_bundle: RayBundle,
                 rng: Optional[jax.Array] = None,
                 train: bool = True) -> Dict[str, Any]:
        cfg = self.config
        # the reference attaches an AABBBoxCollider (scene-box ray
        # intersection) to this model (``nerfstudio/models/tensorf.py:139-142``);
        # constant [near, far] = [0.05, 1000] with LINEAR spacing puts
        # essentially every uniform sample outside a bounded scene.
        aabb = jnp.asarray([[-cfg.aabb_scale] * 3, [cfg.aabb_scale] * 3])
        rb = aabb_collider(ray_bundle, aabb, near_plane=cfg.near_plane)
        rb = rb.replace(fars=jnp.minimum(rb.fars, cfg.far_plane))
        coarse = S.initial_samples(rng, rb, cfg.num_uniform_samples,
                                   stratified=train,
                                   spacing_fn=lambda x: x,
                                   spacing_inv=lambda x: x)
        w_c = coarse.get_weights(self.field.get_density(coarse.positions()))
        fine = S.pdf_samples(rng, rb, coarse, w_c, cfg.num_samples,
                             stratified=train, include_original=False,
                             spacing_inv=lambda x: x)
        out = self.field(fine.positions(), fine.directions)
        weights = fine.get_weights(out["density"])
        return {
            "rgb": render_ops.render_rgb(out["rgb"], weights,
                                         cfg.background_color,
                                         training=train),
            "accumulation": render_ops.render_accumulation(weights),
            "depth": render_ops.render_depth_expected(weights, fine),
        }


def get_loss_dict(config: TensoRFConfig, params, outputs: Dict[str, Any],
                  batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    losses = {"rgb_loss": jnp.mean((outputs["rgb"] - batch["image"]) ** 2)}
    if config.l1_weight > 0:
        field = params["params"]["field"]
        l1 = (jnp.abs(field["density_planes"]).mean()
              + jnp.abs(field["density_lines"]).mean())
        losses["l1_reg"] = config.l1_weight * l1
    return losses
