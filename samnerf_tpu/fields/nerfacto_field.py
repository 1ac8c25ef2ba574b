"""The nerfacto radiance field and the proposal density field.

Reference: ``nerfstudio/fields/nerfacto_field.py`` (TCNNNerfactoField,
:66-351) and ``nerfstudio/fields/density_fields.py`` (HashMLPDensityField,
:40-128), rebuilt as flax modules over the XLA hash encoding + MLPs.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from samnerf_tpu.core.contraction import contract_to_unit
from samnerf_tpu.fields.hash_encoding import ParityHashEncoding
from samnerf_tpu.fields.mlp import MLP, trunc_exp
from samnerf_tpu.ops.encodings import sh_encoding


def _flatten_sample_major(p):
    """[..., R, S, 3] -> ([R*S, 3] in sample-major order, unflatten fn).

    The hash kernel scans table slabs per point tile and skips slabs a
    tile does not touch; tiles of *adjacent rays at the same sample
    index* are spatially tight (rays a few pixels apart, similar depth),
    while ray-major order puts a whole depth column (near plane to far)
    in every tile.  Sample-major flattening measurably cuts the scan
    cost of coherent (eval/serve) batches; for random training rays it
    is order-neutral.  MLPs downstream are pointwise, so only the
    final reshape needs undoing.
    """
    if p.ndim == 2:
        return p, lambda h: h
    r, s = p.shape[-3], p.shape[-2]

    def unflatten(h):
        return jnp.swapaxes(h.reshape(*p.shape[:-3], s, r, h.shape[-1]),
                            -2, -3)

    return jnp.swapaxes(p, -2, -3).reshape(-1, 3), unflatten


def _contract_and_select(positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Contraction + in-unit-cube selector (``nerfacto_field.py:242-252``)."""
    p = contract_to_unit(positions)
    selector = ((p > 0.0) & (p < 1.0)).all(axis=-1)
    return p * selector[..., None], selector


class NerfactoField(nn.Module):
    """Density + view-dependent color field (``nerfacto_field.py:66-351``).

    Defaults match the reference's defaults with the samnerf overrides
    applied by ``samnerf/samconfigs.py`` (use_appearance_embedding=False).
    """

    num_images: int = 1
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_levels: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    appearance_embedding_dim: int = 32
    use_appearance_embedding: bool = False
    use_average_appearance_embedding: bool = True
    compute_dtype: Any = jnp.float32
    hash_q8: bool = False
    hash_fn: str = "reference"

    def setup(self):
        self.encoding = ParityHashEncoding(
            num_levels=self.num_levels, min_res=16, max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size, features_per_level=2,
            quantize_serve=self.hash_q8, hash_fn=self.hash_fn)
        self.mlp_base = MLP(hidden_dim=self.hidden_dim,
                            num_hidden_layers=self.num_layers - 1,
                            out_dim=1 + self.geo_feat_dim,
                            compute_dtype=self.compute_dtype)
        self.mlp_head = MLP(hidden_dim=self.hidden_dim_color,
                            num_hidden_layers=self.num_layers_color - 1,
                            out_dim=3, output_activation=nn.sigmoid,
                            compute_dtype=self.compute_dtype)
        if self.use_appearance_embedding:
            self.embedding_appearance = nn.Embed(
                self.num_images, self.appearance_embedding_dim)

    def get_density(self, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """[R, S, 3] -> (density [R, S, 1], geo_feat [R, S, geo])."""
        p, selector = _contract_and_select(positions)
        flat, unflatten = _flatten_sample_major(p)
        h = unflatten(self.mlp_base(self.encoding(flat)))
        density_raw, geo = h[..., :1], h[..., 1:]
        density = trunc_exp(density_raw) * selector[..., None]
        return density, geo

    def __call__(self, positions: jax.Array, directions: jax.Array,
                 camera_indices: Optional[jax.Array] = None,
                 train: bool = True) -> dict:
        """Full field eval.

        Args:
            positions: [R, S, 3]; directions: [R, 3] unit (per ray);
            camera_indices: [R, 1] int32 (appearance embedding only).
        """
        density, geo = self.get_density(positions)
        num_samples = positions.shape[-2]
        d_enc = sh_encoding(directions)  # [R, 16]
        d_enc = jnp.broadcast_to(d_enc[..., None, :],
                                 (*positions.shape[:-1], d_enc.shape[-1]))
        h = [d_enc.reshape(-1, d_enc.shape[-1]), geo.reshape(-1, geo.shape[-1])]
        if self.use_appearance_embedding:
            if train and camera_indices is not None:
                emb = self.embedding_appearance(camera_indices[..., 0])  # [R, A]
            elif self.use_average_appearance_embedding:
                emb = jnp.broadcast_to(
                    jnp.mean(self.embedding_appearance.embedding, axis=0),
                    (positions.shape[0], self.appearance_embedding_dim))
            else:
                emb = jnp.zeros((positions.shape[0], self.appearance_embedding_dim))
            emb = jnp.broadcast_to(emb[..., None, :],
                                   (*positions.shape[:-1], emb.shape[-1]))
            h.append(emb.reshape(-1, emb.shape[-1]))
        rgb = self.mlp_head(jnp.concatenate(h, axis=-1))
        rgb = rgb.reshape(*positions.shape[:-1], 3)
        return {"density": density, "rgb": rgb}


class HashMLPDensityField(nn.Module):
    """Proposal density field (``density_fields.py:40-128``)."""

    num_layers: int = 2
    hidden_dim: int = 16
    num_levels: int = 5
    max_res: int = 128
    base_res: int = 16
    log2_hashmap_size: int = 13
    features_per_level: int = 2
    use_linear: bool = False
    compute_dtype: Any = jnp.float32
    hash_q8: bool = False
    hash_fn: str = "reference"

    @nn.compact
    def __call__(self, positions: jax.Array) -> jax.Array:
        """[R, S, 3] -> density [R, S, 1]."""
        p, selector = _contract_and_select(positions)
        flat, unflatten = _flatten_sample_major(p)
        enc = ParityHashEncoding(
            num_levels=self.num_levels, min_res=self.base_res,
            max_res=self.max_res, log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
            quantize_serve=self.hash_q8, hash_fn=self.hash_fn)(flat)
        if self.use_linear:
            raw = nn.Dense(1)(enc)
        else:
            raw = MLP(hidden_dim=self.hidden_dim,
                      num_hidden_layers=self.num_layers - 1, out_dim=1,
                      compute_dtype=self.compute_dtype)(enc)
        raw = unflatten(raw)
        return trunc_exp(raw) * selector[..., None]
