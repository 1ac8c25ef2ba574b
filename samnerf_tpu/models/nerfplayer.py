"""NerfPlayer-style dynamic (temporal) NeRF.

Reference: ``nerfstudio/models/nerfplayer_nerfacto.py`` AND
``nerfplayer_ngp.py`` (the occupancy-grid variant: pass an
``occupancy`` grid like :mod:`samnerf_tpu.models.instant_ngp` — empty
cells contribute zero density, the dense-shape stand-in for nerfacc's
packed VolumetricSampler) with the in-tree CUDA temporal grid encoder (``field_components/cuda/csrc/
temporal_gridencoder.cu``, consumed by ``field_components/
temporal_grid.py``).  The TPU equivalent is
:func:`samnerf_tpu.ops.encodings.temporal_hash_encode` — the same
spatial hash with time folded in and linear interpolation over the two
nearest time steps.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from samnerf_tpu.core.contraction import contract_to_unit
from samnerf_tpu.core.rays import RayBundle
from samnerf_tpu.fields.mlp import MLP, trunc_exp
from samnerf_tpu.ops import rendering as render_ops
from samnerf_tpu.ops import samplers as S
from samnerf_tpu.ops.encodings import (hash_grid_scalings, init_hash_table,
                                       sh_encoding, temporal_hash_encode)


@dataclasses.dataclass(frozen=True)
class NerfPlayerConfig:
    num_samples: int = 96
    near_plane: float = 0.05
    far_plane: float = 1000.0
    num_levels: int = 8
    min_res: int = 16
    max_res: int = 512
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    num_time_steps: int = 16
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    background_color: str = "last_sample"


class TemporalField(nn.Module):
    cfg: NerfPlayerConfig

    @nn.compact
    def __call__(self, positions: jax.Array, directions: jax.Array,
                 times: jax.Array) -> Dict:
        c = self.cfg
        scalings = tuple(hash_grid_scalings(c.num_levels, c.min_res,
                                            c.max_res).tolist())
        table = self.param(
            "table", lambda k: init_hash_table(
                k, c.num_levels, 1 << c.log2_hashmap_size,
                c.features_per_level))
        p = contract_to_unit(positions)
        flat = p.reshape(-1, 3)
        t_flat = jnp.broadcast_to(times[..., None, :],
                                  (*positions.shape[:-1], 1)).reshape(-1)
        enc = temporal_hash_encode(table, flat, t_flat, scalings,
                                   c.log2_hashmap_size, c.num_time_steps)
        h = MLP(hidden_dim=c.hidden_dim, num_hidden_layers=1,
                out_dim=1 + c.geo_feat_dim, name="mlp_base")(enc)
        h = h.reshape(*positions.shape[:-1], -1)
        density = trunc_exp(h[..., :1])
        d_enc = sh_encoding(directions)
        d_enc = jnp.broadcast_to(d_enc[..., None, :],
                                 (*positions.shape[:-1], d_enc.shape[-1]))
        rgb = MLP(hidden_dim=c.hidden_dim, num_hidden_layers=2, out_dim=3,
                  output_activation=nn.sigmoid, name="mlp_head")(
            jnp.concatenate([d_enc.reshape(-1, d_enc.shape[-1]),
                             h.reshape(-1, h.shape[-1])[..., 1:]], axis=-1))
        return {"density": density,
                "rgb": rgb.reshape(*positions.shape[:-1], 3)}


class NerfPlayerModel(nn.Module):
    config: NerfPlayerConfig

    def setup(self):
        self.field = TemporalField(self.config, name="field")

    def density_fn(self, positions: jax.Array,
                   times: Optional[jax.Array] = None) -> jax.Array:
        """[N, 3] world positions -> [N, 1] density (at t=0 unless given);
        the occupancy-update hook (``nerfplayer_ngp.py``'s grid update via
        nerfacc ``every_n_step``)."""
        t = (times if times is not None
             else jnp.zeros((positions.shape[0], 1), positions.dtype))
        dirs = jnp.zeros_like(positions).at[..., 0].set(1.0)
        out = self.field(positions[:, None, :], dirs, t)
        return out["density"][:, 0]

    def __call__(self, ray_bundle: RayBundle,
                 rng: Optional[jax.Array] = None,
                 train: bool = True,
                 occupancy: Optional[jax.Array] = None,
                 aabb: Optional[jax.Array] = None) -> Dict[str, Any]:
        cfg = self.config
        rb = ray_bundle.with_near_far(cfg.near_plane, cfg.far_plane)
        times = rb.times if rb.times is not None else \
            jnp.zeros_like(rb.origins[..., :1])
        samples = S.initial_samples(rng, rb, cfg.num_samples,
                                    stratified=train)
        pos = samples.positions()
        out = self.field(pos, samples.directions, times)
        density = out["density"]
        if occupancy is not None:
            from samnerf_tpu.ops.occupancy import occupancy_mask
            box = (aabb if aabb is not None
                   else jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]))
            density = density * occupancy_mask(occupancy, pos, box)
        weights = samples.get_weights(density)
        return {
            "rgb": render_ops.render_rgb(out["rgb"], weights,
                                         cfg.background_color,
                                         training=train),
            "accumulation": render_ops.render_accumulation(weights),
            "depth": render_ops.render_depth_expected(weights, samples),
        }


def get_loss_dict(outputs: Dict[str, Any],
                  batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    return {"rgb_loss": jnp.mean((outputs["rgb"] - batch["image"]) ** 2)}
