"""Instant-NGP style model: hash field + occupancy-grid culling.

Reference: ``nerfstudio/models/instant_ngp.py`` with nerfacc's
``OccupancyGrid`` + ``VolumetricSampler`` (``ray_samplers.py:372-506``).

TPU redesign (SURVEY 2f item 3): instead of packed ray marching with
dynamic sample counts, rays carry a dense [R, S] uniform ladder and the
occupancy grid multiplies density to zero in empty cells — static
shapes, same skip effect on the radiance integral.  The occupancy grid
is updated outside the jitted train step (``ops/occupancy.py``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from samnerf_tpu.core.rays import RayBundle
from samnerf_tpu.fields.nerfacto_field import NerfactoField
from samnerf_tpu.ops import rendering as render_ops
from samnerf_tpu.ops import samplers as S
from samnerf_tpu.ops.occupancy import occupancy_mask


@dataclasses.dataclass(frozen=True)
class InstantNGPConfig:
    num_samples: int = 192
    near_plane: float = 0.05
    far_plane: float = 1000.0
    grid_resolution: int = 128
    num_levels: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    aabb_scale: float = 1.0
    background_color: str = "random"  # reference default; 'black' at eval


class InstantNGPModel(nn.Module):
    config: InstantNGPConfig

    def setup(self):
        self.field = NerfactoField(
            num_levels=self.config.num_levels, max_res=self.config.max_res,
            log2_hashmap_size=self.config.log2_hashmap_size,
            use_appearance_embedding=False, name="field")

    @property
    def aabb(self) -> jnp.ndarray:
        s = self.config.aabb_scale
        return jnp.asarray([[-s, -s, -s], [s, s, s]], jnp.float32)

    def density_fn(self, positions: jax.Array) -> jax.Array:
        d, _ = self.field.get_density(positions[:, None, :])
        return d[:, 0]

    def __call__(self, ray_bundle: RayBundle,
                 rng: Optional[jax.Array] = None,
                 train: bool = True,
                 occupancy: Optional[jax.Array] = None) -> Dict[str, Any]:
        cfg = self.config
        rb = ray_bundle.with_near_far(cfg.near_plane, cfg.far_plane)
        samples = S.initial_samples(rng, rb, cfg.num_samples,
                                    stratified=train)
        positions = samples.positions()
        out = self.field(positions, samples.directions,
                         samples.camera_indices, train)
        d = out["density"]
        if occupancy is not None:
            d = d * occupancy_mask(occupancy, positions, self.aabb)
        weights = samples.get_weights(d)
        # the reference trains with a per-ray RANDOM background
        # (RGBRenderer 'random', instant_ngp.py:131): relying on the
        # background to explain sky pixels is punished, so the field
        # must carry far content as density — which is what makes the
        # black-background eval render correctly.  'last_sample' here
        # (the old behavior) let the model skip that and collapsed eval
        # PSNR on any scene with a non-black sky.
        if cfg.background_color == "random":
            if train and rng is not None:
                bg_rgb = jax.random.uniform(
                    jax.random.fold_in(rng, 7),
                    (weights.shape[0], 3))
                rgb = render_ops.render_rgb(out["rgb"], weights, "explicit",
                                            bg_rgb=bg_rgb, training=train)
            else:
                rgb = render_ops.render_rgb(out["rgb"], weights, "black",
                                            training=train)
        else:
            rgb = render_ops.render_rgb(out["rgb"], weights,
                                        cfg.background_color, training=train)
        return {
            "rgb": rgb,
            "accumulation": render_ops.render_accumulation(weights),
            "depth": render_ops.render_depth_expected(weights, samples),
        }


def get_loss_dict(outputs: Dict[str, jax.Array],
                  batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    return {"rgb_loss": jnp.mean((outputs["rgb"] - batch["image"]) ** 2)}
