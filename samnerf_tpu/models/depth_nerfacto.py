"""Depth-supervised nerfacto.

Reference: ``nerfstudio/models/depth_nerfacto.py`` — nerfacto plus a
termination-depth supervision term (DS-NeRF or URF) read from
``batch["depth_image"]``.  Reuses SAMModel with distillation off as the
nerfacto backbone (SAMModel ⊃ NerfactoModel, ``samnerf/sam_model.py``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from samnerf_tpu.models import sam_model as nerfacto
from samnerf_tpu.ops import losses as L


@dataclasses.dataclass(frozen=True)
class DepthNerfactoConfig:
    depth_loss_mult: float = 1e-3
    depth_loss_type: str = "ds_nerf"  # or "urf"
    depth_sigma: float = 0.01
    base: nerfacto.SAMModelConfig = dataclasses.field(
        default_factory=lambda: nerfacto.SAMModelConfig(distill_sam=False))


class DepthNerfactoModel(nerfacto.SAMModel):
    """Same forward as nerfacto (feature branch off)."""


def get_loss_dict(config: DepthNerfactoConfig, outputs: Dict[str, Any],
                  batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    losses = nerfacto.get_loss_dict(config.base, outputs, batch)
    if "depth_image" in batch:
        term = batch["depth_image"]  # [R, 1]
        weights = outputs["weights_list"][-1]
        rs = outputs["ray_samples_list"][-1]
        steps = (rs.starts + rs.ends) / 2.0
        if config.depth_loss_type == "ds_nerf":
            dl = L.ds_nerf_depth_loss(weights, term, steps, rs.deltas,
                                      config.depth_sigma)
        else:
            dl = L.urban_radiance_field_depth_loss(
                weights, term, outputs["depth"], steps, config.depth_sigma)
        losses["depth_loss"] = config.depth_loss_mult * dl
    return losses
