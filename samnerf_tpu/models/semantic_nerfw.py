"""Semantic NeRF-W.

Reference: ``nerfstudio/models/semantic_nerfw.py`` — nerfacto backbone
plus a per-sample semantic-logit head rendered with the semantic
renderer and trained with cross-entropy; transient embedding omitted as
in the reference's default config path.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from samnerf_tpu.core.rays import RayBundle
from samnerf_tpu.fields.mlp import MLP
from samnerf_tpu.models import sam_model as nerfacto
from samnerf_tpu.ops import rendering as render_ops


@dataclasses.dataclass(frozen=True)
class SemanticNerfWConfig:
    num_classes: int = 16
    semantic_loss_weight: float = 1.0
    base: nerfacto.SAMModelConfig = dataclasses.field(
        default_factory=lambda: nerfacto.SAMModelConfig(distill_sam=False))


class SemanticNerfWModel(nn.Module):
    config: SemanticNerfWConfig

    def setup(self):
        self.backbone = nerfacto.SAMModel(self.config.base, name="backbone")
        self.semantic_head = MLP(hidden_dim=64, num_hidden_layers=1,
                                 out_dim=self.config.num_classes,
                                 name="semantic_head")

    def __call__(self, ray_bundle: RayBundle,
                 rng: Optional[jax.Array] = None,
                 train: bool = True) -> Dict[str, Any]:
        outputs = self.backbone(ray_bundle, rng=rng, train=train,
                                get_features=())
        # re-evaluate geometry features for the semantic head on the final
        # samples (reference renders semantics from the field's geo output)
        if train:
            rs = outputs["ray_samples_list"][-1]
            weights = outputs["weights_list"][-1]
        else:
            # eval path keeps no sample lists; re-render logits is skipped
            return outputs
        _, geo = self.backbone.fields.get_density(rs.positions())
        logits = self.semantic_head(geo)
        outputs["semantics"] = render_ops.render_semantics(
            logits, jax.lax.stop_gradient(weights))
        return outputs


def get_loss_dict(config: SemanticNerfWConfig, outputs: Dict[str, Any],
                  batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    losses = nerfacto.get_loss_dict(config.base, outputs, batch)
    if "semantics" in outputs and "semantics" in batch:
        logits = outputs["semantics"]
        labels = batch["semantics"].astype(jnp.int32)[..., 0]
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)
        losses["semantics_loss"] = config.semantic_loss_weight * jnp.mean(ce)
    return losses
