"""Method config registry: ``samnerf_no_distill`` and ``samnerf_distill``.

Reference: ``samnerf/samconfigs.py:48-180``.  Same method names, same
hyperparameters; the tyro CLI union is replaced by
:mod:`samnerf_tpu.configs.cli` (tyro is not available in this environment).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict

from samnerf_tpu.data.datamanager import DataManagerConfig
from samnerf_tpu.data.dataparser import DataparserConfig
from samnerf_tpu.engine.optimizers import OptimizerGroupConfig
from samnerf_tpu.engine.trainer import TrainerConfig
from samnerf_tpu.models.sam_model import SAMModelConfig


@dataclasses.dataclass
class MethodConfig:
    """One full experiment preset (maps the reference's TrainerConfig tree)."""
    method_name: str
    trainer: TrainerConfig
    model: SAMModelConfig
    datamanager: DataManagerConfig
    optimizers: Dict[str, OptimizerGroupConfig]
    vis: str = "viewer"
    """Visualizer selection (reference ``experiment_config.py:72-89``):
    any of "viewer", "tensorboard", "wandb", "json" (+-combinable)."""
    websocket_port: int = 7007
    http_port: int = 7008


def _no_distill(data: Path = Path("/data/mipnerf360/room/")) -> MethodConfig:
    """``samconfigs.py:51-102``."""
    max_steps = 30000
    return MethodConfig(
        method_name="samnerf_no_distill",
        trainer=TrainerConfig(max_num_iterations=max_steps,
                              steps_per_save=2000,
                              steps_per_eval_batch=50000,
                              steps_per_eval_image=10000000),
        model=SAMModelConfig(
            distill_sam=False, use_clipseg_feature=False,
            kernel_size=3, hidden_layers=1, patch_size=1,
            sam_loss_weight=1.0,
            num_proposal_samples_per_ray=(64,),
            num_nerf_samples_per_ray=32, num_sam_samples=3,
            use_appearance_embedding=False,
            eval_num_rays_per_chunk=1 << 15,
            # same measured training levers as samnerf_distill (shared
            # NerfactoField): morton hash + coherent-sort encodes.
            hash_fn="morton", sort_points=True),
        datamanager=DataManagerConfig(
            dataparser=DataparserConfig(data=data, scale_factor=1.0,
                                        train_val_json_split=True),
            train_num_rays_per_batch=4096 * 4,
            eval_num_rays_per_batch=4096 * 4,
            patch_size=1, distill_sam=False),
        optimizers={
            "proposal_networks": OptimizerGroupConfig(
                lr=1e-2, eps=1e-15, lr_final=5e-4, max_steps=max_steps),
            "fields": OptimizerGroupConfig(
                lr=1e-2, eps=1e-15, lr_final=5e-4, max_steps=max_steps),
        })


def _distill(data: Path = Path("/data/mipnerf360/room/")) -> MethodConfig:
    """``samconfigs.py:104-164``."""
    max_steps = 10000
    return MethodConfig(
        method_name="samnerf_distill",
        trainer=TrainerConfig(max_num_iterations=max_steps,
                              steps_per_save=2000,
                              steps_per_eval_batch=5000000,
                              steps_per_eval_image=10000000),
        model=SAMModelConfig(
            distill_sam=True, use_clipseg_feature=True,
            kernel_size=3, hidden_layers=1, patch_size=4,
            sam_loss_weight=1.0,
            num_proposal_samples_per_ray=(64,),
            num_nerf_samples_per_ray=32, num_sam_samples=16,
            use_appearance_embedding=False,
            eval_num_rays_per_chunk=1 << 15,
            # measured training defaults (scripts/bench_train_throughput):
            # activations fit HBM at 16384-ray steps, so remat only
            # recomputes encodes (7.4k -> 9.2k rays/s off); morton hash
            # +22% with quality parity (docs/QUALITY_morton.md);
            # sort_points pairs the coherent point sort with the
            # touched-chunk backward on the 2^19 field/SAM pyramids
            # (encode+vjp 208->141 ms nerf, 496->378 ms SAM measured,
            # scripts/bench_sort_bwd.py; proposals stay unsorted).
            use_remat=False, hash_fn="morton", sort_points=True),
        datamanager=DataManagerConfig(
            dataparser=DataparserConfig(data=data, scale_factor=1.0,
                                        train_val_json_split=True),
            train_num_rays_per_batch=4096 * 4,
            eval_num_rays_per_batch=4096 * 4,
            patch_size=4, distill_sam=True, use_clipseg_feature=True),
        optimizers={
            "proposal_networks": OptimizerGroupConfig(
                lr=1e-2, eps=1e-15, lr_final=5e-4, max_steps=max_steps),
            "fields": OptimizerGroupConfig(
                lr=1e-2, eps=1e-15, lr_final=5e-4, max_steps=max_steps),
            "conv": OptimizerGroupConfig(
                lr=5e-4, eps=1e-15, lr_final=1e-4, max_steps=max_steps),
            "sam_field": OptimizerGroupConfig(
                lr=5e-4, eps=1e-15, lr_final=1e-4, max_steps=max_steps),
        })


def method_configs() -> Dict[str, MethodConfig]:
    return {
        "samnerf_no_distill": _no_distill(),
        "samnerf_distill": _distill(),
    }
