"""Pipeline layer: couples DataManager + Model behind the reference API.

Reference: ``nerfstudio/pipelines/base_pipeline.py`` (VanillaPipeline
:203-396 — ``get_train_loss_dict`` :256, ``get_eval_loss_dict`` :280,
``get_eval_image_metrics_and_images`` :306, ``get_param_groups`` :386)
and ``samnerf/sam_pipeline.py`` (eval-image path with orbit debug
rendering :54-138).

The DDP wrap the reference hides here (``base_pipeline.py:246-248``) has
no analogue: sharding is declared on the train step (``engine/trainer``)
and XLA inserts the collectives.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from samnerf_tpu.core.cameras import generate_rays
from samnerf_tpu.engine.eval_render import ImageRenderer
from samnerf_tpu.models import sam_model as sam_model_lib
from samnerf_tpu.utils.metrics import psnr, ssim


class VanillaPipeline:
    """Functional pipeline over (model, params, datamanager)."""

    def __init__(self, model, model_cfg, datamanager, get_features=()):
        self.model = model
        self.model_cfg = model_cfg
        self.datamanager = datamanager
        self.get_features = tuple(get_features)
        self._cameras = jax.tree.map(jnp.asarray, datamanager.cameras)
        self._eval_cameras = jax.tree.map(jnp.asarray,
                                          datamanager.eval_cameras)
        self.renderer = ImageRenderer(model)
        self._loss_fn = jax.jit(self._losses)
        self._eval_loss_fn = jax.jit(self._eval_losses)
        self._lpips_params = None  # lazily loaded (weight-gated)

    # --- train (base_pipeline.py:256-279) -----------------------------------
    def _losses(self, params, batch, rng):
        bundle = generate_rays(self._cameras,
                               jnp.asarray(batch["indices"][:, 0]),
                               jnp.asarray(batch["indices"][:, 1:],
                                           jnp.float32))
        outputs = self.model.apply(params, bundle, rng=rng, train=True,
                                   get_features=self.get_features)
        losses = sam_model_lib.get_loss_dict(self.model_cfg, outputs, batch)
        return losses

    def get_train_loss_dict(self, params, step: int,
                            rng: Optional[jax.Array] = None):
        batch = self.datamanager.next_train(step)
        rng = rng if rng is not None else jax.random.PRNGKey(step)
        losses = self._loss_fn(params,
                               {k: jnp.asarray(v) for k, v in batch.items()},
                               rng)
        return losses

    def _eval_losses(self, params, batch, rng):
        bundle = generate_rays(self._eval_cameras,
                               jnp.asarray(batch["indices"][:, 0]),
                               jnp.asarray(batch["indices"][:, 1:],
                                           jnp.float32))
        outputs = self.model.apply(params, bundle, rng=rng, train=False,
                                   get_features=())
        return sam_model_lib.get_loss_dict(self.model_cfg, outputs, batch)

    def get_eval_loss_dict(self, params, step: int,
                           rng: Optional[jax.Array] = None):
        """Eval ray batch drawn from the eval split (``base_pipeline.py:280-304``;
        rgb targets only — feature maps exist for the train split)."""
        if getattr(self.datamanager, "eval_images", None) is None:
            return self.get_train_loss_dict(params, step, rng)
        batch = self.datamanager.next_eval(step)
        rng = rng if rng is not None else jax.random.PRNGKey(step)
        return self._eval_loss_fn(
            params, {k: jnp.asarray(v) for k, v in batch.items()}, rng)

    # --- eval image (base_pipeline.py:306-364, sam_pipeline.py:54-138) ------
    def get_eval_image_metrics_and_images(self, params, image_index: int = 0
                                          ) -> Tuple[Dict, Dict]:
        batch = self.datamanager.eval_image_batch(image_index)
        h, w = batch["image"].shape[:2]
        out = self.renderer.render_image(params, self._eval_cameras,
                                         image_index, width=w, height=h)
        gt = jnp.asarray(batch["image"], jnp.float32)
        pred = jnp.asarray(out["rgb"])
        metrics = {
            "psnr": float(psnr(pred, gt)),
            "ssim": float(ssim(pred, gt)),
            "num_rays": h * w,
        }
        # lpips when pretrained weights are supplied (nerfacto.py:231-234;
        # zero-egress env ships none — see metrics.load_lpips_params)
        if self._lpips_params is None:
            from samnerf_tpu.utils.metrics import load_lpips_params
            self._lpips_params = load_lpips_params() or "absent"
        if self._lpips_params != "absent":
            from samnerf_tpu.utils.metrics import lpips
            metrics["lpips"] = float(lpips(pred, gt, self._lpips_params))
        images = {"img": np.concatenate([np.asarray(gt), out["rgb"]], axis=1),
                  "depth": out["depth"], "accumulation": out["accumulation"]}
        return metrics, images

    # --- param groups (base_pipeline.py:386-396) -----------------------------
    def get_param_groups(self, params) -> Dict[str, list]:
        groups: Dict[str, list] = {}
        for top_key in params.get("params", params):
            from samnerf_tpu.engine.optimizers import _group_of
            groups.setdefault(_group_of(top_key), []).append(top_key)
        return groups
