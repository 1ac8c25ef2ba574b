"""Checkpoint-based evaluation setup.

Reference: ``nerfstudio/utils/eval_utils.py:36-107`` (``eval_setup``: load
config.yml + latest checkpoint -> pipeline) and ``scripts/eval.py:21-60``
(ComputePSNR writing PSNR/SSIM JSON).
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def find_latest_checkpoint(ckpt_dir: Path) -> Optional[Path]:
    """``eval_utils.py:36-66``: pick the highest ``step-*`` directory."""
    ckpts = sorted(Path(ckpt_dir).glob("step-*"))
    return ckpts[-1] if ckpts else None


def _restore_json(obj, raw):
    """Recursively overlay a saved ``config.json`` subtree onto a config
    dataclass, coercing JSON values back to the field's current type.
    Fields whose current value is not JSON-representable (dtypes,
    callables) keep the preset default.  Returns the (possibly new)
    object so frozen dataclasses work too."""
    if dataclasses.is_dataclass(obj) and isinstance(raw, dict):
        updates = {}
        for f in dataclasses.fields(obj):
            if f.name not in raw:
                continue
            updates[f.name] = _restore_json(getattr(obj, f.name),
                                            raw[f.name])
        return dataclasses.replace(obj, **updates) if updates else obj
    cur = obj
    if isinstance(cur, Path):
        return Path(raw)
    if isinstance(cur, tuple):
        if raw is None:
            return cur
        # template each raw element on its POSITIONAL counterpart (extra
        # elements fall back to the last template) so heterogeneous
        # tuples — e.g. dicts with differing key sets — restore per-slot
        return tuple(
            _restore_json(cur[min(i, len(cur) - 1)], v) if cur else v
            for i, v in enumerate(raw))
    if isinstance(cur, dict):
        if not isinstance(raw, dict):
            return cur
        out = dict(cur)   # keep default keys absent from the saved file
        for k, v in raw.items():
            out[k] = _restore_json(cur[k], v) if k in cur else v
        return out
    if cur is None or isinstance(cur, (bool, int, float, str)):
        return raw
    return cur   # non-JSON leaf (dtype, callable): keep the default


def eval_setup(run_dir: Path):
    """Rebuild (trainer, config) from a run directory containing
    ``config.json`` + ``samnerf_tpu_ckpts/`` (``eval_utils.py:68-107``).

    The FULL saved config is restored over the method preset (the
    reference reloads ``config.yml`` wholesale) — a run trained with
    non-default model/datamanager settings reconstructs correctly."""
    from samnerf_tpu.configs.methods import method_configs
    from samnerf_tpu.data.datamanager import DataManager
    from samnerf_tpu.engine.trainer import Trainer

    run_dir = Path(run_dir)
    raw = json.loads((run_dir / "config.json").read_text())
    method = raw["method_name"]
    config = _restore_json(method_configs()[method], raw)
    config.trainer.output_dir = run_dir
    dm = DataManager(config.datamanager)
    model_cfg = dataclasses.replace(config.model,
                                    num_images=dm.num_train_images)
    trainer = Trainer(model_cfg, config.trainer, config.optimizers, dm)
    ckpt = find_latest_checkpoint(run_dir / "samnerf_tpu_ckpts")
    if ckpt is not None:
        trainer.load_checkpoint(ckpt)
    return trainer, config


def compute_eval_metrics(trainer, max_images: Optional[int] = None) -> dict:
    """PSNR/SSIM over the eval split (``scripts/eval.py:21-60``)."""
    import jax.numpy as jnp

    from samnerf_tpu.engine.eval_render import ImageRenderer
    from samnerf_tpu.utils.metrics import psnr, ssim

    renderer = ImageRenderer(trainer.model)
    dm = trainer.datamanager
    import jax
    cams = jax.tree.map(jnp.asarray, dm.eval_cameras)
    n = dm.eval_cameras.num_cameras
    if max_images is not None:
        n = min(n, max_images)
    psnrs, ssims = [], []
    for i in range(n):
        out = renderer.render_image(trainer.state.params, cams, i)
        gt = dm.eval_images[i].astype(np.float32) / 255.0
        psnrs.append(float(psnr(jnp.asarray(out["rgb"]), jnp.asarray(gt))))
        ssims.append(float(ssim(jnp.asarray(out["rgb"]), jnp.asarray(gt))))
    return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
            "num_images": n}
