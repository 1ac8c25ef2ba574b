"""Depth / semantic / variable-resolution datamanager variants.

Reference: ``nerfstudio/data/datamanagers/{depth,semantic,
variable_res}_datamanager.py`` — thin subclasses that attach extra
per-pixel supervision to the sampled batch.  Same shape here: wrap
:class:`~samnerf_tpu.data.datamanager.DataManager` and extend
``next_train``'s batch dict.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from samnerf_tpu.data.datamanager import DataManager, DataManagerConfig


def _load_gray(path: Path, downscale: int, dtype) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        if downscale > 1:
            im = im.resize((im.width // downscale, im.height // downscale),
                           Image.NEAREST)
        arr = np.asarray(im)
    if arr.ndim == 3:
        arr = arr[..., 0]
    return arr.astype(dtype)


class DepthDataManager(DataManager):
    """Attaches ``batch["depth_image"]`` from ``<data>/depths/<stem>.png``
    (16-bit millimeters, ``depth_dataset.py`` convention) or ``.npy``."""

    def __init__(self, config: DataManagerConfig, seed: int = 0,
                 depth_unit_scale_factor: float = 1e-3, **kw):
        super().__init__(config, seed=seed, **kw)
        self.depth_unit_scale_factor = depth_unit_scale_factor
        self.depths: Optional[np.ndarray] = None
        depths = []
        for p in self.train_outputs.image_filenames:
            p = Path(p)
            npy = p.parent.parent / "depths" / (p.stem + ".npy")
            png = p.parent.parent / "depths" / (p.stem + ".png")
            if npy.exists():
                depths.append(np.load(npy).astype(np.float32))
            elif png.exists():
                depths.append(_load_gray(png, self.train_outputs
                                         .downscale_factor, np.float32)
                              * depth_unit_scale_factor)
            else:
                depths = []
                break
        if depths:
            self.depths = np.stack(depths)

    def next_train(self, step: int) -> Dict[str, np.ndarray]:
        batch = super().next_train(step)
        if self.depths is not None:
            idx = batch["indices"]
            batch["depth_image"] = self.depths[
                idx[:, 0], idx[:, 1], idx[:, 2]][:, None]
        return batch


class SemanticDataManager(DataManager):
    """Attaches ``batch["semantics"]`` from
    ``<data>/semantics/<stem>.png`` class-id masks."""

    def __init__(self, config: DataManagerConfig, seed: int = 0, **kw):
        super().__init__(config, seed=seed, **kw)
        self.semantics: Optional[np.ndarray] = None
        masks = []
        for p in self.train_outputs.image_filenames:
            p = Path(p)
            png = p.parent.parent / "semantics" / (p.stem + ".png")
            if not png.exists():
                masks = []
                break
            masks.append(_load_gray(png, self.train_outputs.downscale_factor,
                                    np.int32))
        if masks:
            self.semantics = np.stack(masks)

    def next_train(self, step: int) -> Dict[str, np.ndarray]:
        batch = super().next_train(step)
        if self.semantics is not None:
            idx = batch["indices"]
            batch["semantics"] = self.semantics[
                idx[:, 0], idx[:, 1], idx[:, 2]][:, None]
        return batch


class VariableResDataManager(DataManager):
    """Variable-resolution datasets (``variable_res_datamanager.py``):
    images are not stacked (ragged); per-batch sampling draws from one
    image at a time so shapes stay static inside jit."""

    def __init__(self, config: DataManagerConfig, seed: int = 0, **kw):
        super().__init__(config, seed=seed, load_images=False, **kw)
        from samnerf_tpu.data.datamanager import _load_image
        df = self.train_outputs.downscale_factor
        self.image_list = [_load_image(p, df)
                           for p in self.train_outputs.image_filenames]

    def next_train(self, step: int) -> Dict[str, np.ndarray]:
        cfg = self.config
        img_idx = int(self.rng.integers(0, len(self.image_list)))
        img = self.image_list[img_idx]
        h, w = img.shape[:2]
        ys = self.rng.integers(0, h, cfg.train_num_rays_per_batch)
        xs = self.rng.integers(0, w, cfg.train_num_rays_per_batch)
        indices = np.stack([np.full_like(ys, img_idx), ys, xs], axis=-1)
        return {"indices": indices.astype(np.int32),
                "image": img[ys, xs].astype(np.float32) / 255.0}
