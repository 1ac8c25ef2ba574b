"""DataManager: images + precomputed features -> per-step training batches.

Reference: ``nerfstudio/data/datamanagers/base_datamanager.py:340-526``
(VanillaDataManager) + ``samnerf/datamanager.py:22-117`` (SAMDataManager).

TPU redesign:
- all images are decoded once into a pinned host uint8 array (the
  reference's CacheDataloader keeps float tensors on GPU);
- ``next_train`` returns numpy ``indices`` + gathered rgb/feature targets;
  world-space rays are generated *inside* the jitted train step from the
  Cameras pytree (see ``core/cameras.generate_rays``), so the host->device
  transfer per step is just a few MB;
- feature maps stay in host RAM (SURVEY.md hard-parts #5).
"""
from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from samnerf_tpu.data.dataparser import (DataparserConfig, DataparserOutputs,
                                         parse_nerfstudio_data)
from samnerf_tpu.data.feature_loader import FeatureLoader, clipseg_pt_to_grid
from samnerf_tpu.data.pixel_samplers import (patch_center_indices,
                                             sample_patches, sample_uniform)


@dataclasses.dataclass
class DataManagerConfig:
    """Mirrors ``samnerf/datamanager.py:22-29`` + base config fields."""
    dataparser: DataparserConfig = dataclasses.field(default_factory=DataparserConfig)
    train_num_rays_per_batch: int = 4096 * 4
    eval_num_rays_per_batch: int = 4096 * 4
    patch_size: int = 1
    distill_sam: bool = False
    use_dino_feature: bool = False
    use_clipseg_feature: bool = False


def _load_images_batch(paths, downscale: int):
    """Decode a whole split with the native C++ thread-pool loader
    (``samnerf_tpu/native``); None -> caller falls back to per-image PIL."""
    try:
        from PIL import Image
        from samnerf_tpu.native import decode_images
    except Exception:
        return None
    resolved = []
    for path in paths:
        path = Path(path)
        if downscale > 1:
            cand = (path.parent.parent
                    / f"{path.parent.name}_{downscale}" / path.name)
            if cand.exists():
                path = cand
        resolved.append(path)
    with Image.open(resolved[0]) as im:
        w, h = im.size
    d = 1
    if downscale > 1 and "images_" not in resolved[0].parent.name:
        d = downscale
        h, w = h // d, w // d
    return decode_images(resolved, h, w, downscale=d)


def _load_image(path: Path, downscale: int) -> np.ndarray:
    """uint8 [H, W, 3]; honors nerfstudio's ``images_<d>/`` convention."""
    from PIL import Image
    path = Path(path)
    if downscale > 1:
        cand = path.parent.parent / f"{path.parent.name}_{downscale}" / path.name
        if cand.exists():
            path = cand
    img = Image.open(path)
    if img.mode in ("RGBA", "LA", "PA") or (
            img.mode == "P" and "transparency" in img.info):
        # composite over white — the reference's blender alpha_color default
        rgba = img.convert("RGBA")
        bg = Image.new("RGBA", rgba.size, (255, 255, 255, 255))
        img = Image.alpha_composite(bg, rgba).convert("RGB")
    else:
        img = img.convert("RGB")
    if downscale > 1 and "images_" not in str(path.parent.name):
        img = img.resize((img.width // downscale, img.height // downscale),
                         Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


def _family_config(cls, dp_config):
    """Build a family dataparser config carrying over every field the
    user's DataparserConfig shares by name (data, scale factors, ...) so
    auto-routing does not silently drop overrides."""
    import dataclasses as _dc
    kwargs = {f.name: getattr(dp_config, f.name)
              for f in _dc.fields(cls) if hasattr(dp_config, f.name)}
    return cls(**kwargs)


def _detect_parser(dp_config):
    """Route by on-disk format (the reference CLI's dataparser subcommand,
    ``base_datamanager.py:76-94``, made automatic): blender synthetic
    (``transforms_train.json`` with ``camera_angle_x``) and instant-ngp
    (``transforms.json`` with ``aabb_scale``) are parsed by their family
    parsers; everything else by the nerfstudio parser."""
    import json as _json

    data = Path(dp_config.data)
    tt = data / "transforms_train.json"
    if tt.exists():
        try:
            meta = _json.loads(tt.read_text())
        except Exception:
            meta = {}
        if "camera_angle_x" in meta and "fl_x" not in meta:
            from samnerf_tpu.data.dataparsers_extra import (
                BlenderDataparserConfig, parse_blender_data)

            def parse(cfg, split):
                return parse_blender_data(
                    _family_config(BlenderDataparserConfig, cfg),
                    split=split)
            return parse
    tj = data / "transforms.json"
    if tj.exists():
        try:
            meta = _json.loads(tj.read_text())
        except Exception:
            meta = {}
        if "aabb_scale" in meta and "fl_x" not in meta:
            from samnerf_tpu.data.dataparsers_extra import (
                InstantNGPDataparserConfig, parse_instant_ngp_data)

            def parse(cfg, split):
                return parse_instant_ngp_data(
                    _family_config(InstantNGPDataparserConfig, cfg),
                    split=split)
            return parse
    return parse_nerfstudio_data


class DataManager:
    def __init__(self, config: DataManagerConfig, seed: int = 0,
                 load_images: bool = True):
        self.config = config
        self.rng = np.random.default_rng(seed)
        parse = _detect_parser(config.dataparser)
        self.train_outputs: DataparserOutputs = parse(
            config.dataparser, split="train")
        self.eval_outputs: DataparserOutputs = parse(
            config.dataparser, split="test")
        self.cameras = self.train_outputs.cameras
        self.eval_cameras = self.eval_outputs.cameras

        if load_images:
            df = self.train_outputs.downscale_factor

            def load_split(fnames):
                batch = _load_images_batch(fnames, df)
                if batch is not None:
                    return batch
                return np.stack([_load_image(p, df) for p in fnames])

            self.images = load_split(self.train_outputs.image_filenames)
            self.eval_images = load_split(self.eval_outputs.image_filenames)
        else:
            self.images = None
            self.eval_images = None

        self.sam_loader = self.dino_loader = self.clipseg_loader = None
        h, w = self.cameras.height, self.cameras.width
        data_dir = Path(config.dataparser.data)
        if config.distill_sam:
            paths = [self._sibling(p, "sam_features", ".npy")
                     for p in self.train_outputs.image_filenames]
            self.sam_loader = FeatureLoader(paths, (h, w))
        if config.use_dino_feature:
            paths = [self._sibling(p, "dino_features", ".pt")
                     for p in self.train_outputs.image_filenames]
            self.dino_loader = FeatureLoader(paths, (h, w))
        if config.use_clipseg_feature:
            paths = [self._sibling(p, "clipseg_features", ".pt")
                     for p in self.train_outputs.image_filenames]
            self.clipseg_loader = FeatureLoader(paths, (h, w),
                                                get_feature=clipseg_pt_to_grid)

    @staticmethod
    def _sibling(image_path: Path, subdir: str, ext: str) -> str:
        """``<data>/<subdir>/<stem><ext>`` (``samnerf/datamanager.py:50-54``)."""
        p = Path(image_path)
        return str(p.parent.parent / subdir / (p.stem + ext))

    @property
    def num_train_images(self) -> int:
        return self.cameras.num_cameras

    def next_train(self, step: int) -> Dict[str, np.ndarray]:
        """One training batch: indices + rgb (+ sam/dino/clipseg targets).

        Reference flow: ``samnerf/datamanager.py:97-117``.
        """
        cfg = self.config
        h, w = self.cameras.height, self.cameras.width
        n = self.num_train_images
        if cfg.patch_size > 1:
            indices = sample_patches(self.rng, cfg.train_num_rays_per_batch, n,
                                     h, w, cfg.patch_size)
        else:
            indices = sample_uniform(self.rng, cfg.train_num_rays_per_batch, n,
                                     h, w)
        batch: Dict[str, np.ndarray] = {"indices": indices}
        batch["image"] = (self.images[indices[:, 0], indices[:, 1], indices[:, 2]]
                          .astype(np.float32) / 255.0)
        if self.sam_loader is not None:
            centers = patch_center_indices(indices, cfg.patch_size)
            batch["sam"] = self.sam_loader(centers)
        if self.dino_loader is not None:
            batch["dino"] = self.dino_loader(indices)
        if self.clipseg_loader is not None:
            batch["clipseg"] = self.clipseg_loader(indices)
        return batch

    def next_eval(self, step: int) -> Dict[str, np.ndarray]:
        """One eval ray batch (rgb targets only — the reference's eval path,
        ``base_pipeline.py:280-304``, also draws plain pixels; feature maps
        exist for the train split only, ``samnerf/datamanager.py:49-95``)."""
        h, w = self.eval_cameras.height, self.eval_cameras.width
        indices = sample_uniform(self.rng, self.config.eval_num_rays_per_batch,
                                 self.eval_cameras.num_cameras, h, w)
        image = (self.eval_images[indices[:, 0], indices[:, 1], indices[:, 2]]
                 .astype(np.float32) / 255.0)
        return {"indices": indices, "image": image}

    def eval_image_batch(self, image_index: int) -> Dict[str, np.ndarray]:
        h, w = self.eval_cameras.height, self.eval_cameras.width
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        coords = np.stack([yy, xx], -1).reshape(-1, 2).astype(np.int32)
        indices = np.concatenate(
            [np.full((coords.shape[0], 1), image_index, np.int32), coords], -1)
        return {"indices": indices,
                "image": self.eval_images[image_index].astype(np.float32) / 255.0}
