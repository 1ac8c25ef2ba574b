"""Additional dataparsers: blender, instant-ngp, dnerf, minimal.

Reference: ``nerfstudio/data/dataparsers/{blender,instant_ngp,dnerf,
minimal}_dataparser.py`` — the dataparsers registered for the other
method families (``base_datamanager.py:76-94``).  Each returns the same
:class:`~samnerf_tpu.data.dataparser.DataparserOutputs` as the main
nerfstudio parser so all downstream code is shared.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from samnerf_tpu.core.cameras import Cameras
from samnerf_tpu.data.dataparser import DataparserOutputs


def _make_cameras(poses: np.ndarray, fx, fy, cx, cy, h: int, w: int,
                  times: Optional[np.ndarray] = None) -> Cameras:
    n = poses.shape[0]
    as_col = lambda v: jnp.asarray(np.broadcast_to(
        np.asarray(v, np.float32).reshape(-1, 1), (n, 1)).copy())
    return Cameras(camera_to_worlds=jnp.asarray(poses[:, :3, :4],
                                                jnp.float32),
                   fx=as_col(fx), fy=as_col(fy), cx=as_col(cx),
                   cy=as_col(cy), width=int(w), height=int(h))


@dataclasses.dataclass
class BlenderDataparserConfig:
    """``blender_dataparser.py``: NeRF-synthetic transforms_{split}.json."""
    data: Path = Path("data/blender/lego")
    scale_factor: float = 1.0
    alpha_color: str = "white"


def parse_blender_data(config: BlenderDataparserConfig,
                       split: str = "train") -> DataparserOutputs:
    data = Path(config.data)
    meta = json.loads((data / f"transforms_{split}.json").read_text())
    image_filenames: List[Path] = []
    poses = []
    for frame in meta["frames"]:
        fname = frame["file_path"].replace("./", "")
        if not fname.endswith(".png"):
            fname = fname + ".png"
        image_filenames.append(data / fname)
        poses.append(np.array(frame["transform_matrix"], np.float32))
    poses = np.stack(poses)
    # blender probes image size from the first image; fall back to 800
    try:
        from PIL import Image
        with Image.open(image_filenames[0]) as im:
            w, h = im.size
    except Exception:
        h = w = 800
    camera_angle_x = float(meta["camera_angle_x"])
    focal = 0.5 * w / np.tan(0.5 * camera_angle_x)
    poses[:, :3, 3] *= config.scale_factor
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    return DataparserOutputs(
        image_filenames=image_filenames,
        cameras=_make_cameras(poses, focal, focal, w / 2.0, h / 2.0, h, w),
        scene_box_aabb=aabb, dataparser_scale=config.scale_factor,
        dataparser_transform=np.eye(4, dtype=np.float32)[:3])


@dataclasses.dataclass
class InstantNGPDataparserConfig:
    """``instant_ngp_dataparser.py``: transforms.json with aabb_scale."""
    data: Path = Path("data/ours/posterv2")
    scene_scale: float = 0.33


def parse_instant_ngp_data(config: InstantNGPDataparserConfig,
                           split: str = "train") -> DataparserOutputs:
    data = Path(config.data)
    f = data / "transforms.json" if data.is_dir() else data
    meta = json.loads(f.read_text())
    data_dir = f.parent
    image_filenames, poses = [], []
    for frame in meta["frames"]:
        image_filenames.append(data_dir / frame["file_path"])
        poses.append(np.array(frame["transform_matrix"], np.float32))
    poses = np.stack(poses)
    # instant-ngp convention: flip y/z axes of the rotation
    poses[:, 0:3, 1:3] *= -1
    poses[:, :3, 3] *= config.scene_scale
    h = int(meta["h"])
    w = int(meta["w"])
    aabb_scale = float(meta.get("aabb_scale", 1.0))
    aabb = np.array([[-aabb_scale] * 3, [aabb_scale] * 3], np.float32) / 2.0
    return DataparserOutputs(
        image_filenames=image_filenames,
        cameras=_make_cameras(poses, meta["fl_x"], meta["fl_y"], meta["cx"],
                              meta["cy"], h, w),
        scene_box_aabb=aabb, dataparser_scale=config.scene_scale,
        dataparser_transform=np.eye(4, dtype=np.float32)[:3])


@dataclasses.dataclass
class DNeRFDataparserConfig:
    """``dnerf_dataparser.py``: blender format + per-frame ``time``."""
    data: Path = Path("data/dnerf/lego")
    scale_factor: float = 1.0


def parse_dnerf_data(config: DNeRFDataparserConfig,
                     split: str = "train"):
    data = Path(config.data)
    meta = json.loads((data / f"transforms_{split}.json").read_text())
    image_filenames, poses, times = [], [], []
    for frame in meta["frames"]:
        fname = frame["file_path"].replace("./", "")
        if not fname.endswith(".png"):
            fname = fname + ".png"
        image_filenames.append(data / fname)
        poses.append(np.array(frame["transform_matrix"], np.float32))
        times.append(float(frame.get("time", 0.0)))
    poses = np.stack(poses)
    try:
        from PIL import Image
        with Image.open(image_filenames[0]) as im:
            w, h = im.size
    except Exception:
        h = w = 800
    focal = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
    poses[:, :3, 3] *= config.scale_factor
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    out = DataparserOutputs(
        image_filenames=image_filenames,
        cameras=_make_cameras(poses, focal, focal, w / 2.0, h / 2.0, h, w),
        scene_box_aabb=aabb, dataparser_scale=config.scale_factor,
        dataparser_transform=np.eye(4, dtype=np.float32)[:3])
    return out, np.asarray(times, np.float32)


@dataclasses.dataclass
class MinimalDataparserConfig:
    """``minimal_dataparser.py``: pre-computed npz with poses/intrinsics."""
    data: Path = Path("data/minimal")


def parse_minimal_data(config: MinimalDataparserConfig,
                       split: str = "train") -> DataparserOutputs:
    d = np.load(Path(config.data) / f"{split}.npz", allow_pickle=True)
    poses = d["poses"].astype(np.float32)
    fnames = [Path(p) for p in d["image_filenames"]]
    aabb = d.get("aabb", np.array([[-1, -1, -1], [1, 1, 1]], np.float32))
    return DataparserOutputs(
        image_filenames=fnames,
        cameras=_make_cameras(poses, d["fx"], d["fy"], d["cx"], d["cy"],
                              int(d["height"]), int(d["width"])),
        scene_box_aabb=np.asarray(aabb, np.float32),
        dataparser_scale=1.0,
        dataparser_transform=np.eye(4, dtype=np.float32)[:3])


dataparser_registry = {
    "nerfstudio-data": "samnerf_tpu.data.dataparser:parse_nerfstudio_data",
    "blender-data": parse_blender_data,
    "instant-ngp-data": parse_instant_ngp_data,
    "dnerf-data": parse_dnerf_data,
    "minimal-parser": parse_minimal_data,
}
