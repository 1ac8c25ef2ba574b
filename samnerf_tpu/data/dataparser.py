"""Nerfstudio-format dataparser: ``transforms_{train,test}.json`` /
``transforms.json`` -> Cameras + SceneBox.

Reference: ``nerfstudio/data/dataparsers/nerfstudio_dataparser.py:44-341``
including the fork's ``train_val_json_split`` mode (:70-71, 87-94, 200-211)
and ``nerfstudio/cameras/camera_utils.py:404-487``
(auto_orient_and_center_poses, method='up').

Pure numpy — runs on host before training.
"""
from __future__ import annotations

import dataclasses
import json
import math
from pathlib import Path
from typing import List, Optional

import numpy as np

from samnerf_tpu.core.cameras import Cameras

MAX_AUTO_RESOLUTION = 1600


@dataclasses.dataclass
class DataparserConfig:
    data: Path = Path("data")
    scale_factor: float = 1.0
    downscale_factor: Optional[int] = None
    scene_scale: float = 1.0
    orientation_method: str = "up"  # 'up' | 'none'
    center_poses: bool = True
    auto_scale_poses: bool = True
    train_split_fraction: float = 0.9
    train_val_json_split: bool = False


@dataclasses.dataclass
class DataparserOutputs:
    image_filenames: List[Path]
    cameras: Cameras  # numpy-backed
    scene_box_aabb: np.ndarray  # [2, 3]
    dataparser_scale: float
    dataparser_transform: np.ndarray  # [3, 4]
    downscale_factor: int = 1
    mask_filenames: Optional[List[Path]] = None


def _rotation_between(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rodrigues rotation taking a to b (``camera_utils.py:404-429``)."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if c < -1 + 1e-8:
        eps = (np.random.rand(3) - 0.5) * 0.01
        return _rotation_between(a + eps, b)
    s = np.linalg.norm(v)
    skew = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + skew + skew @ skew * ((1 - c) / (s ** 2 + 1e-8))


def auto_orient_and_center_poses(poses: np.ndarray, method: str = "up",
                                 center_poses: bool = True):
    """``camera_utils.py:432-487`` ('up' and 'none' methods)."""
    translation_all = poses[..., :3, 3]
    mean_translation = translation_all.mean(axis=0)
    translation = mean_translation if center_poses else np.zeros(3)

    if method == "up":
        up = poses[:, :3, 1].mean(axis=0)
        up = up / np.linalg.norm(up)
        rotation = _rotation_between(up, np.array([0.0, 0.0, 1.0]))
        transform = np.concatenate(
            [rotation, rotation @ -translation[:, None]], axis=-1)  # [3,4]
        oriented = transform @ poses
    elif method == "none":
        transform = np.eye(4)[:3]
        transform[:3, 3] = -translation
        oriented = transform @ poses
    else:
        raise ValueError(method)
    return oriented, transform


def parse_nerfstudio_data(config: DataparserConfig,
                          split: str = "train") -> DataparserOutputs:
    data = Path(config.data)
    if data.suffix == ".json":
        meta = json.loads(data.read_text())
        data_dir = data.parent
        num_train_images = None
    elif config.train_val_json_split:
        meta = json.loads((data / "transforms_train.json").read_text())
        meta_val = json.loads((data / "transforms_test.json").read_text())
        num_train_images = len(meta["frames"])
        meta["frames"] = list(meta["frames"]) + list(meta_val["frames"])
        data_dir = data
    else:
        meta = json.loads((data / "transforms.json").read_text())
        data_dir = data
        num_train_images = None

    fixed = {k: (k in meta) for k in ("fl_x", "fl_y", "cx", "cy", "h", "w")}
    image_filenames, poses = [], []
    fx, fy, cx, cy, hs, ws, dists = [], [], [], [], [], [], []
    distort_fixed = any(k in meta for k in ("k1", "k2", "k3", "p1", "p2"))

    def frame_dist(src):
        return np.array([float(src.get(k, 0.0)) for k in
                         ("k1", "k2", "k3", "k4", "p1", "p2")], np.float32)

    for frame in meta["frames"]:
        fp = Path(frame["file_path"])
        if not fp.is_absolute():
            fp = data_dir / fp
        image_filenames.append(fp)
        poses.append(np.array(frame["transform_matrix"], np.float32))
        if not fixed["fl_x"]:
            fx.append(float(frame["fl_x"]))
        if not fixed["fl_y"]:
            fy.append(float(frame["fl_y"]))
        if not fixed["cx"]:
            cx.append(float(frame["cx"]))
        if not fixed["cy"]:
            cy.append(float(frame["cy"]))
        if not fixed["h"]:
            hs.append(int(frame["h"]))
        if not fixed["w"]:
            ws.append(int(frame["w"]))
        if not distort_fixed:
            dists.append(frame_dist(frame))

    num_images = len(image_filenames)
    # Split selection (nerfstudio_dataparser.py:198-223).
    if not config.train_val_json_split:
        num_train = math.ceil(num_images * config.train_split_fraction)
        i_train = np.linspace(0, num_images - 1, num_train, dtype=int)
    else:
        num_train = num_train_images
        i_train = np.arange(num_train)
    i_eval = np.setdiff1d(np.arange(num_images), i_train)
    indices = i_train if split == "train" else i_eval

    poses = np.stack(poses, axis=0)  # [N, 4, 4]
    poses, transform = auto_orient_and_center_poses(
        poses, method=config.orientation_method, center_poses=config.center_poses)

    scale = 1.0
    if config.auto_scale_poses:
        scale /= float(np.max(np.abs(poses[:, :3, 3])))
    scale *= config.scale_factor
    poses[:, :3, 3] *= scale

    image_filenames = [image_filenames[i] for i in indices]
    poses = poses[indices]

    aabb = np.array([[-config.scene_scale] * 3, [config.scene_scale] * 3],
                    np.float32)

    def pick(vals, key, cast=float):
        return (np.full((len(indices),), cast(meta[key]), np.float32)
                if fixed_key(key) else np.asarray(vals, np.float32)[indices])

    def fixed_key(key):
        return {"fl_x": fixed["fl_x"], "fl_y": fixed["fl_y"],
                "cx": fixed["cx"], "cy": fixed["cy"],
                "h": fixed["h"], "w": fixed["w"]}[key]

    fx_a = pick(fx, "fl_x")
    fy_a = pick(fy, "fl_y")
    cx_a = pick(cx, "cx")
    cy_a = pick(cy, "cy")
    height = int(meta["h"]) if fixed["h"] else int(hs[indices[0]])
    width = int(meta["w"]) if fixed["w"] else int(ws[indices[0]])

    if distort_fixed:
        dist = np.tile(frame_dist(meta)[None], (len(indices), 1))
    else:
        dist = np.stack(dists, axis=0)[indices] if dists else None
    if dist is not None and not dist.any():
        dist = None  # fast path: no distortion params at all

    cameras = Cameras(
        camera_to_worlds=poses[:, :3, :4].astype(np.float32),
        fx=fx_a[:, None], fy=fy_a[:, None],
        cx=cx_a[:, None], cy=cy_a[:, None],
        width=width, height=height,
        distortion_params=dist)

    # Downscale (nerfstudio_dataparser.py:312-341): auto mode halves until
    # the long side is <= MAX_AUTO_RESOLUTION; explicit factor wins.
    df = config.downscale_factor
    if df is None:
        df = 1
        while max(height, width) / df > MAX_AUTO_RESOLUTION:
            df *= 2
    if df > 1:
        cameras = cameras.rescale_output_resolution(1.0 / df)

    return DataparserOutputs(
        image_filenames=image_filenames,
        cameras=cameras,
        scene_box_aabb=aabb,
        dataparser_scale=scale,
        dataparser_transform=transform,
        downscale_factor=df)
