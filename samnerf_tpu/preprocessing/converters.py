"""Pose-format converters: polycam and record3d -> transforms.json.

Reference: ``nerfstudio/process_data/{polycam_utils,record3d_utils}.py``
(part of the ~2,650 LoC process-data suite, SURVEY 2d).  These two are
pure JSON/metadata conversions and need no external binaries; COLMAP
lives in :mod:`samnerf_tpu.preprocessing.colmap_utils`.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import List

import numpy as np


def polycam_to_json(keyframe_dir: Path, output_dir: Path,
                    min_blur_score: float = 25.0) -> int:
    """Polycam keyframes (cameras/*.json + images) -> transforms.json
    (``polycam_utils.py`` polycam_to_json)."""
    keyframe_dir = Path(keyframe_dir)
    cam_dir = keyframe_dir / "cameras"
    frames: List[dict] = []
    for cam_file in sorted(cam_dir.glob("*.json")):
        c = json.loads(cam_file.read_text())
        if c.get("blur_score", 1e9) < min_blur_score:
            continue
        # polycam stores a row-major 4x4 via t_00..t_23 keys (ARKit frame)
        m = np.array([
            [c["t_00"], c["t_01"], c["t_02"], c["t_03"]],
            [c["t_10"], c["t_11"], c["t_12"], c["t_13"]],
            [c["t_20"], c["t_21"], c["t_22"], c["t_23"]],
            [0.0, 0.0, 0.0, 1.0]])
        # ARKit -> nerfstudio: swap to y-up, -z forward
        m = m[np.array([1, 0, 2, 3]), :]
        m[2, :] *= -1
        frames.append({
            "file_path": f"images/{cam_file.stem}.jpg",
            "fl_x": c["fx"], "fl_y": c["fy"], "cx": c["cx"], "cy": c["cy"],
            "w": c["width"], "h": c["height"],
            "transform_matrix": m.tolist(),
        })
    out = {"camera_model": "OPENCV", "frames": frames}
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    (output_dir / "transforms.json").write_text(json.dumps(out, indent=2))
    return len(frames)


def record3d_to_json(metadata_path: Path, output_dir: Path,
                     image_dir_name: str = "rgb") -> int:
    """Record3D ``metadata.json`` (quaternion poses + K) -> transforms.json
    (``record3d_utils.py`` record3d_to_json)."""
    meta = json.loads(Path(metadata_path).read_text())
    k = np.array(meta["K"]).reshape(3, 3).T
    poses = np.array(meta["poses"])  # [N, 7]: qx qy qz qw tx ty tz
    frames = []
    for i, p in enumerate(poses):
        qx, qy, qz, qw, tx, ty, tz = p
        r = _quat_to_rot(qw, qx, qy, qz)
        m = np.eye(4)
        m[:3, :3] = r
        m[:3, 3] = [tx, ty, tz]
        frames.append({
            "file_path": f"{image_dir_name}/{i}.jpg",
            "transform_matrix": m.tolist(),
        })
    out = {
        "fl_x": float(k[0, 0]), "fl_y": float(k[1, 1]),
        "cx": float(k[0, 2]), "cy": float(k[1, 2]),
        "w": int(meta.get("w", k[0, 2] * 2)),
        "h": int(meta.get("h", k[1, 2] * 2)),
        "camera_model": "OPENCV",
        "frames": frames,
    }
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    (output_dir / "transforms.json").write_text(json.dumps(out, indent=2))
    return len(frames)


def _quat_to_rot(w, x, y, z) -> np.ndarray:
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
