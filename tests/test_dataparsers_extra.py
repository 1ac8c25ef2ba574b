"""Blender / instant-ngp / dnerf / minimal dataparsers on synthetic data."""
import json

import numpy as np

from samnerf_tpu.data import dataparsers_extra as dpe


def _pose(i):
    m = np.eye(4)
    m[0, 3] = i * 0.1
    return m.tolist()


def test_blender_parser(tmp_path):
    meta = {"camera_angle_x": 0.7,
            "frames": [{"file_path": f"./train/r_{i}",
                        "transform_matrix": _pose(i)} for i in range(4)]}
    (tmp_path / "transforms_train.json").write_text(json.dumps(meta))
    out = dpe.parse_blender_data(
        dpe.BlenderDataparserConfig(data=tmp_path), "train")
    assert len(out.image_filenames) == 4
    assert out.cameras.num_cameras == 4
    focal = 0.5 * 800 / np.tan(0.35)
    np.testing.assert_allclose(np.asarray(out.cameras.fx)[0, 0], focal,
                               rtol=1e-5)


def test_instant_ngp_parser(tmp_path):
    meta = {"fl_x": 400.0, "fl_y": 410.0, "cx": 320.0, "cy": 240.0,
            "h": 480, "w": 640, "aabb_scale": 4,
            "frames": [{"file_path": f"images/{i}.png",
                        "transform_matrix": _pose(i)} for i in range(3)]}
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    out = dpe.parse_instant_ngp_data(
        dpe.InstantNGPDataparserConfig(data=tmp_path), "train")
    assert out.cameras.num_cameras == 3
    assert out.cameras.width == 640 and out.cameras.height == 480
    # y/z flip applied
    c2w = np.asarray(out.cameras.camera_to_worlds)[0]
    np.testing.assert_allclose(c2w[:3, 1], [0, -1, 0], atol=1e-6)
    assert out.scene_box_aabb[1][0] == 2.0


def test_dnerf_parser(tmp_path):
    meta = {"camera_angle_x": 0.7,
            "frames": [{"file_path": f"./train/r_{i}",
                        "transform_matrix": _pose(i),
                        "time": i / 3.0} for i in range(4)]}
    (tmp_path / "transforms_train.json").write_text(json.dumps(meta))
    out, times = dpe.parse_dnerf_data(
        dpe.DNeRFDataparserConfig(data=tmp_path), "train")
    assert times.shape == (4,)
    np.testing.assert_allclose(times[-1], 1.0)


def test_minimal_parser(tmp_path):
    poses = np.stack([np.eye(4)[:3].astype(np.float32)] * 2)
    np.savez(tmp_path / "train.npz", poses=poses,
             image_filenames=np.array(["a.png", "b.png"]),
             fx=100.0, fy=100.0, cx=32.0, cy=32.0, height=64, width=64)
    out = dpe.parse_minimal_data(
        dpe.MinimalDataparserConfig(data=tmp_path), "train")
    assert out.cameras.num_cameras == 2
    assert len(out.image_filenames) == 2


def test_registry_names():
    assert set(dpe.dataparser_registry) >= {
        "nerfstudio-data", "blender-data", "instant-ngp-data", "dnerf-data",
        "minimal-parser"}
