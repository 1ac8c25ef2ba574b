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


def test_phototourism_parser(tmp_path):
    # reuse the synthetic COLMAP text model
    (tmp_path / "cameras.txt").write_text(
        "1 PINHOLE 64 48 50.0 51.0 32.0 24.0\n")
    (tmp_path / "images.txt").write_text(
        "1 1 0 0 0 0.0 0.0 1.0 1 img.png\n\n2 1 0 0 0 0.0 0.0 2.0 1 i2.png\n\n")
    out = dpe.parse_phototourism_data(
        dpe.PhototourismDataparserConfig(data=tmp_path), "train")
    assert out.cameras.num_cameras == 2
    import numpy as _np
    assert _np.asarray(out.cameras.fx).shape == (2, 1)


def test_sdfstudio_parser(tmp_path):
    meta = {"height": 48, "width": 64,
            "frames": [{"rgb_path": "rgb/0.png",
                        "camtoworld": np.eye(4).tolist(),
                        "intrinsics": [[50, 0, 32, 0], [0, 50, 24, 0],
                                       [0, 0, 1, 0], [0, 0, 0, 1]]}]}
    (tmp_path / "meta_data.json").write_text(json.dumps(meta))
    out = dpe.parse_sdfstudio_data(
        dpe.SDFStudioDataparserConfig(data=tmp_path), "train")
    assert out.cameras.num_cameras == 1


def test_scannet_parser(tmp_path):
    (tmp_path / "intrinsic").mkdir()
    (tmp_path / "pose").mkdir()
    (tmp_path / "color").mkdir()
    np.savetxt(tmp_path / "intrinsic" / "intrinsic_color.txt", np.eye(4) * 500)
    for i in range(2):
        np.savetxt(tmp_path / "pose" / f"{i}.txt", np.eye(4))
    out = dpe.parse_scannet_data(
        dpe.ScanNetDataparserConfig(data=tmp_path), "train")
    assert out.cameras.num_cameras == 2


def test_sitcoms3d_parser(tmp_path):
    meta = {"frames": [{"intrinsics": [[100, 0, 64], [0, 100, 48], [0, 0, 1]],
                        "camtoworld": np.eye(4).tolist(),
                        "image_name": "f0.png"}],
            "aabb": [[-2, -2, -2], [2, 2, 2]]}
    (tmp_path / "cameras.json").write_text(json.dumps(meta))
    out = dpe.parse_sitcoms3d_data(
        dpe.Sitcoms3DDataparserConfig(data=tmp_path), "train")
    assert out.cameras.num_cameras == 1
    assert out.scene_box_aabb[1][0] == 2


def test_dycheck_parser(tmp_path):
    (tmp_path / "camera").mkdir()
    ds = {"train_ids": ["0_00000"]}
    (tmp_path / "dataset.json").write_text(json.dumps(ds))
    cam = {"orientation": np.eye(3).tolist(), "position": [0, 0, 1],
           "focal_length": 100.0, "principal_point": [32, 24],
           "image_size": [64, 48]}
    (tmp_path / "camera" / "0_00000.json").write_text(json.dumps(cam))
    out, times = dpe.parse_dycheck_data(
        dpe.DycheckDataparserConfig(data=tmp_path), "train")
    assert out.cameras.num_cameras == 1 and times.shape == (1,)


def test_full_registry():
    assert set(dpe.dataparser_registry) >= {
        "phototourism-data", "sdfstudio-data", "scannet-data",
        "arkitscenes-data", "dycheck-data", "sitcoms3d-data"}


def test_nuscenes_dataparser(tmp_path):
    """NuScenes parsed straight from the relational table JSONs (the devkit
    is only a loader for these): ego@cam pose composition, axis shuffles,
    centering + max-abs scaling, equally-spaced split
    (reference nuscenes_dataparser.py:85-218)."""
    import json

    from samnerf_tpu.data.dataparsers_extra import (
        NuScenesDataparserConfig, parse_nuscenes_data)

    root = tmp_path
    tdir = root / "v1.0-mini"
    tdir.mkdir()
    n = 10
    scenes = [{"token": "sc0", "name": "scene-0001"}]
    samples, sample_data, ego, calib = [], [], [], []
    sensor = [{"token": "se0", "channel": "CAM_FRONT", "modality": "camera"}]
    for i in range(n):
        samples.append({"token": f"s{i}", "scene_token": "sc0",
                        "timestamp": 1000 + i,
                        "data": {"CAM_FRONT": f"sd{i}"}})
        ego.append({"token": f"e{i}",
                    "rotation": [1.0, 0.0, 0.0, 0.0],
                    "translation": [float(i), 0.0, 1.5]})
        calib.append({"token": f"c{i}", "sensor_token": "se0",
                      "rotation": [0.5, -0.5, 0.5, -0.5],
                      "translation": [1.5, 0.0, 1.6],
                      "camera_intrinsic": [[1266.0, 0.0, 800.0],
                                           [0.0, 1266.0, 450.0],
                                           [0.0, 0.0, 1.0]]})
        sample_data.append({"token": f"sd{i}", "sample_token": f"s{i}",
                            "ego_pose_token": f"e{i}",
                            "calibrated_sensor_token": f"c{i}",
                            "is_key_frame": True,
                            "filename": f"samples/CAM_FRONT/img_{i}.jpg"})
    (tdir / "scene.json").write_text(json.dumps(scenes))
    (tdir / "sample.json").write_text(json.dumps(samples))
    (tdir / "sample_data.json").write_text(json.dumps(sample_data))
    (tdir / "ego_pose.json").write_text(json.dumps(ego))
    (tdir / "calibrated_sensor.json").write_text(json.dumps(calib))
    (tdir / "sensor.json").write_text(json.dumps(sensor))

    cfg = NuScenesDataparserConfig(data="scene-0001", data_dir=root,
                                   version="v1.0-mini")
    train = parse_nuscenes_data(cfg, "train")
    test = parse_nuscenes_data(cfg, "test")
    assert len(train.image_filenames) == 9 and len(test.image_filenames) == 1
    assert train.cameras.width == 1600 and train.cameras.height == 900
    # poses are centered and max-abs-scaled to <= 1
    t = np.asarray(train.cameras.camera_to_worlds)[:, :, 3]
    assert np.abs(t).max() <= 1.0 + 1e-5
    assert float(np.asarray(train.cameras.fx)[0, 0]) == 1266.0
    # rotations stay orthonormal through the axis shuffles
    R = np.asarray(train.cameras.camera_to_worlds)[0, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
