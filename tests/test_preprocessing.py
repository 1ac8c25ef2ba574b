"""llff2nerf conversion test on a synthetic poses_bounds.npy."""
import json

import numpy as np

from samnerf_tpu.preprocessing.llff2nerf import (closest_point_2_lines,
                                                 convert_llff, rotmat)


def test_rotmat_aligns():
    a = np.array([0.3, -0.5, 0.8])
    r = rotmat(a, np.array([0.0, 0.0, 1.0]))
    out = r @ (a / np.linalg.norm(a))
    np.testing.assert_allclose(out, [0, 0, 1], atol=1e-6)


def test_closest_point_two_lines():
    # crossing point must lie at negative ray parameter: the reference clamps
    # ta/tb to <= 0 (cameras' +z looks away from the scene, llff2nerf.py:22-25)
    p, w = closest_point_2_lines(np.array([1.0, 0, 0]), np.array([1.0, 0, 0.0]),
                                 np.array([0, 1.0, 0]), np.array([0, 1.0, 0.0]))
    np.testing.assert_allclose(p, [0, 0, 0], atol=1e-8)
    assert w > 0.9


def test_convert_llff_roundtrip(tmp_path):
    n = 6
    rng = np.random.RandomState(0)
    (tmp_path / "images_8").mkdir()
    from PIL import Image
    for i in range(n):
        Image.new("RGB", (50, 40)).save(tmp_path / "images_8" / f"im_{i:03d}.png")

    # LLFF poses_bounds: [N, 17] = 3x5 pose (rot | t | hwf) + 2 bounds
    pb = np.zeros((n, 17))
    for i in range(n):
        ang = 2 * np.pi * i / n
        pos = np.array([2 * np.cos(ang), 2 * np.sin(ang), 0.3])
        # LLFF convention [down, right, backwards]; build something orthonormal
        z = pos / np.linalg.norm(pos)
        x = np.cross(np.array([0.0, 0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        rot = np.stack([-y, x, z], axis=-1)  # down, right, back
        pose = np.concatenate([rot, pos[:, None],
                               np.array([[320.0], [400.0], [333.0]])], axis=1)
        pb[i, :15] = pose.flatten()
        pb[i, 15:] = [1.0, 10.0]
    np.save(tmp_path / "poses_bounds.npy", pb)

    convert_llff(tmp_path, images_dir="images_8", downscale=8, hold=3)
    train = json.loads((tmp_path / "transforms_train.json").read_text())
    test = json.loads((tmp_path / "transforms_test.json").read_text())
    assert len(train["frames"]) == 4 and len(test["frames"]) == 2
    assert train["fl_x"] == 333.0 / 8
    assert train["w"] == 400.0 // 8 and train["h"] == 320.0 // 8
    poses = np.array([f["transform_matrix"] for f in train["frames"]])
    assert poses.shape == (4, 4, 4)
    # radius normalization: mean |t| == 4 over ALL poses (train+test)
    all_t = np.array([f["transform_matrix"] for f in
                      train["frames"] + test["frames"]])[:, :3, 3]
    np.testing.assert_allclose(np.linalg.norm(all_t, axis=-1).mean(), 4.0,
                               rtol=1e-6)
    # rotations stay orthonormal (up to the reference's 1e-10-regularized
    # Rodrigues formula, which drifts ~1e-5 when up is already near +z)
    r = poses[0, :3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)
    # loadable by our dataparser
    from samnerf_tpu.data.dataparser import DataparserConfig, parse_nerfstudio_data
    out = parse_nerfstudio_data(DataparserConfig(
        data=tmp_path, train_val_json_split=True), "train")
    assert out.cameras.num_cameras == 4
