"""COLMAP reader/converter on synthetic binary and text models."""
import json
import struct

import numpy as np

from samnerf_tpu.preprocessing import colmap_utils as cu


def _write_binary_model(d):
    with open(d / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))  # PINHOLE
        f.write(struct.pack("<4d", 400.0, 410.0, 320.0, 240.0))
    with open(d / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        for iid, name in ((1, b"a.png"), (2, b"b.png")):
            f.write(struct.pack("<I", iid))
            f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))  # identity q
            f.write(struct.pack("<3d", 0.0, 0.0, float(iid)))
            f.write(struct.pack("<I", 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", 0))


def test_binary_roundtrip_and_convert(tmp_path):
    _write_binary_model(tmp_path)
    cams = cu.read_cameras_binary(tmp_path / "cameras.bin")
    assert cams[1].model == "PINHOLE" and cams[1].width == 640
    imgs = cu.read_images_binary(tmp_path / "images.bin")
    assert imgs[2].name == "b.png"
    n = cu.colmap_to_json(tmp_path, tmp_path / "out")
    assert n == 2
    meta = json.loads((tmp_path / "out" / "transforms.json").read_text())
    assert meta["fl_x"] == 400.0 and len(meta["frames"]) == 2
    m = np.array(meta["frames"][0]["transform_matrix"])
    assert m.shape == (4, 4)
    # camera at identity rotation, translation (0,0,-1) in colmap ->
    # finite c2w with unit-norm rotation rows
    np.testing.assert_allclose(np.linalg.norm(m[:3, :3], axis=1), 1.0,
                               rtol=1e-6)


def test_text_model(tmp_path):
    (tmp_path / "cameras.txt").write_text(
        "# comment\n1 SIMPLE_PINHOLE 64 48 50.0 32.0 24.0\n")
    (tmp_path / "images.txt").write_text(
        "1 1 0 0 0 0.5 0.5 0.5 1 img.png\n\n")
    cams = cu.read_cameras_text(tmp_path / "cameras.txt")
    assert cams[1].model == "SIMPLE_PINHOLE"
    imgs = cu.read_images_text(tmp_path / "images.txt")
    assert imgs[1].name == "img.png"
    n = cu.colmap_to_json(tmp_path, tmp_path / "out")
    assert n == 1


def test_qvec2rotmat_identity():
    np.testing.assert_allclose(
        cu.qvec2rotmat(np.array([1.0, 0, 0, 0])), np.eye(3), atol=1e-12)
