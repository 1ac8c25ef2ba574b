"""llff2nerf conversion test on a synthetic poses_bounds.npy."""
import json
from pathlib import Path

import numpy as np
import pytest

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
    # rotations stay orthonormal up to the reference's 1e-10-regularized
    # Rodrigues formula: with up already near +z (this ring fixture) the
    # formula is near-degenerate and amplifies BLAS thread-order noise in
    # the averaged up-vector to ~1e-4..1e-3 scale drift (observed flaky
    # at atol=1e-4 under load; the reference has identical behavior)
    r = poses[0, :3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=2e-3)
    # loadable by our dataparser
    from samnerf_tpu.data.dataparser import DataparserConfig, parse_nerfstudio_data
    out = parse_nerfstudio_data(DataparserConfig(
        data=tmp_path, train_val_json_split=True), "train")
    assert out.cameras.num_cameras == 4


def test_metashape_to_json(tmp_path):
    """Metashape XML -> transforms.json (metashape_utils.py:37-143):
    sensor calibration + the row-shuffle into nerfstudio axes."""
    from samnerf_tpu.preprocessing.converters import metashape_to_json

    xml = """<document><chunk>
      <sensors>
        <sensor id="0"><resolution width="640" height="480"/>
          <calibration><f>500.0</f><cx>2.0</cx><cy>-3.0</cy>
            <k1>0.01</k1></calibration></sensor>
      </sensors>
      <cameras>
        <camera id="0" sensor_id="0" label="img_a.jpg">
          <transform>1 0 0 0.5 0 1 0 0.25 0 0 1 2.0 0 0 0 1</transform>
        </camera>
        <camera id="1" sensor_id="0" label="img_b"/>
      </cameras>
    </chunk></document>"""
    (tmp_path / "cameras.xml").write_text(xml)
    summary = metashape_to_json(
        {"img_a": Path("images/img_a.jpg"),
         "img_b": Path("images/img_b.jpg")},
        tmp_path / "cameras.xml", tmp_path)
    data = json.loads((tmp_path / "transforms.json").read_text())
    assert data["w"] == 640 and data["h"] == 480
    assert data["fl_x"] == 500.0 and data["cx"] == 322.0 and data["cy"] == 237.0
    assert data["k1"] == 0.01
    assert len(data["frames"]) == 1            # img_b skipped (no transform)
    t = np.array(data["frames"][0]["transform_matrix"])
    # identity rotation maps to the (z,x,y) row shuffle with y/z negation
    np.testing.assert_allclose(t[0], [0, 0, -1, 2.0])
    np.testing.assert_allclose(t[1], [1, 0, 0, 0.5])
    np.testing.assert_allclose(t[2], [0, -1, 0, 0.25])
    assert "1 images skipped" in summary[0]


def test_realitycapture_to_json(tmp_path):
    """RealityCapture CSV -> transforms.json (realitycapture_utils.py:31-118):
    35mm-equivalent focals, euler pose composition."""
    from samnerf_tpu.preprocessing.converters import realitycapture_to_json

    csv_text = ("#name,x,y,alt,heading,pitch,roll,f,px,py,"
                "k1,k2,k3,k4,t1,t2\n"
                "shot1.jpg,1.0,2.0,3.0,90.0,0.0,0.0,36.0,0.0,0.0,"
                "0,0,0,0,0,0\n")
    (tmp_path / "poses.csv").write_text(csv_text)
    realitycapture_to_json({"shot1": Path("images/shot1.jpg")},
                           tmp_path / "poses.csv", tmp_path,
                           image_size=(480, 640))
    data = json.loads((tmp_path / "transforms.json").read_text())
    f = data["frames"][0]
    assert data["w"] == 640 and f["fl_x"] == 36.0 * 640 / 36
    t = np.array(f["transform_matrix"])
    np.testing.assert_allclose(t[:3, 3], [1.0, 2.0, 3.0])
    # heading=90 negated -> Rz(-90): x-axis maps to (0,-1,0)
    np.testing.assert_allclose(t[:3, 0], [0, -1, 0], atol=1e-12)


def test_run_hloc_gated():
    from samnerf_tpu.preprocessing.converters import run_hloc
    with pytest.raises(ImportError, match="hloc"):
        run_hloc(Path("/tmp/x"), Path("/tmp/y"))


def test_equirect_to_perspective(tmp_path):
    """Directional correctness of the equirect sampler: a panorama whose
    color encodes (lon, lat) must produce crops whose center pixel matches
    the view direction (replaces equilib's Equi2Pers)."""
    from samnerf_tpu.preprocessing.equirect_utils import (
        equirect_to_perspective,
        generate_planar_projections_from_equirectangular)

    ph, pw = 128, 256
    lon = (np.arange(pw) + 0.5) / pw            # 0..1 across longitude
    lat = (np.arange(ph) + 0.5) / ph            # 0..1 top->bottom
    pano = np.zeros((ph, pw, 3), np.float32)
    pano[..., 0] = lon[None, :]
    pano[..., 1] = lat[:, None]

    # forward view (yaw 0, pitch 0): center pixel = lon 0.5, lat 0.5
    crop = equirect_to_perspective(pano, 90.0, 0.0, 0.0, (64, 64))
    np.testing.assert_allclose(crop[32, 32, 0], 0.5, atol=0.02)
    np.testing.assert_allclose(crop[32, 32, 1], 0.5, atol=0.02)
    # yaw +90deg moves the center a quarter panorama in longitude
    crop = equirect_to_perspective(pano, 90.0, np.pi / 2, 0.0, (64, 64))
    np.testing.assert_allclose(crop[32, 32, 0], 0.75, atol=0.02)
    # pitch up moves toward the top rows (smaller lat channel)
    crop_up = equirect_to_perspective(pano, 90.0, 0.0, 0.6, (64, 64))
    assert crop_up[32, 32, 1] < 0.35

    # driver writes crops + metadata
    from PIL import Image
    d = tmp_path / "equi"
    d.mkdir()
    Image.fromarray((pano * 255).astype(np.uint8)).save(d / "pano.png")
    out = generate_planar_projections_from_equirectangular(
        d, (32, 32), samples_per_im=4)
    crops = list(out.glob("*.png"))
    assert len(crops) == 4
    meta = json.loads((out / "projections.json").read_text())
    assert len(meta) == 4 and all("yaw" in m for m in meta)


def test_process_data_utils(tmp_path):
    """Image listing/subset/copy/downscale + masks
    (process_data_utils.py equivalents, PIL instead of ffmpeg)."""
    from PIL import Image

    from samnerf_tpu.preprocessing import process_data_utils as pdu

    src = tmp_path / "raw"
    src.mkdir()
    for i in range(7):
        Image.fromarray(
            np.full((32, 48, 3), i * 30, np.uint8)).save(src / f"im{i}.png")
    (src / "notes.txt").write_text("skip me")

    files = pdu.list_images(src)
    assert len(files) == 7
    subset, total = pdu.get_image_filenames(src, max_num_images=3)
    assert total == 7 and len(subset) == 3
    assert subset[0].name == "im0.png" and subset[-1].name == "im6.png"

    img_dir = tmp_path / "images"
    mapping = pdu.copy_images(src, img_dir)
    assert len(mapping) == 7
    assert (img_dir / "frame_00001.png").exists()

    msg = pdu.downscale_images(img_dir, num_downscales=2)
    assert "2x, 4x" in msg
    with Image.open(tmp_path / "images_2" / "frame_00001.png") as im:
        assert im.size == (24, 16)
    with Image.open(tmp_path / "images_4" / "frame_00001.png") as im:
        assert im.size == (12, 8)

    m = pdu.generate_circle_mask(100, 100, 1.0)
    assert m[50, 50] and not m[0, 0]
    assert pdu.generate_circle_mask(10, 10, 1.5) is None
    cm = pdu.generate_crop_mask(100, 100, (0.1, 0.1, 0.0, 0.0))
    assert not cm[5, 50] and cm[50, 50]
    assert pdu.generate_crop_mask(10, 10) is None

    # video extraction gated on ffmpeg (absent here)
    import shutil as _sh
    if _sh.which("ffmpeg") is None:
        with pytest.raises(RuntimeError, match="ffmpeg"):
            pdu.convert_video_to_images(tmp_path / "v.mp4", tmp_path / "f", 5)
