"""Cameras / dataparser / datamanager tests against the synthetic scene."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from samnerf_tpu.core.cameras import Cameras, generate_rays, full_image_coords
from samnerf_tpu.data.datamanager import DataManager, DataManagerConfig
from samnerf_tpu.data.dataparser import DataparserConfig, parse_nerfstudio_data
from samnerf_tpu.data.pixel_samplers import (patch_center_indices,
                                             sample_patches, sample_uniform)
from samnerf_tpu.utils import synthetic


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    return synthetic.write_scene(d, num_train=4, num_test=2, h=32, w=48,
                                 with_features=True, feature_long_side=8)


def _simple_cameras():
    c2w = synthetic.look_at_c2w(np.array([2.0, 0.0, 0.0]), np.zeros(3))
    return Cameras(
        camera_to_worlds=jnp.asarray(c2w[None, :3, :4], jnp.float32),
        fx=jnp.asarray([[50.0]]), fy=jnp.asarray([[50.0]]),
        cx=jnp.asarray([[24.0]]), cy=jnp.asarray([[16.0]]),
        width=48, height=32)


def test_generate_rays_principal_point_is_forward():
    cams = _simple_cameras()
    # pixel center at the principal point: coord+0.5 == (cx, cy)
    coords = jnp.asarray([[16.0 - 0.5, 24.0 - 0.5]])  # (row, col)
    rb = generate_rays(cams, jnp.asarray([0]), coords)
    d = np.asarray(rb.directions[0])
    # camera at +x looking at origin: forward = -x
    np.testing.assert_allclose(d, [-1.0, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(rb.origins[0]), [2, 0, 0], atol=1e-6)
    assert float(rb.pixel_area[0, 0]) > 0


def test_generate_rays_unit_norm_and_area():
    cams = _simple_cameras()
    coords = jnp.asarray(full_image_coords(32, 48))
    rb = generate_rays(cams, jnp.zeros((coords.shape[0],), jnp.int32), coords)
    norms = np.linalg.norm(np.asarray(rb.directions), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert np.all(np.asarray(rb.pixel_area) > 0)


def test_rays_match_synthetic_sphere_mask(scene):
    """Rays generated through the full dataparser+camera stack must hit the
    ball exactly where the rendered GT image is ball-colored."""
    dm = DataManager(DataManagerConfig(dataparser=DataparserConfig(
        data=scene, train_val_json_split=True)))
    cams = jax.tree.map(jnp.asarray, dm.cameras)
    img = dm.images[0].astype(np.float32) / 255.0
    h, w = img.shape[:2]
    coords = jnp.asarray(full_image_coords(h, w))
    rb = generate_rays(cams, jnp.zeros((h * w,), jnp.int32), coords)
    # the dataparser recenters/reorients/rescales world space: map the ball
    # center (origin in the raw scene) through the same transform
    scale = dm.train_outputs.dataparser_scale
    T = dm.train_outputs.dataparser_transform  # [3, 4]
    center = scale * (T @ np.array([0.0, 0.0, 0.0, 1.0]))
    hit, _ = synthetic.ray_sphere_hit(np.asarray(rb.origins),
                                      np.asarray(rb.directions),
                                      radius=synthetic.BALL_RADIUS * scale,
                                      center=center)
    gt_hit = img.reshape(-1, 3)[:, 0] < 0.9  # ball is red-ish, bg white
    agreement = np.mean(hit == gt_hit)
    assert agreement > 0.99, f"ray/image agreement {agreement}"


def test_dataparser_split(scene):
    cfg = DataparserConfig(data=scene, train_val_json_split=True)
    train = parse_nerfstudio_data(cfg, "train")
    test = parse_nerfstudio_data(cfg, "test")
    assert len(train.image_filenames) == 4
    assert len(test.image_filenames) == 2
    assert train.cameras.camera_to_worlds.shape == (4, 3, 4)
    # auto scale: max |translation| == 1
    np.testing.assert_allclose(
        np.max(np.abs(train.cameras.camera_to_worlds[:, :3, 3])), 1.0,
        rtol=1e-5)
    # up orientation: average camera up is +z after transform
    ups = train.cameras.camera_to_worlds[:, :3, 1]
    mean_up = ups.mean(0) / np.linalg.norm(ups.mean(0))
    # orientation is computed over all 6 poses, checked on the 4-pose train
    # subset -> only approximately +z
    assert mean_up[2] > 0.95


def test_pixel_samplers_bounds():
    rng = np.random.default_rng(0)
    idx = sample_uniform(rng, 100, 3, 32, 48)
    assert idx.shape == (100, 3)
    assert idx[:, 0].max() < 3 and idx[:, 1].max() < 32 and idx[:, 2].max() < 48
    pidx = sample_patches(rng, 100, 3, 32, 48, patch_size=4)
    assert pidx.shape == (96, 3)  # floor to multiple of 16
    patches = pidx.reshape(-1, 4, 4, 3)
    # all pixels in a patch from same image, contiguous rows/cols
    assert (patches[..., 0] == patches[:, :1, :1, 0]).all()
    np.testing.assert_array_equal(patches[0, :, 0, 1] - patches[0, 0, 0, 1],
                                  np.arange(4))
    np.testing.assert_array_equal(patches[0, 0, :, 2] - patches[0, 0, 0, 2],
                                  np.arange(4))
    centers = patch_center_indices(pidx, 4)
    np.testing.assert_array_equal(centers[0], patches[0, 2, 2])


def test_datamanager_batches(scene):
    cfg = DataManagerConfig(
        dataparser=DataparserConfig(data=scene, train_val_json_split=True),
        train_num_rays_per_batch=64, patch_size=2, distill_sam=True,
        use_clipseg_feature=True)
    dm = DataManager(cfg)
    batch = dm.next_train(0)
    assert batch["indices"].shape == (64, 3)
    assert batch["image"].shape == (64, 3)
    assert batch["sam"].shape == (16, 256)  # 64 rays / 2x2 patches
    assert batch["clipseg"].shape == (64, 192)
    # feature targets: +-1 pattern from synthetic scene
    assert set(np.unique(batch["sam"])) <= {-1.0, 1.0}
    ev = dm.eval_image_batch(0)
    assert ev["image"].shape == (32, 48, 3)


def test_equirectangular_pixel_sampler():
    import numpy as np
    from samnerf_tpu.data.pixel_samplers import sample_equirectangular
    rng = np.random.default_rng(0)
    idx = sample_equirectangular(rng, 20000, 2, 100, 200)
    assert idx.shape == (20000, 3)
    assert idx[:, 1].min() >= 0 and idx[:, 1].max() < 100
    # equator rows should be sampled more than polar rows
    rows = idx[:, 1]
    polar = ((rows < 10) | (rows >= 90)).mean()
    equator = ((rows >= 45) & (rows < 55)).mean()
    assert equator > polar


def test_datamanager_auto_routes_blender_format(tmp_path):
    """DataManager detects blender-synthetic layout (camera_angle_x, no
    fl_x) and routes to the blender parser — the reference CLI's
    dataparser subcommand made automatic."""
    import json

    import numpy as np
    from PIL import Image

    from samnerf_tpu.data.datamanager import DataManager, DataManagerConfig
    from samnerf_tpu.data.dataparser import DataparserConfig

    d = tmp_path / "blender"
    (d / "images").mkdir(parents=True)
    for split, n in (("train", 3), ("test", 2)):
        frames = []
        for i in range(n):
            name = f"images/{split}_{i}"
            Image.fromarray(np.full((16, 16, 3), 100, np.uint8)).save(
                d / (name + ".png"))
            c2w = np.eye(4)
            c2w[2, 3] = 2.0
            frames.append({"file_path": "./" + name,
                           "transform_matrix": c2w.tolist()})
        (d / f"transforms_{split}.json").write_text(json.dumps(
            {"camera_angle_x": 0.8, "frames": frames}))
    dm = DataManager(DataManagerConfig(dataparser=DataparserConfig(data=d)))
    assert dm.num_train_images == 3
    assert dm.eval_cameras.num_cameras == 2
    # focal from camera_angle_x: 0.5*16/tan(0.4)
    assert abs(float(dm.cameras.fx[0, 0])
               - 0.5 * 16 / np.tan(0.4)) < 1e-3
