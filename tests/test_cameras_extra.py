"""Camera types, Lie-group exp maps, camera optimizer."""
import numpy as np

import jax
import jax.numpy as jnp

from samnerf_tpu.core import cameras as cam
from samnerf_tpu.core.camera_optimizers import CameraOptimizer
from samnerf_tpu.core.lie_groups import (exp_map_SE3, exp_map_SO3xR3,
                                         multiply_poses)


def _single_camera(ctype):
    c2w = jnp.eye(4)[None, :3, :4]
    return cam.Cameras(
        camera_to_worlds=c2w, fx=jnp.asarray([[32.0]]), fy=jnp.asarray([[32.0]]),
        cx=jnp.asarray([[32.0]]), cy=jnp.asarray([[16.0]]),
        width=64, height=32,
        camera_type=jnp.asarray([[ctype]], jnp.int32))


def test_equirectangular_directions_cover_sphere():
    # fx = fy = height, width = 2*height (cameras.py:674-676)
    c = _single_camera(cam.EQUIRECTANGULAR)
    coords = jnp.asarray(cam.full_image_coords(32, 64))
    rb = cam.generate_rays(c, jnp.zeros(coords.shape[0], jnp.int32), coords)
    d = np.asarray(rb.directions)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-5)
    # directions must span all octants (full panorama)
    assert (d[:, 0] > 0.5).any() and (d[:, 0] < -0.5).any()
    assert (d[:, 1] > 0.9).any() and (d[:, 1] < -0.9).any()
    assert (d[:, 2] > 0.5).any() and (d[:, 2] < -0.5).any()


def test_fisheye_center_matches_perspective():
    cf = _single_camera(cam.FISHEYE)
    cp = _single_camera(cam.PERSPECTIVE)
    center = jnp.asarray([[15.5, 31.5]])  # optical center
    idx = jnp.zeros(1, jnp.int32)
    df = np.asarray(cam.generate_rays(cf, idx, center).directions)
    dp = np.asarray(cam.generate_rays(cp, idx, center).directions)
    np.testing.assert_allclose(df, dp, atol=1e-4)
    np.testing.assert_allclose(df, [[0.0, 0.0, -1.0]], atol=1e-4)


def test_exp_maps_identity_and_inverse():
    zero = jnp.zeros((4, 6))
    eye = np.broadcast_to(np.eye(4)[:3, :4], (4, 3, 4))
    np.testing.assert_allclose(np.asarray(exp_map_SO3xR3(zero)), eye, atol=1e-3)
    np.testing.assert_allclose(np.asarray(exp_map_SE3(zero)), eye, atol=1e-6)
    # exp(v) @ exp(-v) == identity for SE3
    v = jnp.asarray([[0.1, -0.2, 0.3, 0.2, 0.1, -0.3]])
    a = exp_map_SE3(v)
    b = exp_map_SE3(-v)
    prod = np.asarray(multiply_poses(a, b))
    np.testing.assert_allclose(prod, np.eye(4)[None, :3, :4], atol=1e-5)


def test_exp_map_so3xr3_rotation_angle():
    # rotation by angle pi/2 about z
    v = jnp.asarray([[0.0, 0.0, 0.0, 0.0, 0.0, np.pi / 2]])
    r = np.asarray(exp_map_SO3xR3(v))[0, :3, :3]
    expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(r, expected, atol=1e-5)


def test_camera_optimizer_modes():
    idx = jnp.asarray([0, 1, 1], jnp.int32)
    for mode in ("off", "SO3xR3", "SE3"):
        opt = CameraOptimizer(num_cameras=3, mode=mode)
        params = opt.init(jax.random.PRNGKey(0), idx)
        out = opt.apply(params, idx)
        assert out.shape == (3, 3, 4)
        # zero-init => identity deltas
        np.testing.assert_allclose(
            np.asarray(out), np.broadcast_to(np.eye(4)[:3, :4], (3, 3, 4)),
            atol=1e-3)
        if mode != "off":
            assert params["params"]["pose_adjustment"].shape == (3, 6)


def test_pose_adjustment_moves_ray_origin():
    c = _single_camera(cam.PERSPECTIVE)
    idx = jnp.zeros(1, jnp.int32)
    coords = jnp.asarray([[15.5, 31.5]])
    delta = jnp.asarray([[0.5, 0.0, 0.0, 0.0, 0.0, 0.0]])
    adj = exp_map_SE3(delta)
    rb = cam.generate_rays(c, idx, coords, camera_opt_to_camera=adj)
    np.testing.assert_allclose(np.asarray(rb.origins), [[0.5, 0.0, 0.0]],
                               atol=1e-6)


def test_camera_paths_from_json_and_slerp():
    """camera_paths vs the reference semantics (camera_paths.py:118-177,
    camera_utils.py:106-186)."""
    import numpy as np

    from samnerf_tpu.core import camera_paths as cp
    from samnerf_tpu.core.cameras import Cameras

    # three.js focal: fov 90 at h=512 -> 256/tan(45) = 256
    assert abs(cp.three_js_perspective_camera_focal_length(90.0, 512)
               - 256.0) < 1e-6

    # path from a viewer export
    c2w = np.eye(4)
    path = {"render_height": 128, "render_width": 256, "seconds": 2,
            "camera_path": [
                {"camera_to_world": c2w.ravel().tolist(), "fov": 60.0},
                {"camera_to_world": c2w.ravel().tolist(), "fov": 90.0}]}
    cams = cp.get_path_from_json(path)
    assert cams.num_cameras == 2 and cams.width == 256 and cams.height == 128
    assert abs(float(cams.fx[1, 0]) - 64.0) < 1e-4   # 64/tan(45)

    # slerp: endpoints exact, midpoint a valid rotation halfway
    ra = np.eye(3)
    th = np.pi / 2
    rb = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    pa = np.concatenate([ra, np.zeros((3, 1))], 1)
    pb = np.concatenate([rb, np.array([[1.0], [0], [0]])], 1)
    seg = cp.get_interpolated_poses(pa, pb, steps=4)
    assert seg.shape == (4, 3, 4)
    np.testing.assert_allclose(seg[0], pa, atol=1e-6)
    mid = seg[2][:3, :3]   # t=0.5 -> rotation by 45 deg
    np.testing.assert_allclose(mid @ mid.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(mid[0, 0], np.cos(np.pi / 4), atol=1e-6)
    np.testing.assert_allclose(seg[2][:3, 3], [0.5, 0, 0], atol=1e-6)

    # interpolated camera path across 3 cameras
    import jax.numpy as jnp
    base = Cameras(camera_to_worlds=jnp.asarray(
        np.stack([pa, ((pa + pb) / 2), pb]).astype(np.float32)),
        fx=jnp.full((3, 1), 100.0), fy=jnp.full((3, 1), 100.0),
        cx=jnp.full((3, 1), 64.0), cy=jnp.full((3, 1), 64.0),
        width=128, height=128)
    interp = cp.get_interpolated_camera_path(base, steps=5)
    assert interp.num_cameras == 10
    # spiral: right count, all orthonormal rotations
    spiral = cp.get_spiral_path(base, steps=7, radius=0.1)
    assert spiral.num_cameras == 7
    rs = np.asarray(spiral.camera_to_worlds)[:, :3, :3]
    for r in rs:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
