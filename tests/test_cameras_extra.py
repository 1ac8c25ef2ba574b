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
