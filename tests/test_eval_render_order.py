"""2D-block ray ordering in the frame renderer: the coords/unflatten
pairs must be exact inverses, and blocked vs row-major chunking must
render identical frames.

The ordering exists purely for the hash kernel's slab skip (tiles =
compact image regions); it must be invisible in the outputs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samnerf_tpu.engine import eval_render as er


def _coord_fingerprint(coords_flat):
    """Arbitrary per-ray vector function of the pixel coords."""
    return jnp.stack([coords_flat[:, 0] * 1000.0 + coords_flat[:, 1],
                      coords_flat[:, 0] - coords_flat[:, 1]], axis=-1)


@pytest.mark.parametrize("h,w,chunk", [(64, 64, 1024), (64, 96, 2048),
                                       (64, 64, 512), (48, 48, 256)])
def test_blocked_coords_roundtrip(h, w, chunk):
    coords, unflatten = er._blocked_coords(h, w, chunk)
    flat = coords.reshape(-1, 2)
    img = np.asarray(unflatten(_coord_fingerprint(jnp.asarray(flat))))
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ref = np.asarray(_coord_fingerprint(jnp.asarray(
        np.stack([yy, xx], -1).reshape(-1, 2).astype(np.float32))))
    np.testing.assert_allclose(img, ref.reshape(h, w, 2))


@pytest.mark.parametrize("ps", [1, 4])
def test_feature_grid_coords_roundtrip(ps):
    h = w = 64
    fh, fw = er.get_feature_size(h, w)
    coords, unflatten = er._feature_grid_coords(h, w, fh, fw, ps, 1024)
    flat = coords.reshape(-1, 2)[:fh * fw * ps * ps]
    # collapse each patch's ps^2 rays to its mean coord = the "patch
    # feature"; the conv head's contiguous-patch contract requires
    # every consecutive ps^2 group to be exactly one patch
    per_patch = flat.reshape(-1, ps * ps, 2).mean(axis=1)
    img = np.asarray(unflatten(_coord_fingerprint(jnp.asarray(per_patch))))
    # reference: plain patch-major order (the reference's
    # sam_model.py:369-379 layout), patches reduced the same way
    hi = np.linspace(0, h - 1, fh * ps)
    wi = np.linspace(0, w - 1, fw * ps)
    hh, ww = np.meshgrid(hi, wi, indexing="ij")
    grid = np.stack([hh, ww], -1).reshape(fh, ps, fw, ps, 2)
    grid = grid.transpose(0, 2, 1, 3, 4).reshape(-1, ps * ps, 2)
    ref_patch = grid.mean(axis=1).astype(np.float32)
    ref = np.asarray(_coord_fingerprint(jnp.asarray(ref_patch)))
    # f32 patch-mean rounding differs slightly between the two layouts
    np.testing.assert_allclose(img, ref.reshape(fh, fw, 2), rtol=1e-6,
                               atol=1e-3)


def test_blocked_and_rowmajor_chunking_render_identically():
    from samnerf_tpu.core.cameras import Cameras
    from samnerf_tpu.core.rays import RayBundle
    from samnerf_tpu.engine.eval_render import ImageRenderer
    from samnerf_tpu.models.sam_model import SAMModel, SAMModelConfig

    cfg = SAMModelConfig(
        num_levels=2, max_res=32, log2_hashmap_size=10,
        num_proposal_samples_per_ray=(4,), num_nerf_samples_per_ray=4,
        proposal_net_args=({"hidden_dim": 8, "log2_hashmap_size": 10,
                            "num_levels": 2, "max_res": 16},),
        distill_sam=False)
    model = SAMModel(cfg)
    n = 8
    rb = RayBundle(origins=jnp.zeros((n, 3)),
                   directions=jnp.eye(3)[jnp.zeros((n,), jnp.int32)],
                   pixel_area=jnp.ones((n, 1)) * 1e-6,
                   camera_indices=jnp.zeros((n, 1), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), rb, rng=jax.random.PRNGKey(1),
                        train=False)
    cams = Cameras(camera_to_worlds=jnp.eye(4)[None, :3, :4],
                   fx=jnp.asarray([[40.0]]), fy=jnp.asarray([[40.0]]),
                   cx=jnp.asarray([[32.0]]), cy=jnp.asarray([[32.0]]),
                   width=64, height=64)
    blocked = ImageRenderer(model, chunk=1024).render_image(params, cams, 0)
    rowmajor = ImageRenderer(model, chunk=512).render_image(params, cams, 0)
    np.testing.assert_allclose(blocked["rgb"], rowmajor["rgb"], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(blocked["depth"], rowmajor["depth"],
                               rtol=1e-5, atol=1e-6)


def test_minimal_frame_matches_full():
    """minimal=True (the serve fast path) must return the identical rgb
    while omitting depth/accumulation/prop_depth (XLA then dead-code-
    eliminates their one-hot median contractions from the frame)."""
    from samnerf_tpu.core.cameras import Cameras
    from samnerf_tpu.core.rays import RayBundle
    from samnerf_tpu.engine.eval_render import ImageRenderer
    from samnerf_tpu.models.sam_model import SAMModel, SAMModelConfig

    cfg = SAMModelConfig(
        num_levels=2, max_res=32, log2_hashmap_size=10,
        num_proposal_samples_per_ray=(4,), num_nerf_samples_per_ray=4,
        proposal_net_args=({"hidden_dim": 8, "log2_hashmap_size": 10,
                            "num_levels": 2, "max_res": 16},),
        distill_sam=False)
    model = SAMModel(cfg)
    n = 8
    rb = RayBundle(origins=jnp.zeros((n, 3)),
                   directions=jnp.eye(3)[jnp.zeros((n,), jnp.int32)],
                   pixel_area=jnp.ones((n, 1)) * 1e-6,
                   camera_indices=jnp.zeros((n, 1), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), rb, rng=jax.random.PRNGKey(1),
                        train=False)
    cams = Cameras(camera_to_worlds=jnp.eye(4)[None, :3, :4],
                   fx=jnp.asarray([[40.0]]), fy=jnp.asarray([[40.0]]),
                   cx=jnp.asarray([[16.0]]), cy=jnp.asarray([[16.0]]),
                   width=32, height=32)
    r = ImageRenderer(model, chunk=256)
    full = r.render_image(params, cams, 0)
    minimal = r.render_image_device(params, cams, 0, 32, 32, minimal=True)
    assert set(minimal.keys()) == {"rgb"}
    np.testing.assert_allclose(np.asarray(minimal["rgb"]), full["rgb"],
                               rtol=1e-6, atol=1e-7)
    assert "depth" in full and "prop_depth_0" in full
