"""Fused serve path: the feature grids reuse the rgb pass's top-k
samples instead of re-running proposals+nerf on separate ray grids
(``ImageRenderer(fuse_features=True)``, the serve default).

Because the fused feature rays are the reference linspace grids rounded
to integer pixels — rays the rgb pass already rendered — and eval-mode
sampling is deterministic per ray, the fused output must EQUAL the full
independent feature pass evaluated at those rounded coords (reference
flow ``samnerf/sam_model.py:358-418``) up to float association.
"""
import numpy as np
import jax
import jax.numpy as jnp

from samnerf_tpu.core.cameras import Cameras
from samnerf_tpu.engine import eval_render as er
from samnerf_tpu.engine.eval_render import ImageRenderer
from samnerf_tpu.core.cameras import generate_rays
from samnerf_tpu.models.sam_model import SAMModel, SAMModelConfig

from test_model import TINY


def _setup(h=64, w=64):
    model = SAMModel(TINY)
    from test_model import make_bundle
    rb = make_bundle(16)
    params = model.init(jax.random.PRNGKey(0), rb, rng=jax.random.PRNGKey(1),
                        train=False, get_features=("sam", "clipseg"))
    cams = Cameras(camera_to_worlds=jnp.eye(4)[None, :3, :4],
                   fx=jnp.asarray([[40.0]]), fy=jnp.asarray([[40.0]]),
                   cx=jnp.asarray([[w / 2.0]]), cy=jnp.asarray([[h / 2.0]]),
                   width=w, height=h)
    return model, params, cams


def _independent_features(model, params, cams, px, get_features):
    """Full un-fused model pass (proposals + nerf + sam field) on the
    given integer pixel coords."""
    rb = generate_rays(cams, jnp.zeros((px.shape[0],), jnp.int32),
                       jnp.asarray(px.astype(np.float32)))
    out = model.apply(params, rb, train=False, get_features=get_features)
    return out


def test_fused_sam_equals_independent_pass_on_rounded_coords():
    h = w = 64
    model, params, cams = _setup(h, w)
    fused = ImageRenderer(model, chunk=1024, fuse_features=True).render_image(
        params, cams, 0, features=("sam",))

    fh, fw = er.get_feature_size(h, w)
    ps = TINY.patch_size
    grid, unflatten = er._feature_grid_rays(h, w, fh, fw, ps)
    px = np.rint(grid).astype(np.int64)
    out = _independent_features(model, params, cams, px, ("sam",))
    expected = np.asarray(unflatten(out["sam"]))
    np.testing.assert_allclose(fused["sam"], expected, rtol=2e-4, atol=2e-4)


def test_fused_clipseg_equals_independent_pass_on_rounded_coords():
    h = w = 64
    model, params, cams = _setup(h, w)
    fused = ImageRenderer(model, chunk=1024, fuse_features=True).render_image(
        params, cams, 0, features=("clipseg",))

    hi = np.linspace(0, h - 1, 32)
    wi = np.linspace(0, w - 1, 32)
    hh, ww = np.meshgrid(hi, wi, indexing="ij")
    px = np.rint(np.stack([hh, ww], -1).reshape(-1, 2)).astype(np.int64)
    out = _independent_features(model, params, cams, px, ("clipseg",))
    expected = np.asarray(out["clipseg"]).reshape(32, 32, -1)
    np.testing.assert_allclose(fused["clipseg"], expected, rtol=2e-4,
                               atol=2e-4)


def test_fused_rgb_unchanged_by_fusion():
    h = w = 64
    model, params, cams = _setup(h, w)
    fused = ImageRenderer(model, chunk=1024, fuse_features=True).render_image(
        params, cams, 0, features=("sam",))
    plain = ImageRenderer(model, chunk=1024,
                          fuse_features=False).render_image(
        params, cams, 0, features=())
    np.testing.assert_allclose(fused["rgb"], plain["rgb"], rtol=1e-5,
                               atol=1e-6)
