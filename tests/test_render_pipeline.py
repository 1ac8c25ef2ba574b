"""Geometry tests for 3D prompt locking (project/backproject/visibility)
and the interactive pipeline on a tiny trained-ish model."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from samnerf_tpu.engine.render_pipeline import (backproject, draw_pins,
                                                pooled_heatmap_points,
                                                project, visible_mask)
from samnerf_tpu.utils import synthetic


def make_cam(pos=(2.0, 0.7, 0.5)):
    # generic position: the reference's visibility test divides by ray
    # direction componentwise (sam_model.py:73), so axis-aligned cameras
    # (zero components) hit 0/0 — a reference quirk we preserve
    c2w = synthetic.look_at_c2w(np.array(pos), np.zeros(3))
    intrin = np.array([[100.0, 0, 32.0], [0, 100.0, 24.0], [0, 0, 1.0]])
    return intrin, c2w


def test_project_backproject_roundtrip():
    intrin, c2w = make_cam()
    # choose a pixel; place depth so the 3D point is 1.5 units along the ray
    pts2d = np.array([[20, 30], [40, 10]], np.float64)
    depth = np.full((48, 64), 1.5 + 1e-2)  # +TOR cancels the offset
    p3d = backproject(pts2d, depth, intrin, c2w[:3, :4])
    back = project(intrin, c2w, p3d)
    # int truncation (reference project() casts with .to(torch.int32)) can
    # lose one pixel to fp rounding
    assert np.abs(back - pts2d).max() <= 1


def test_backprojected_point_is_visible():
    intrin, c2w = make_cam()
    pts2d = np.array([[32, 24]], np.float64)
    depth = np.full((48, 64), 2.0)
    p3d = backproject(pts2d, depth, intrin, c2w[:3, :4])
    vis = visible_mask(pts2d, p3d, depth, intrin, c2w)
    assert vis.all()  # TOR puts the point slightly in front of the surface
    # an occluded point (depth closer than the locked point) is invisible
    vis2 = visible_mask(pts2d, p3d, np.full((48, 64), 1.0), intrin, c2w)
    assert not vis2.any()


def test_pooled_heatmap_points():
    heat = np.zeros((512, 512), np.float32)
    heat[100:120, 200:230] = 1.0  # hot region
    pts = pooled_heatmap_points(heat, (512, 512), topk=1000, threshold=0.7)
    assert pts is not None and len(pts) >= 1
    assert (pts[:, 0] >= 190).all() and (pts[:, 0] <= 240).all()
    assert (pts[:, 1] >= 90).all() and (pts[:, 1] <= 130).all()
    assert pooled_heatmap_points(np.zeros((512, 512), np.float32),
                                 (512, 512)) is None


def test_draw_pins():
    img = np.zeros((32, 32, 3), np.float32)
    out = draw_pins(img, np.array([[5, 6], [31, 0]]), radius=2)
    assert out[6, 5, 0] == 1.0 and out[6, 5, 1] == 0.0
    assert out[0, 31, 0] == 1.0  # clipped at border without error
    assert img.sum() == 0  # input untouched


def test_serve_frame_fn_device_fast_path():
    """The bench.py serving path is a SamNerfRenderer method: one call
    renders + decodes + composites fully on device and returns uint8."""
    import jax
    import jax.numpy as jnp

    from samnerf_tpu.core.cameras import Cameras
    from samnerf_tpu.core.rays import RayBundle
    from samnerf_tpu.engine.render_pipeline import SamNerfRenderer
    from samnerf_tpu.models.sam_model import SAMModel
    from samnerf_tpu.perception.sam.build_sam import build_sam
    from samnerf_tpu.perception.sam.sam import Sam

    from test_model import TINY, make_bundle

    model = SAMModel(TINY)
    rb = make_bundle(16)
    params = model.init(jax.random.PRNGKey(0), rb,
                        rng=jax.random.PRNGKey(1), train=False,
                        get_features=("sam", "clipseg"))
    sam, _ = build_sam("vit_b")
    feat0 = jnp.zeros((1, 64, 64, 256))
    pts0 = (jnp.zeros((1, 4, 2)), -jnp.ones((1, 4), jnp.int32))
    dec_params = sam.init(jax.random.PRNGKey(1), feat0, pts0, None, None,
                          False, method=Sam.decode_masks)

    h = w = 64
    cams = Cameras(camera_to_worlds=jnp.eye(4)[None, :3, :4],
                   fx=jnp.asarray([[40.0]]), fy=jnp.asarray([[40.0]]),
                   cx=jnp.asarray([[w / 2.0]]), cy=jnp.asarray([[h / 2.0]]),
                   width=w, height=h)
    snr = SamNerfRenderer(model, chunk=1024)
    serve = snr.serve_frame_fn(sam, dec_params, h, w)
    out = np.asarray(serve(params, cams, 0, (32.0, 32.0)))
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    # deterministic for identical inputs
    out2 = np.asarray(serve(params, cams, 0, (32.0, 32.0)))
    np.testing.assert_array_equal(out, out2)


def test_serve_presets():
    """serve_preset="static" trims SAM top-k and builds a halved-count
    "move" renderer; sample counts are serve-time static config, so the
    SAME params render through both (tune_serve.py round-3 sweep)."""
    import jax

    from samnerf_tpu.engine.render_pipeline import SamNerfRenderer, serve_model
    from samnerf_tpu.models.sam_model import SAMModel

    from test_model import TINY, make_bundle

    model = SAMModel(TINY)  # TINY: nerf 8, props (8,), k 4
    snr = SamNerfRenderer(model, chunk=256, serve_preset="static")
    assert snr.cfg.num_sam_samples == min(8, TINY.num_sam_samples)
    assert snr.cfg.num_nerf_samples_per_ray == TINY.num_nerf_samples_per_ray
    move_cfg = snr._move_renderer.model.config
    # presets only ever REDUCE counts: TINY trains 8 nerf samples < the
    # move preset's 16, so 8 is kept
    assert move_cfg.num_nerf_samples_per_ray == 8
    assert move_cfg.num_proposal_samples_per_ray == (8,)
    assert (move_cfg.num_sam_samples
            == SamNerfRenderer.SERVE_PRESETS["move"]["k"])
    assert snr._renderer_for("move") is snr._move_renderer
    assert snr._renderer_for("static") is snr.renderer
    # "full" preset: no move renderer, primary untouched
    snr_full = SamNerfRenderer(model, chunk=256)
    assert snr_full._move_renderer is None
    assert snr_full._renderer_for("move") is snr_full.renderer
    assert snr_full.cfg.num_sam_samples == TINY.num_sam_samples

    # identical params render through a reduced-count serve model
    rb = make_bundle(8)
    params = model.init(jax.random.PRNGKey(0), rb, rng=jax.random.PRNGKey(1),
                        train=False, get_features=())
    small = serve_model(model, nerf=4, props=4, k=2)
    out = small.apply(params, rb, train=False, get_features=())
    assert np.isfinite(np.asarray(out["rgb"])).all()
