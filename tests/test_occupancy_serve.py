"""Serve-time occupancy culling: table semantics, field culling, model
plumbing, and the bake path.

Reference analogue: nerfacc's OccupancyGrid skip in
``nerfstudio/models/instant_ngp.py:117-124``; for the samnerf serve path
(``samnerf/sam_model.py:358-418``) culling is a pure serving optimization
— all-occupied grids must reproduce the un-culled render exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samnerf_tpu.ops import occupancy as occ_ops


def _rand_cells(res, frac, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random((res, res, res)) < frac).astype(np.float32)


def test_pack_and_live_neighborhood_semantics():
    """live(p) == any occupied cell in the 3x3x3 neighborhood of p's cell
    (trilinear over lattice-max values is the built-in dilation)."""
    res = 8
    cells = _rand_cells(res, 0.2)
    occ = occ_ops.pack_serve_occupancy(cells)
    rng = np.random.default_rng(1)
    pts = rng.uniform(0.01, 0.99, (256, 3)).astype(np.float32)
    live = np.asarray(occ_ops.occupancy_live(occ, jnp.asarray(pts), res))
    pad = np.pad(cells, 1)
    ijk = np.clip((pts * res).astype(int), 0, res - 1)
    for n, (i, j, k) in enumerate(ijk):
        want = pad[i:i + 3, j:j + 3, k:k + 3].max() > 0
        assert bool(live[n, 0] > 0) == bool(want), (n, i, j, k)


def test_all_occupied_grid_is_identity():
    from samnerf_tpu.fields.nerfacto_field import NerfactoField

    res = 8
    occ = occ_ops.pack_serve_occupancy(np.ones((res, res, res), np.float32))
    field = NerfactoField(num_levels=2, max_res=32, log2_hashmap_size=10,
                         occ_res=res)
    pos = jax.random.normal(jax.random.PRNGKey(0), (16, 4, 3)) * 0.5
    dirs = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    params = field.init(jax.random.PRNGKey(2), pos, dirs)
    base = field.apply(params, pos, dirs)
    culled = field.apply(params, pos, dirs, occ=occ)
    np.testing.assert_allclose(np.asarray(culled["density"]),
                               np.asarray(base["density"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(culled["rgb"]),
                               np.asarray(base["rgb"]), rtol=1e-6)


def test_empty_cells_zero_density():
    from samnerf_tpu.fields.nerfacto_field import HashMLPDensityField

    res = 8
    cells = np.zeros((res, res, res), np.float32)
    cells[:4] = 1.0          # x-unit < 0.5 occupied, >= 0.5 empty
    occ = occ_ops.pack_serve_occupancy(cells)
    field = HashMLPDensityField(num_levels=2, max_res=32,
                                log2_hashmap_size=10, occ_res=res)
    # contracted-unit x = (contract(x)+2)/4 > 0.75 needs world x far out;
    # use points whose unit coords are clearly on each side + away from
    # the dilation boundary
    occ_world = jnp.asarray([[-1.4, 0.0, 0.0]]).reshape(1, 1, 3)  # unit x~.15
    empty_world = jnp.asarray([[1.4, 0.0, 0.0]]).reshape(1, 1, 3)  # unit x~.85
    params = field.init(jax.random.PRNGKey(0), occ_world)
    d_occ = field.apply(params, occ_world, occ=occ)
    d_empty = field.apply(params, empty_world, occ=occ)
    d_base = field.apply(params, occ_world)
    assert float(d_empty[0, 0, 0]) == 0.0
    np.testing.assert_allclose(np.asarray(d_occ), np.asarray(d_base),
                               rtol=1e-6)


def test_model_occupancy_plumbing_and_bake():
    from samnerf_tpu.core.rays import RayBundle
    from samnerf_tpu.engine.eval_render import bake_occupancy
    from samnerf_tpu.models.sam_model import SAMModel, SAMModelConfig

    cfg = SAMModelConfig(
        num_levels=2, max_res=32, log2_hashmap_size=10,
        num_proposal_samples_per_ray=(4,), num_nerf_samples_per_ray=4,
        proposal_net_args=({"hidden_dim": 8, "log2_hashmap_size": 10,
                            "num_levels": 2, "max_res": 16},),
        hashgrid_layers=(2, 2), hashgrid_resolutions=((4, 8), (8, 16)),
        hashgrid_sizes=(10, 10), num_sam_samples=2, occ_res=8)
    model = SAMModel(cfg)
    n = 16
    d = np.random.default_rng(0).normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rb = RayBundle(origins=jnp.zeros((n, 3)),
                   directions=jnp.asarray(d, jnp.float32),
                   pixel_area=jnp.ones((n, 1)) * 1e-6,
                   camera_indices=jnp.zeros((n, 1), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), rb, rng=jax.random.PRNGKey(1),
                        train=False)
    occ, frac = bake_occupancy(model, params, res=8, sub=1, chunk=256,
                               threshold=-1.0)   # everything occupied
    assert frac == 1.0
    base = model.apply(params, rb, train=False)
    culled = model.apply(params, rb, train=False, occupancy=occ)
    np.testing.assert_allclose(np.asarray(culled["rgb"]),
                               np.asarray(base["rgb"]), rtol=1e-5, atol=1e-6)
    # an all-empty grid kills every sample: accumulation becomes 0
    occ0 = occ_ops.pack_serve_occupancy(np.zeros((8, 8, 8), np.float32))
    out0 = model.apply(params, rb, train=False, occupancy=occ0)
    np.testing.assert_allclose(np.asarray(out0["accumulation"]), 0.0,
                               atol=1e-6)


def test_renderer_occ_roundtrip():
    from samnerf_tpu.core.cameras import Cameras
    from samnerf_tpu.engine.eval_render import ImageRenderer
    from samnerf_tpu.models.sam_model import SAMModel, SAMModelConfig
    from samnerf_tpu.core.rays import RayBundle

    cfg = SAMModelConfig(
        num_levels=2, max_res=32, log2_hashmap_size=10,
        num_proposal_samples_per_ray=(4,), num_nerf_samples_per_ray=4,
        proposal_net_args=({"hidden_dim": 8, "log2_hashmap_size": 10,
                            "num_levels": 2, "max_res": 16},),
        distill_sam=False, occ_res=8)
    model = SAMModel(cfg)
    n = 8
    rb = RayBundle(origins=jnp.zeros((n, 3)),
                   directions=jnp.eye(3)[jnp.zeros((n,), jnp.int32)],
                   pixel_area=jnp.ones((n, 1)) * 1e-6,
                   camera_indices=jnp.zeros((n, 1), jnp.int32))
    params = model.init(jax.random.PRNGKey(0), rb, rng=jax.random.PRNGKey(1),
                        train=False)
    cams = Cameras(camera_to_worlds=jnp.eye(4)[None, :3, :4],
                   fx=jnp.asarray([[20.0]]), fy=jnp.asarray([[20.0]]),
                   cx=jnp.asarray([[8.0]]), cy=jnp.asarray([[8.0]]),
                   width=16, height=16)
    r = ImageRenderer(model, chunk=64)
    occ = occ_ops.pack_serve_occupancy(np.ones((8, 8, 8), np.float32))
    base = r.render_image(params, cams, 0)
    culled = r.render_image(params, cams, 0, occ=occ)
    np.testing.assert_allclose(culled["rgb"], base["rgb"], rtol=1e-5,
                               atol=1e-6)
