"""Every non-flagship model family: forward, loss, grads finite."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samnerf_tpu.core.rays import RayBundle


def _bundle(n=32, with_times=False, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.asarray(rng.randn(n, 3).astype(np.float32)) * 0.1,
        directions=jnp.asarray(d.astype(np.float32)),
        pixel_area=jnp.ones((n, 1)) * 1e-6,
        camera_indices=jnp.zeros((n, 1), jnp.int32),
        times=(jnp.asarray(rng.rand(n, 1).astype(np.float32))
               if with_times else None))


def _check(model, cfg, loss_fn, rb, batch, needs_params_in_loss=False):
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, rb, rng=rng, train=True)

    def total_loss(p):
        out = model.apply(p, rb, rng=rng, train=True)
        if needs_params_in_loss:
            losses = loss_fn(cfg, p, out, batch)
        else:
            losses = loss_fn(out, batch)
        return sum(jax.tree.leaves(losses))

    loss, grads = jax.value_and_grad(total_loss)(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # eval-mode forward
    out = model.apply(params, rb, train=False)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert out["rgb"].shape == (rb.origins.shape[0], 3)


def test_vanilla_nerf():
    from samnerf_tpu.models import vanilla_nerf as m
    cfg = m.VanillaNerfConfig(num_coarse_samples=8, num_importance_samples=8,
                              hidden_dim=16)
    rb = _bundle()
    batch = {"image": jnp.full((32, 3), 0.5)}
    _check(m.VanillaNerfModel(cfg), cfg, m.get_loss_dict, rb, batch)


def test_mipnerf():
    from samnerf_tpu.models import mipnerf as m
    cfg = m.MipNerfConfig(num_coarse_samples=8, num_importance_samples=8,
                          hidden_dim=16, pos_frequencies=4)
    rb = _bundle()
    batch = {"image": jnp.full((32, 3), 0.5)}
    _check(m.MipNerfModel(cfg), cfg, m.get_loss_dict, rb, batch)


def test_instant_ngp_with_occupancy():
    from samnerf_tpu.models import instant_ngp as m
    from samnerf_tpu.ops.occupancy import update_occupancy
    cfg = m.InstantNGPConfig(num_samples=16, num_levels=4, max_res=64,
                             log2_hashmap_size=10, grid_resolution=8)
    model = m.InstantNGPModel(cfg)
    rb = _bundle()
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, rb, rng=rng, train=True)
    aabb = jnp.asarray([[-1.0, -1, -1], [1, 1, 1]])
    gd, occ = update_occupancy(
        jnp.zeros((8 ** 3,)),
        lambda p: model.apply(params, p, method=m.InstantNGPModel.density_fn),
        aabb, jax.random.PRNGKey(1), num_samples=1024)
    out = model.apply(params, rb, rng=rng, train=True, occupancy=occ)
    losses = m.get_loss_dict(out, {"image": jnp.full((32, 3), 0.5)})
    assert np.isfinite(float(losses["rgb_loss"]))


def test_tensorf():
    from samnerf_tpu.models import tensorf as m
    cfg = m.TensoRFConfig(num_uniform_samples=12, num_samples=6,
                          resolution=16, density_components=4,
                          color_components=4, appearance_dim=8)
    model = m.TensoRFModel(cfg)
    rb = _bundle()
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, rb, rng=rng, train=True)
    batch = {"image": jnp.full((32, 3), 0.5)}

    def total_loss(p):
        out = model.apply(p, rb, rng=rng, train=True)
        return sum(jax.tree.leaves(m.get_loss_dict(cfg, p, out, batch)))

    loss, grads = jax.value_and_grad(total_loss)(params)
    assert np.isfinite(float(loss))
    assert sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)) > 0


def test_depth_nerfacto():
    from samnerf_tpu.models import depth_nerfacto as m
    from samnerf_tpu.models.sam_model import SAMModelConfig
    base = SAMModelConfig(
        distill_sam=False, num_levels=4, max_res=64, log2_hashmap_size=10,
        num_proposal_samples_per_ray=(8,), num_nerf_samples_per_ray=8,
        proposal_net_args=({"hidden_dim": 8, "log2_hashmap_size": 10,
                            "num_levels": 2, "max_res": 32},))
    cfg = m.DepthNerfactoConfig(base=base)
    model = m.DepthNerfactoModel(base)
    rb = _bundle()
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, rb, rng=rng, train=True)
    out = model.apply(params, rb, rng=rng, train=True)
    batch = {"image": jnp.full((32, 3), 0.5),
             "depth_image": jnp.ones((32, 1)) * 2.0}
    losses = m.get_loss_dict(cfg, out, batch)
    assert "depth_loss" in losses
    assert np.isfinite(float(sum(jax.tree.leaves(losses))))


def test_semantic_nerfw():
    from samnerf_tpu.models import semantic_nerfw as m
    from samnerf_tpu.models.sam_model import SAMModelConfig
    base = SAMModelConfig(
        distill_sam=False, num_levels=4, max_res=64, log2_hashmap_size=10,
        num_proposal_samples_per_ray=(8,), num_nerf_samples_per_ray=8,
        proposal_net_args=({"hidden_dim": 8, "log2_hashmap_size": 10,
                            "num_levels": 2, "max_res": 32},))
    cfg = m.SemanticNerfWConfig(num_classes=5, base=base)
    model = m.SemanticNerfWModel(cfg)
    rb = _bundle()
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, rb, rng=rng, train=True)
    out = model.apply(params, rb, rng=rng, train=True)
    assert out["semantics"].shape == (32, 5)
    batch = {"image": jnp.full((32, 3), 0.5),
             "semantics": jnp.zeros((32, 1), jnp.int32)}
    losses = m.get_loss_dict(cfg, out, batch)
    assert "semantics_loss" in losses
    assert np.isfinite(float(sum(jax.tree.leaves(losses))))


def test_nerfplayer():
    from samnerf_tpu.models import nerfplayer as m
    cfg = m.NerfPlayerConfig(num_samples=8, num_levels=2, max_res=64,
                             log2_hashmap_size=10, num_time_steps=4,
                             hidden_dim=16)
    rb = _bundle(with_times=True)
    batch = {"image": jnp.full((32, 3), 0.5)}
    _check(m.NerfPlayerModel(cfg), cfg, m.get_loss_dict, rb, batch)
    # time matters: different t -> different rgb
    model = m.NerfPlayerModel(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, rb, rng=rng, train=True)
    out0 = model.apply(params, rb.replace(times=jnp.zeros((32, 1))),
                       train=False)
    out1 = model.apply(params, rb.replace(times=jnp.ones((32, 1))),
                       train=False)
    assert np.abs(np.asarray(out0["rgb"]) - np.asarray(out1["rgb"])).max() > 0


def test_zoo_registry_and_train_step():
    import optax
    from samnerf_tpu.configs.zoo import make_zoo_train_step, zoo_methods
    from samnerf_tpu.core.cameras import Cameras

    methods = zoo_methods()
    assert set(methods) == {"vanilla-nerf", "mipnerf", "instant-ngp",
                            "tensorf", "depth-nerfacto", "semantic-nerfw",
                            "nerfplayer-nerfacto", "nerfplayer-ngp"}

    # drive one optimization step for one representative method
    from samnerf_tpu.models import vanilla_nerf as m
    cfg = m.VanillaNerfConfig(num_coarse_samples=4, num_importance_samples=4,
                              hidden_dim=8)
    model = m.VanillaNerfModel(cfg)
    method = methods["vanilla-nerf"]
    c2w = jnp.eye(4)[None, :3, :4]
    cams = Cameras(camera_to_worlds=c2w, fx=jnp.asarray([[20.0]]),
                   fy=jnp.asarray([[20.0]]), cx=jnp.asarray([[16.0]]),
                   cy=jnp.asarray([[16.0]]), width=32, height=32)
    rng = jax.random.PRNGKey(0)
    idx = jnp.concatenate([jnp.zeros((16, 1), jnp.int32),
                           jnp.ones((16, 2), jnp.int32) * 5], axis=1)
    batch = {"indices": idx, "image": jnp.full((16, 3), 0.5)}
    rb = _bundle(16)
    params = model.init(rng, rb, rng=rng, train=True)
    opt = optax.adam(1e-3)
    step = jax.jit(make_zoo_train_step(method, model, cfg, opt))
    p2, o2, metrics = step(params, opt.init(params), cams, batch, rng)
    assert np.isfinite(float(metrics["total_loss"]))
    diff = sum(float(jnp.abs(a - b).sum()) for a, b in
               zip(jax.tree.leaves(params), jax.tree.leaves(p2)))
    assert diff > 0


def test_nerfplayer_ngp_occupancy_variant():
    """nerfplayer with an occupancy grid (reference nerfplayer_ngp.py):
    empty cells must zero the density -> empty-space rays render as
    background with ~zero accumulation."""
    from samnerf_tpu.models import nerfplayer as m

    cfg = m.NerfPlayerConfig(num_samples=8, num_levels=2, min_res=4,
                             max_res=16, log2_hashmap_size=8,
                             num_time_steps=2, hidden_dim=8, far_plane=4.0)
    model = m.NerfPlayerModel(cfg)
    rb = _bundle(8)
    params = model.init(jax.random.PRNGKey(0), rb, rng=jax.random.PRNGKey(1))
    occ_empty = jnp.zeros((8, 8, 8))
    out = model.apply(params, rb, rng=jax.random.PRNGKey(2), train=False,
                      occupancy=occ_empty)
    np.testing.assert_allclose(np.asarray(out["accumulation"]), 0.0,
                               atol=1e-6)
    occ_full = jnp.ones((8, 8, 8))
    out2 = model.apply(params, rb, rng=jax.random.PRNGKey(2), train=False,
                       occupancy=occ_full)
    assert float(jnp.max(out2["accumulation"])) > 0.0
    from samnerf_tpu.configs.zoo import zoo_methods
    assert "nerfplayer-ngp" in zoo_methods()
