"""SAMModel forward/grad smoke tests (tiny shapes, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from samnerf_tpu.core.rays import RayBundle
from samnerf_tpu.models.sam_model import (SAMModel, SAMModelConfig,
                                          get_loss_dict, proposal_anneal_value,
                                          proposal_grad_gate)

TINY = SAMModelConfig(
    num_levels=4, max_res=64, log2_hashmap_size=10,
    num_proposal_samples_per_ray=(8,), num_nerf_samples_per_ray=8,
    proposal_net_args=({"hidden_dim": 8, "log2_hashmap_size": 8,
                        "num_levels": 2, "max_res": 32},),
    hashgrid_layers=(2, 2), hashgrid_resolutions=((16, 32), (32, 64)),
    hashgrid_sizes=(8, 8), num_sam_samples=4, patch_size=2,
)


def make_bundle(n, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.1),
        directions=jnp.asarray(d.astype(np.float32)),
        pixel_area=jnp.ones((n, 1)) * 1e-6,
        camera_indices=jnp.zeros((n, 1), jnp.int32))


def test_forward_shapes_train():
    model = SAMModel(TINY)
    rb = make_bundle(16)  # 4 patches of 2x2
    params = model.init(jax.random.PRNGKey(0), rb,
                        rng=jax.random.PRNGKey(1), train=True,
                        get_features=("sam", "clipseg"))
    out = model.apply(params, rb, rng=jax.random.PRNGKey(2), train=True,
                      get_features=("sam", "clipseg"))
    assert out["rgb"].shape == (16, 3)
    assert out["depth"].shape == (16, 1)
    assert out["accumulation"].shape == (16, 1)
    assert out["sam"].shape == (4, 256)       # 16 rays / 2x2 patches
    assert out["clipseg"].shape == (16, 192)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    # param groups at top level match reference optimizer groups
    keys = set(params["params"].keys())
    assert {"fields", "proposal_networks_0", "sam_field", "conv"} <= keys


def test_loss_and_grads():
    model = SAMModel(TINY)
    rb = make_bundle(16)
    params = model.init(jax.random.PRNGKey(0), rb, rng=jax.random.PRNGKey(1),
                        train=True, get_features=("sam", "clipseg"))
    batch = {
        "image": jnp.ones((16, 3)) * 0.5,
        "sam": jnp.zeros((4, 256)),
        "clipseg": jnp.zeros((16, 192)),
    }

    def loss_fn(p):
        out = model.apply(p, rb, rng=jax.random.PRNGKey(2), train=True,
                          get_features=("sam", "clipseg"))
        ld = get_loss_dict(TINY, out, batch)
        return sum(ld.values()), ld

    (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert {"rgb_loss", "interlevel_loss", "distortion_loss", "sam_loss",
            "clipseg_loss"} <= set(ld.keys())
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # field grads nonzero
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(
        grads["params"]["fields"]))
    assert gsum > 0


def test_eval_mode_no_feature():
    model = SAMModel(TINY)
    rb = make_bundle(8)
    params = model.init(jax.random.PRNGKey(0), rb, rng=jax.random.PRNGKey(1),
                        train=True, get_features=("sam",))
    out = model.apply(params, rb, train=False, get_features=())
    assert "sam" not in out and "weights_list" not in out
    assert "prop_depth_0" in out


def test_anneal_and_gate_schedules():
    assert float(proposal_anneal_value(TINY, jnp.asarray(0))) == 0.0
    assert abs(float(proposal_anneal_value(TINY, jnp.asarray(10 ** 9))) - 1.0) < 1e-6
    g_early = proposal_grad_gate(TINY, jnp.asarray(5), jnp.asarray(0))
    assert float(g_early) == 1.0  # always update in first 10 steps
    g_skip = proposal_grad_gate(TINY, jnp.asarray(6000), jnp.asarray(1))
    assert float(g_skip) == 0.0
    g_due = proposal_grad_gate(TINY, jnp.asarray(6000), jnp.asarray(6))
    assert float(g_due) == 1.0


def test_serve_early_termination():
    """serve_transmittance_eps culls only eps-bounded contributions:
    a huge eps blanks far samples; a tiny eps reproduces the exact
    render; train mode is never affected by the config."""
    import dataclasses

    model = SAMModel(TINY)
    rb = make_bundle(16)
    params = model.init(jax.random.PRNGKey(0), rb,
                        rng=jax.random.PRNGKey(1), train=True,
                        get_features=("sam", "clipseg"))

    base = model.apply(params, rb, train=False,
                       get_features=("sam", "clipseg"))

    et_tiny = SAMModel(dataclasses.replace(
        TINY, serve_transmittance_eps=1e-12))
    out = et_tiny.apply(params, rb, train=False,
                        get_features=("sam", "clipseg"))
    # estimated transmittance stays ~1 on a random-init field (densities
    # tiny), so nothing is culled and the render is bitwise-identical
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(base["rgb"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["sam"]),
                               np.asarray(base["sam"]), atol=1e-5)

    et_all = SAMModel(dataclasses.replace(
        TINY, serve_transmittance_eps=1.1))   # T<=1 < eps: all culled
    out2 = et_all.apply(params, rb, train=False,
                        get_features=("sam", "clipseg"))
    assert float(np.abs(np.asarray(out2["accumulation"])).max()) == 0.0

    # train path ignores the knob entirely
    tr_base = model.apply(params, rb, rng=jax.random.PRNGKey(2), train=True)
    tr_et = et_all.apply(params, rb, rng=jax.random.PRNGKey(2), train=True)
    np.testing.assert_allclose(np.asarray(tr_et["rgb"]),
                               np.asarray(tr_base["rgb"]), atol=1e-6)
