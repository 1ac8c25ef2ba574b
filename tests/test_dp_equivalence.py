"""Data-parallel correctness: one train step on the 8-device mesh must
equal the same step on a 1-device mesh (the psum-averaged gradients are
mathematically identical to the unsharded batch gradient).

This is the numerical guarantee behind replacing the reference's DDP
all-reduce (``pipelines/base_pipeline.py:246-248``) with XLA collectives
over a jax.sharding mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from samnerf_tpu.core.cameras import Cameras, generate_rays
from samnerf_tpu.engine.optimizers import (OptimizerGroupConfig,
                                           build_optimizer)
from samnerf_tpu.engine.trainer import TrainState, make_train_step
from samnerf_tpu.models.sam_model import SAMModel, SAMModelConfig
from samnerf_tpu.parallel import mesh as mesh_lib

CFG = SAMModelConfig(
    num_levels=4, max_res=64, log2_hashmap_size=10,
    num_proposal_samples_per_ray=(8,), num_nerf_samples_per_ray=8,
    proposal_net_args=({"hidden_dim": 8, "log2_hashmap_size": 8,
                        "num_levels": 2, "max_res": 32},),
    hashgrid_layers=(2, 2), hashgrid_resolutions=((16, 32), (32, 64)),
    hashgrid_sizes=(8, 8), num_sam_samples=4, patch_size=2,
    distill_sam=True, use_clipseg_feature=True)


def _run_step(n_devices, model, batch, cameras, params):
    mesh = mesh_lib.make_mesh(n_devices)
    optimizer = build_optimizer(
        {k: OptimizerGroupConfig() for k in
         ("proposal_networks", "fields", "sam_field", "conv")}, params)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.asarray(0, jnp.int32),
                       steps_since_update=jnp.asarray(0, jnp.int32))
    repl = mesh_lib.replicated(mesh)
    data = mesh_lib.data_sharding(mesh)
    step_fn = jax.jit(
        make_train_step(model, CFG, optimizer, ("sam", "clipseg")),
        in_shardings=(repl, repl, {k: data for k in batch}, repl),
        out_shardings=(repl, repl))
    state = jax.device_put(state, repl)
    cameras = jax.device_put(cameras, repl)
    batch = {k: jax.device_put(v, data) for k, v in batch.items()}
    new_state, metrics = step_fn(state, cameras, batch,
                                 jax.random.PRNGKey(3))
    return new_state, metrics


def test_multichip_step_matches_single_device():
    assert len(jax.devices()) == 8
    model = SAMModel(CFG)
    num_rays = 64
    c2w = np.eye(4)[None, :3, :4].astype(np.float32)
    cameras = Cameras(camera_to_worlds=jnp.asarray(c2w),
                      fx=jnp.asarray([[20.0]]), fy=jnp.asarray([[20.0]]),
                      cx=jnp.asarray([[16.0]]), cy=jnp.asarray([[16.0]]),
                      width=32, height=32)
    rng = np.random.RandomState(0)
    indices = np.stack([np.zeros(num_rays, np.int32),
                        rng.randint(0, 30, num_rays).astype(np.int32),
                        rng.randint(0, 30, num_rays).astype(np.int32)], -1)
    batch = {
        "indices": jnp.asarray(indices),
        "image": jnp.asarray(rng.rand(num_rays, 3).astype(np.float32)),
        "sam": jnp.asarray(rng.randn(num_rays // 4, 256)
                           .astype(np.float32)),
        "clipseg": jnp.asarray(rng.randn(num_rays, 192)
                               .astype(np.float32)),
    }
    bundle = generate_rays(cameras, jnp.zeros((num_rays,), jnp.int32),
                           batch["indices"][:, 1:])
    params = jax.jit(lambda r, b: model.init(
        r, b, rng=r, train=True, get_features=("sam", "clipseg")))(
            jax.random.PRNGKey(0), bundle)

    s1, m1 = _run_step(1, model, batch, cameras, params)
    s8, m8 = _run_step(8, model, batch, cameras, params)

    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m8["total_loss"]), rtol=1e-5)
    # Updated params agree to within Adam-amplified reduction-order noise:
    # sharded partial-sum + psum reorders float additions, and Adam's
    # grad/(sqrt(v)+eps) normalization amplifies that where grad ~ 0 —
    # a single near-eps element can shift by up to ~lr.  Require almost
    # all elements tight and bound every element by 2*lr (the largest
    # possible one-step Adam update difference; lr = 1e-2 default).
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat8 = jax.tree_util.tree_leaves(s8.params)
    total = loose = 0
    for a, b in zip(flat1, flat8):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert d.max() <= 2e-2, d.max()
        loose += int((d > 3e-4).sum())
        total += d.size
    assert loose / total < 1e-5, (loose, total)
