"""Decoder export (StableHLO) + dynamic batch controller."""
import numpy as np

import jax
import jax.numpy as jnp

from samnerf_tpu.engine.dynamic_batch import (DynamicBatchConfig,
                                              DynamicBatchController)


def test_dynamic_batch_buckets():
    c = DynamicBatchController(
        DynamicBatchConfig(target_num_samples=1 << 16),
        initial_rays_per_batch=1 << 12)
    assert c.rays_per_batch == 1 << 12
    # 32 samples/ray measured -> target/32 = 2048 rays
    n = c.update(measured_num_samples=(1 << 12) * 32)
    assert n == 2048
    # very sparse scene (1 sample/ray) -> capped at max
    n = c.update(measured_num_samples=n * 1)
    assert n == DynamicBatchConfig().max_num_rays_per_batch
    # extremely dense -> floor at min
    n = c.update(measured_num_samples=n * 10000)
    assert n == DynamicBatchConfig().min_num_rays_per_batch


def test_sam_decoder_export_roundtrip():
    from samnerf_tpu.perception.sam import export as ex
    from samnerf_tpu.perception.sam.build_sam import sam_model_registry
    from samnerf_tpu.perception.sam.sam import Sam

    sam, _ = sam_model_registry["vit_b"]()
    emb = jnp.zeros((1, 64, 64, 256))
    pts = (jnp.zeros((1, 3, 2)), -jnp.ones((1, 3), jnp.int32))
    params = sam.init(jax.random.PRNGKey(0), emb, pts, None, None, False,
                      method=Sam.decode_masks)
    exp = ex.export_decoder(sam, params, num_points=3)
    assert len(exp.artifact) > 1000
    coords = jnp.asarray([[[4.0, 4.0], [0, 0], [0, 0]]])
    labels = jnp.asarray([[1, -1, -1]], jnp.int32)
    low_res, iou = ex.load_and_run(exp.artifact, emb, coords, labels)
    ref_low, ref_iou = sam.apply(params, emb, (coords, labels), None, None,
                                 False, method=Sam.decode_masks)
    np.testing.assert_allclose(np.asarray(low_res), np.asarray(ref_low),
                               rtol=1e-5, atol=1e-5)


def test_sds_gradient_shape_and_surrogate():
    from samnerf_tpu.generative.stable_diffusion import sds_gradient, sds_loss

    def denoise_fn(noisy, t, emb):
        return noisy * 0.5  # toy score model

    lat = jnp.ones((1, 8, 8, 4)) * 0.3
    emb = jnp.zeros((1, 16))
    ac = jnp.linspace(0.999, 0.01, 100)
    g = sds_gradient(denoise_fn, lat, emb, jax.random.PRNGKey(0), ac)
    assert g.shape == lat.shape
    grad = jax.grad(lambda l: sds_loss(denoise_fn, l, emb,
                                       jax.random.PRNGKey(0), ac))(lat)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g), rtol=1e-6)


def test_plugin_discovery_empty():
    from samnerf_tpu.utils.plugins import discover_methods
    assert discover_methods() == {}
