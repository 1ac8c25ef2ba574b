"""Benchmark: 512x512 feature-rendered frame rate on one TPU chip.

Headline metric (BASELINE.json): FPS of rendering a 512^2 view *with* the
SAM feature grid (64x64x256) and ClipSeg grid (32x32x192) from a distilled
field — the step that replaces the reference's per-view SAM ViT-H encoder
(README.md:16).  vs_baseline is against the 30 FPS v5e-8 target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from samnerf_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from samnerf_tpu.core.cameras import Cameras
    from samnerf_tpu.engine.eval_render import ImageRenderer
    from samnerf_tpu.models.sam_model import SAMModel, SAMModelConfig
    from samnerf_tpu.core.rays import RayBundle

    H = W = 512
    cfg = SAMModelConfig(distill_sam=True, use_clipseg_feature=True)
    model = SAMModel(cfg)

    c2w = np.eye(4)[:3, :4].astype(np.float32)
    c2w[:, 3] = [0.0, 0.0, 1.5]
    cameras = Cameras(
        camera_to_worlds=jnp.asarray(c2w[None]),
        fx=jnp.asarray([[400.0]]), fy=jnp.asarray([[400.0]]),
        cx=jnp.asarray([[W / 2.0]]), cy=jnp.asarray([[H / 2.0]]),
        width=W, height=H)

    rng = np.random.RandomState(0)
    d = rng.randn(64, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rb = RayBundle(origins=jnp.zeros((64, 3)),
                   directions=jnp.asarray(d.astype(np.float32)),
                   pixel_area=jnp.ones((64, 1)) * 1e-6,
                   camera_indices=jnp.zeros((64, 1), jnp.int32))
    params = jax.jit(lambda r, b: model.init(
        r, b, rng=r, train=True, get_features=("sam", "clipseg")))(
            jax.random.PRNGKey(0), rb)

    # chunk 2^13 (vs the reference's 2^15, samconfigs.py:79): bounds the
    # XLA hash-gather working set; the whole frame is one jitted lax.map.
    renderer = ImageRenderer(model, chunk=1 << 13)
    feats = ("sam", "clipseg")
    # warmup/compile
    out = renderer.render_image(params, cameras, 0, features=feats)
    assert out["rgb"].shape == (H, W, 3) and out["sam"].shape == (64, 64, 256)

    n = 5
    t0 = time.time()
    for _ in range(n):
        out = renderer.render_image(params, cameras, 0, features=feats)
    dt = (time.time() - t0) / n
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "feature_render_512_fps",
        "value": round(fps, 3),
        "unit": "frames/s (512^2 rgb+depth + 64^2 SAM + 32^2 ClipSeg grids, 1 chip)",
        "vs_baseline": round(fps / 30.0, 4),
    }))


if __name__ == "__main__":
    main()
