"""512^2 full-capacity serve-frame timing: v4 kernel + 2D-block ordering,
with and without occupancy culling and reduced serve top-k.

Random-init weights (throughput only); occupancy uses an analytic
~scene-shaped grid (ball + ground slab in contracted space, ~10-15%
occupied) since random-init density thresholds to all-occupied.

Run: python scripts/bench_frame_v4.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def analytic_cells(res):
    """Ball + ground-slab occupancy in contracted-unit space."""
    c = (np.arange(res) + 0.5) / res
    x, y, z = np.meshgrid(c, c, c, indexing="ij")
    ball = ((x - 0.5) ** 2 + (y - 0.55) ** 2 + (z - 0.5) ** 2) < 0.12 ** 2
    ground = (y > 0.40) & (y < 0.45) & (abs(x - 0.5) < 0.22) \
        & (abs(z - 0.5) < 0.22)
    return (ball | ground).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from samnerf_tpu.core.cameras import Cameras
    from samnerf_tpu.core.rays import RayBundle
    from samnerf_tpu.engine.eval_render import ImageRenderer
    from samnerf_tpu.models.sam_model import SAMModel, SAMModelConfig
    from samnerf_tpu.ops.occupancy import pack_serve_occupancy

    H = W = 512
    res = 96
    occ = pack_serve_occupancy(analytic_cells(res))
    print(f"occupied fraction: {analytic_cells(res).mean():.3f}", flush=True)

    def cam_at(i):
        ang = 0.02 * i
        c = np.eye(4)[:3, :4].astype(np.float32)
        c[0, 3] = 1.5 * np.sin(ang)
        c[2, 3] = 1.5 * np.cos(ang)
        return Cameras(
            camera_to_worlds=jnp.asarray(c[None]),
            fx=jnp.asarray([[400.0]]), fy=jnp.asarray([[400.0]]),
            cx=jnp.asarray([[W / 2.0]]), cy=jnp.asarray([[H / 2.0]]),
            width=W, height=H)

    def run_variant(tag, cfg, use_occ):
        model = SAMModel(cfg)
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
        renderer = ImageRenderer(model, chunk=1 << 15)
        feats = ("sam", "clipseg")
        kw = {"occ": occ} if use_occ else {}

        def frame(i):
            return renderer.render_image_device(params, cam_at(i), 0, W, H,
                                                features=feats, **kw)

        t0 = time.time()
        out = frame(0)
        fetched = {k: np.asarray(v) for k, v in out.items()}
        print(f"  [{tag}] compile+first: {time.time()-t0:.1f}s "
              f"sam={fetched['sam'].shape}", flush=True)
        # pipelined: submit i+1 before fetching i (device/host overlap)
        n = 6
        t0 = time.time()
        pending = frame(1)
        for i in range(1, n + 1):
            nxt = frame(1 + i) if i < n else None
            np.asarray(pending["rgb"])
            np.asarray(pending["sam"])
            pending = nxt
        dt = (time.time() - t0) / n
        print(f"  [{tag}] {dt*1e3:.0f} ms/frame  ({1.0/dt:.2f} FPS)",
              flush=True)

    base = SAMModelConfig(distill_sam=True, use_clipseg_feature=True,
                          hash_q8_serve=True, hash_fn="morton")
    run_variant("q8+morton (r2 config)", base, False)
    run_variant("+occupancy", base, True)
    import dataclasses
    run_variant("+occ+topk8",
                dataclasses.replace(base, num_sam_samples=8), True)


if __name__ == "__main__":
    main()
