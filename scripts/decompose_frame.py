"""Decompose the 512^2 serve frame's time: rgb pass vs feature grids vs
decode, and the raw hash-encode share at frame shapes.

Run on the real TPU: python scripts/decompose_frame.py [--q8] [--morton]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, *args, reps=3):
    """Min wall time over reps with byte-varying inputs already supplied
    by the caller (the tunnel content-caches identical dispatches)."""
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q8", action="store_true")
    ap.add_argument("--morton", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from samnerf_tpu.core.cameras import Cameras
    from samnerf_tpu.engine.eval_render import ImageRenderer
    from samnerf_tpu.models.sam_model import SAMModel, SAMModelConfig

    cfg = SAMModelConfig(num_images=4, hash_q8_serve=args.q8,
                         hash_fn="morton" if args.morton else "reference")
    model = SAMModel(cfg)
    print(f"q8={args.q8} hash_fn={cfg.hash_fn}")

    c2w0 = np.eye(4)[None, :3, :4].astype(np.float32).repeat(4, 0)
    cams = Cameras(camera_to_worlds=jnp.asarray(c2w0),
                   fx=jnp.full((4, 1), 400.0), fy=jnp.full((4, 1), 400.0),
                   cx=jnp.full((4, 1), 256.0), cy=jnp.full((4, 1), 256.0),
                   width=512, height=512)
    from samnerf_tpu.core.rays import RayBundle
    rng = np.random.RandomState(0)
    d = rng.randn(64, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rb = RayBundle(origins=jnp.zeros((64, 3)),
                   directions=jnp.asarray(d.astype(np.float32)),
                   pixel_area=jnp.ones((64, 1)) * 1e-6,
                   camera_indices=jnp.zeros((64, 1), jnp.int32))
    t0 = time.time()
    params = jax.jit(lambda r, b: model.init(
        r, b, rng=r, train=True, get_features=("sam", "clipseg")))(
            jax.random.PRNGKey(0), rb)
    print(f"init {time.time()-t0:.0f}s")

    def cam_at(i):
        c = np.eye(4)[:3, :4].astype(np.float32)
        c[0, 3] = 0.02 * (i + 1)
        c[2, 3] = 1.5
        return Cameras(camera_to_worlds=jnp.asarray(c[None]),
                       fx=jnp.asarray([[400.0]]), fy=jnp.asarray([[400.0]]),
                       cx=jnp.asarray([[256.0]]), cy=jnp.asarray([[256.0]]),
                       width=512, height=512)

    renderer = ImageRenderer(model, chunk=1 << 13)

    # 1) rgb-only 512^2
    t0 = time.time()
    renderer.render_image(params, cam_at(0), 0, 512, 512, features=())
    print(f"rgb-only compile+1: {time.time()-t0:.0f}s")
    ts = []
    for i in range(3):
        t0 = time.time()
        renderer.render_image(params, cam_at(i + 1), 0, 512, 512,
                              features=())
        ts.append(time.time() - t0)
    rgb_ms = min(ts) * 1e3
    print(f"rgb-only frame: {rgb_ms:.0f} ms")

    # 2) full frame (rgb + sam + clipseg grids)
    t0 = time.time()
    renderer.render_image(params, cam_at(0), 0, 512, 512,
                          features=("sam", "clipseg"))
    print(f"full compile+1: {time.time()-t0:.0f}s")
    ts = []
    for i in range(3):
        t0 = time.time()
        renderer.render_image(params, cam_at(i + 1), 0, 512, 512,
                              features=("sam", "clipseg"))
        ts.append(time.time() - t0)
    full_ms = min(ts) * 1e3
    print(f"full frame: {full_ms:.0f} ms  (features add {full_ms-rgb_ms:.0f})")

    # 3) raw nerf-field hash encode at frame scale: 8192x(32+1) points
    from samnerf_tpu.fields.hash_encoding import ParityHashEncoding
    enc = ParityHashEncoding(num_levels=cfg.num_levels,
                             min_res=16, max_res=cfg.max_res,
                             log2_hashmap_size=cfg.log2_hashmap_size,
                             features_per_level=2,
                             quantize_serve=args.q8, hash_fn=cfg.hash_fn)
    n = (1 << 13) * 32
    pts0 = rng.uniform(0.2, 0.8, size=(n, 3)).astype(np.float32)
    ep = enc.init(jax.random.PRNGKey(0), jnp.asarray(pts0))
    f = jax.jit(lambda p, x: enc.apply(p, x))
    f(ep, jnp.asarray(pts0))
    ts = []
    for i in range(3):
        pts = jnp.asarray(pts0 + 0.001 * (i + 1))
        t0 = time.time()
        np.asarray(f(ep, pts))
        ts.append(time.time() - t0)
    enc_ms = min(ts) * 1e3
    chunks = (512 * 512) // (1 << 13)
    print(f"nerf-field encode per chunk ({n} pts): {enc_ms:.1f} ms "
          f"-> x{chunks} chunks = {enc_ms*chunks:.0f} ms/frame est")


if __name__ == "__main__":
    main()
