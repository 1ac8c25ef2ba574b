"""Train-step + frame timing at REFERENCE capacity (2^19/2^17 tables).

Validates VERDICT item #2: samnerf_distill trains at reference table
sizes; records step time and single-chip frame rate.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--serve-only", action="store_true",
                    help="skip training; frame timing only")
    ap.add_argument("--q8", action="store_true")
    ap.add_argument("--morton", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from samnerf_tpu.core.cameras import Cameras, generate_rays
    from samnerf_tpu.engine.optimizers import (OptimizerGroupConfig,
                                               build_optimizer)
    from samnerf_tpu.engine.trainer import TrainState, make_train_step
    from samnerf_tpu.models.sam_model import SAMModel, SAMModelConfig

    cfg = SAMModelConfig(num_images=4,   # reference-capacity defaults
                         hash_q8_serve=args.q8,
                         hash_fn="morton" if args.morton else "reference")
    model = SAMModel(cfg)
    print(f"capacity: nerf 2^{cfg.log2_hashmap_size}, "
          f"sam {cfg.hashgrid_sizes}, "
          f"prop {[a['log2_hashmap_size'] for a in cfg.proposal_net_args]}, "
          f"q8={args.q8}, hash_fn={cfg.hash_fn}")

    n_rays = 16384
    c2w = np.eye(4)[None, :3, :4].astype(np.float32).repeat(4, 0)
    cameras = Cameras(camera_to_worlds=jnp.asarray(c2w),
                      fx=jnp.full((4, 1), 300.0), fy=jnp.full((4, 1), 300.0),
                      cx=jnp.full((4, 1), 200.0), cy=jnp.full((4, 1), 200.0),
                      width=400, height=400)
    rng = np.random.RandomState(0)
    indices = np.stack([rng.randint(0, 4, n_rays).astype(np.int32),
                        rng.randint(0, 398, n_rays).astype(np.int32),
                        rng.randint(0, 398, n_rays).astype(np.int32)], -1)
    batch = {
        "indices": jnp.asarray(indices),
        "image": jnp.full((n_rays, 3), 0.5),
        "sam": jnp.zeros((n_rays // cfg.patch_size ** 2, 256)),
        "clipseg": jnp.zeros((n_rays, 192)),
    }
    bundle = generate_rays(cameras, batch["indices"][:, 0],
                           batch["indices"][:, 1:])

    t0 = time.time()
    params = jax.jit(lambda r, b: model.init(
        r, b, rng=r, train=True, get_features=("sam", "clipseg")))(
            jax.random.PRNGKey(0), bundle)
    nbytes = sum(x.nbytes for x in jax.tree.leaves(params))
    print(f"init: {time.time()-t0:.0f}s, params {nbytes/1e6:.0f} MB")

    if args.serve_only:
        from samnerf_tpu.engine.eval_render import ImageRenderer
        renderer = ImageRenderer(model, chunk=1 << 13)
        cam = Cameras(camera_to_worlds=jnp.asarray(c2w[:1]),
                      fx=jnp.asarray([[400.0]]), fy=jnp.asarray([[400.0]]),
                      cx=jnp.asarray([[256.0]]), cy=jnp.asarray([[256.0]]),
                      width=512, height=512)
        t0 = time.time()
        renderer.render_image(params, cam, 0, 512, 512,
                              features=("sam", "clipseg"))
        print(f"frame compile+1: {time.time()-t0:.0f}s")
        # vary the camera so the tunnel cannot replay cached results
        times = []
        for i in range(3):
            c2 = np.eye(4)[:3, :4].astype(np.float32)
            c2[0, 3] = 0.02 * (i + 1)
            c2[2, 3] = 1.5
            cam_i = Cameras(camera_to_worlds=jnp.asarray(c2[None]),
                            fx=jnp.asarray([[400.0]]),
                            fy=jnp.asarray([[400.0]]),
                            cx=jnp.asarray([[256.0]]),
                            cy=jnp.asarray([[256.0]]),
                            width=512, height=512)
            t0 = time.time()
            renderer.render_image(params, cam_i, 0, 512, 512,
                                  features=("sam", "clipseg"))
            times.append(time.time() - t0)
        dt = min(times)
        print(f"frame: {dt*1e3:.0f} ms = {1/dt:.2f} FPS")
        return

    groups = {k: OptimizerGroupConfig() for k in
              ("proposal_networks", "fields", "sam_field", "conv")}
    optimizer = build_optimizer(groups, params)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.asarray(0, jnp.int32),
                       steps_since_update=jnp.asarray(0, jnp.int32))
    step_fn = jax.jit(make_train_step(model, cfg, optimizer,
                                      ("sam", "clipseg")),
                      donate_argnums=(0,))
    t0 = time.time()
    state, metrics = step_fn(state, cameras, batch, jax.random.PRNGKey(2))
    print(f"train step compile+1: {time.time()-t0:.0f}s, "
          f"loss {float(metrics['total_loss']):.4f}")
    # timed steps (distinct rng per step; content-cache-proof)
    t0 = time.time()
    n = 10
    for i in range(n):
        state, metrics = step_fn(state, cameras, batch,
                                 jax.random.PRNGKey(3 + i))
    jax.block_until_ready(metrics)
    lm = float(metrics["total_loss"])   # forces completion via fetch
    dt = (time.time() - t0) / n
    print(f"train step: {dt*1e3:.0f} ms ({16384/dt/1e3:.0f}K rays/s), "
          f"loss {lm:.4f}")

    # frame render 512^2 with features
    from samnerf_tpu.engine.eval_render import ImageRenderer
    renderer = ImageRenderer(model, chunk=1 << 13)
    cam = Cameras(camera_to_worlds=jnp.asarray(c2w[:1]),
                  fx=jnp.asarray([[400.0]]), fy=jnp.asarray([[400.0]]),
                  cx=jnp.asarray([[256.0]]), cy=jnp.asarray([[256.0]]),
                  width=512, height=512)
    t0 = time.time()
    out = renderer.render_image(state.params, cam, 0, 512, 512,
                                features=("sam", "clipseg"))
    print(f"frame compile+1: {time.time()-t0:.0f}s")
    t0 = time.time()
    out = renderer.render_image(state.params, cam, 0, 512, 512,
                                features=("sam", "clipseg"))
    dt = time.time() - t0
    print(f"frame: {dt*1e3:.0f} ms = {1/dt:.2f} FPS "
          f"(rgb {out['rgb'].shape}, sam {out['sam'].shape})")


if __name__ == "__main__":
    main()
