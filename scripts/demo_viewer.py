"""Boot the interactive viewer on a tiny random-weight scene.

Usage: python scripts/demo_viewer.py [--ws-port 7007] [--http-port 7008]
Then open http://localhost:<http-port>/?port=<ws-port> in a browser.

This is the smallest end-to-end serving stack: tiny distilled SAMModel +
random-weight SAM decoder, the same wiring as a post-training viewer
session (reference: `ns-viewer` / trainer-attached viewer,
``nerfstudio/viewer/server/viewer_state.py``).
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ws-port", type=int, default=7007)
    ap.add_argument("--http-port", type=int, default=7008)
    ap.add_argument("--max-res", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from samnerf_tpu.core.rays import RayBundle
    from samnerf_tpu.engine.render_pipeline import SamNerfRenderer
    from samnerf_tpu.models.sam_model import SAMModel, SAMModelConfig
    from samnerf_tpu.perception.sam.build_sam import build_sam
    from samnerf_tpu.perception.sam.predictor import SamPredictor
    from samnerf_tpu.viewer.server import serve_client
    from samnerf_tpu.viewer.viewer_state import ViewerState

    cfg = SAMModelConfig(
        num_levels=2, max_res=64, log2_hashmap_size=10,
        num_proposal_samples_per_ray=(16,), num_nerf_samples_per_ray=8,
        proposal_net_args=({"hidden_dim": 8, "log2_hashmap_size": 8,
                            "num_levels": 2, "max_res": 32},),
        hashgrid_layers=(2, 2), hashgrid_resolutions=((16, 32), (32, 64)),
        hashgrid_sizes=(8, 8), num_sam_samples=4, patch_size=2,
        distill_sam=True, use_clipseg_feature=False, far_plane=6.0)
    model = SAMModel(cfg)

    rng = np.random.RandomState(0)
    d = rng.randn(16, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rb = RayBundle(origins=jnp.zeros((16, 3)),
                   directions=jnp.asarray(d.astype(np.float32)),
                   pixel_area=jnp.ones((16, 1)) * 1e-6,
                   camera_indices=jnp.zeros((16, 1), jnp.int32))
    params = jax.jit(lambda r, b: model.init(
        r, b, rng=r, train=True, get_features=("sam",)))(
            jax.random.PRNGKey(0), rb)

    sam, _ = build_sam("vit_b")
    sam_params = jax.jit(lambda r: sam.init(
        r, jnp.zeros((1, 16, 16, 3)),
        points=(jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), jnp.int32))))(
        jax.random.PRNGKey(1))
    predictor = SamPredictor(sam, sam_params)

    renderer = SamNerfRenderer(model, sam_predictor=predictor, chunk=2048)
    state = ViewerState(renderer, params_fn=lambda: params, cameras=None,
                        host="0.0.0.0", port=args.ws_port,
                        max_res=args.max_res)
    state.start()
    state.init_scene()
    serve_client(http_port=args.http_port, ws_port=args.ws_port)
    print(f"viewer ready: http://localhost:{args.http_port}/"
          f"?port={args.ws_port}", flush=True)
    while True:
        time.sleep(3600)


if __name__ == "__main__":
    main()
