"""Benchmark: end-to-end interactive SAM-NeRF frame rate on one TPU chip.

Measures the full serving path that replaces the reference's view-time
pipeline (``samnerf/sam_model.py:337-548``): render a 512^2 view (rgb +
depth + 64x64x256 SAM feature grid + 32x32x192 ClipSeg grid) from a
distilled field, decode a SAM mask from a click prompt with the rendered
embedding (``predictor.set_feature`` path), composite the masked overlay
— everything on device; only the final uint8 frame crosses to the host.

vs_baseline is against the 30 FPS v5e-8 target (BASELINE.json), i.e.
3.75 FPS/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from samnerf_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from samnerf_tpu.core.cameras import Cameras
    from samnerf_tpu.models.sam_model import SAMModel, SAMModelConfig
    from samnerf_tpu.core.rays import RayBundle
    from samnerf_tpu.perception.sam.build_sam import sam_model_registry
    from samnerf_tpu.perception.sam.sam import Sam, postprocess_masks

    import os
    # BENCH_RES exists for CPU smoke-testing the full bench path at tiny
    # scale (the published number is always the 512 default on TPU)
    H = W = int(os.environ.get("BENCH_RES", "512"))
    # serve-mode config: on-the-fly int8 tables (hash_q8_serve — pure
    # serving optimization, same trained f32 checkpoint) + the
    # locality-preserving hash (hash_fn="morton" — a train+serve mode
    # whose slab-skip makes coherent eval tiles cheap; quality parity
    # with the reference hash measured at 2^19 in docs/QUALITY_morton.md:
    # test PSNR 22.27 vs 22.28, SSIM 0.866 vs 0.869)
    cfg = SAMModelConfig(distill_sam=True, use_clipseg_feature=True,
                         hash_q8_serve=True, hash_fn="morton",
                         compute_dtype=(jnp.bfloat16
                                        if os.environ.get("BENCH_BF16")
                                        else jnp.float32))
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
    import dataclasses

    ckpt_dir = os.environ.get("BENCH_CKPT", "")
    train_steps = int(os.environ.get("BENCH_TRAIN", "500"))
    occ_frac = None
    # early termination measured NEGATIVE on TPU (round-3 sweep): off
    et = float(os.environ.get("BENCH_ET", "0"))
    trained = False
    if ckpt_dir:
        # serve a TRAINED checkpoint (BENCH_CKPT=<run dir with config.json>)
        # with the full serve-mode config: int8 tables + baked occupancy
        # culling + early ray termination (BENCH_ET eps, BENCH_OCC=0 off)
        from samnerf_tpu.utils.eval_utils import eval_setup
        trainer, _ = eval_setup(ckpt_dir)
        params = trainer.state.params
        model = SAMModel(dataclasses.replace(
            trainer.model.config, hash_q8_serve=True,
            serve_transmittance_eps=et))
        trained = True
    elif train_steps > 0:
        # Default: SHORT full-capacity training run on the synthetic
        # textured scene so the published FPS is a *trained* scene's —
        # occupancy culling + early termination only bite on real
        # emptiness/surfaces (random-init density culls nothing).
        # BENCH_TRAIN=0 restores the old random-init compute-only mode.
        import pathlib
        import sys
        sys.path.insert(0, str(pathlib.Path(__file__).parent / "scripts"))
        from quality_capacity import train_and_eval

        from samnerf_tpu.utils.synthetic import write_textured_scene
        views = int(os.environ.get("BENCH_TRAIN_VIEWS", "24"))
        scene = write_textured_scene(
            pathlib.Path("/tmp/bench_train_scene"), num_train=views,
            num_test=2, h=int(os.environ.get("BENCH_TRAIN_RES", "256")),
            w=int(os.environ.get("BENCH_TRAIN_RES", "256")),
            with_features=True, detail=4.0)
        t0 = time.time()
        print(f"training {train_steps} steps at reference capacity "
              "(BENCH_TRAIN=0 skips)...", flush=True)
        _, trainer = train_and_eval(
            scene, int(os.environ.get("BENCH_LOG2", "19")),
            int(os.environ.get("BENCH_PLOG2", "17")), train_steps,
            int(os.environ.get("BENCH_TRAIN_RAYS", "8192")),
            args_views=views, hash_fn=cfg.hash_fn,
            return_trainer=True, skip_metrics=True, persist_run=False)
        print(f"trained in {time.time()-t0:.0f}s", flush=True)
        params = trainer.state.params
        model = SAMModel(dataclasses.replace(
            trainer.model.config, hash_q8_serve=True,
            serve_transmittance_eps=et))
        trained = True
    else:
        # random init: frame compute is weight-independent but culling is
        # inert (uniform near-zero density), so this understates the
        # serve rate of any real scene
        params = jax.jit(lambda r, b: model.init(
            r, b, rng=r, train=True, get_features=("sam", "clipseg")))(
                jax.random.PRNGKey(0), rb)

    # decoder-only SAM (prompt encoder + mask decoder; the whole point of
    # distillation is that the ViT image encoder never runs at view time)
    sam, _ = sam_model_registry["vit_b"]()
    feat0 = jnp.zeros((1, 64, 64, 256))
    pts0 = (jnp.zeros((1, 4, 2)), -jnp.ones((1, 4), jnp.int32))
    dec_params = sam.init(jax.random.PRNGKey(1), feat0, pts0, None, None,
                          False, method=Sam.decode_masks)

    # the SHIPPED serving path: SamNerfRenderer's device-resident
    # interactive fast path (render + decode + overlay in one pipelined
    # flow; engine/render_pipeline.py serve_frame_fn) with the viewer's
    # serve presets: "static" (SAM top-k 16->8; visually identical,
    # 59.7 dB frame parity) for still cameras, "move" (nerf 16 / props
    # 32 / k 2; -0.9 dB GT PSNR, measured docs/QUALITY.md) while the
    # camera moves — the state the FPS number is *for*. The round-3
    # sweep (scripts/tune_serve.py) showed masking-based culling
    # (occupancy, early termination) saves nothing on TPU — dead
    # samples cost the same as live in the encode scan — so culling
    # defaults OFF (BENCH_OCC=1 re-enables) and the lever is serve-time
    # sample counts.
    from samnerf_tpu.engine.render_pipeline import SamNerfRenderer
    snr = SamNerfRenderer(model, chunk=1 << 15, serve_preset="static")
    snr.renderer.fuse_features = not os.environ.get("BENCH_NO_FUSE")
    if snr._move_renderer is not None:
        snr._move_renderer.fuse_features = snr.renderer.fuse_features
    if trained and os.environ.get("BENCH_OCC", "0") == "1":
        t0 = time.time()
        occ_frac = snr.bake_occupancy(params)
        print(f"occupancy baked: {occ_frac:.3f} occupied "
              f"({time.time()-t0:.0f}s)", flush=True)
    serve = snr.serve_frame_fn(sam, dec_params, H, W, preset="move")
    serve_static = snr.serve_frame_fn(sam, dec_params, H, W,
                                      preset="static")

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

    clicks = [(200.0 + 3.0 * i, 256.0 - 2.0 * i) for i in range(64)]

    def measure(serve_fn, base):
        """Pipelined serving (throughput): submit frame i+1 before
        fetching frame i so device compute overlaps the host transfer —
        the same double-buffering the reference's render thread achieves
        by decoupling render and websocket send
        (render_state_machine.py:245-319). Distinct camera+click per
        frame (the tunnel content-caches identical dispatches)."""
        out = np.asarray(serve_fn(clicks[base], cam_at(base)))  # compile
        assert out.shape == (H, W, 3) and out.dtype == np.uint8
        np.asarray(serve_fn(clicks[base + 1], cam_at(base + 1)))
        n = 8
        t0 = time.time()
        pending = serve_fn(clicks[base + 2], cam_at(base + 2))
        for i in range(1, n + 1):
            nxt = (serve_fn(clicks[base + 2 + i], cam_at(base + 2 + i))
                   if i < n else None)
            np.asarray(pending)
            pending = nxt
        return n / (time.time() - t0)

    fps = measure(lambda c, cam: serve(params, cam, 0, c), 0)
    fps_static = measure(lambda c, cam: serve_static(params, cam, 0, c), 16)

    # --- full interactive-loop FPS: the reference's COMPLETE per-frame
    # view flow (sam_model.py:437-514) through render_view — chunked
    # full render, 3D prompt-lock backprojection/reprojection +
    # visibility test, ClipSeg text->relevance decode on the rendered
    # grid, SAM predict via the host set_feature path, mask composite +
    # pin overlay.  Slower than serve_frame_fn by construction (host
    # round trips per stage); reported so the headline serve numbers
    # have their full-loop counterpart (BENCH_VIEW=0 skips).
    fps_view = None
    if os.environ.get("BENCH_VIEW", "1") == "1":
        from samnerf_tpu.perception.clipseg.pipeline import ClipSegPredictor
        from samnerf_tpu.perception.sam.predictor import SamPredictor

        sam_full_params = jax.jit(lambda k: sam.init(
            k, jnp.zeros((1, 16, 16, 3)),
            points=(jnp.zeros((1, 1, 2)),
                    jnp.zeros((1, 1), jnp.int32))))(jax.random.PRNGKey(2))
        pred = SamPredictor(sam, sam_full_params)
        cs = ClipSegPredictor()
        # no BPE vocab ships in this environment: fixed token ids keep
        # the per-frame text-encoder cost identical to a real prompt
        _tok = jnp.ones((1, 77), jnp.int32)
        cs.encode_text = lambda texts: cs._jit_text(cs.text_params, _tok)
        snr_view = SamNerfRenderer(model, sam_predictor=pred,
                                   clipseg_predictor=cs,
                                   chunk=1 << 15, serve_preset="static")
        intrin = np.array([[400.0, 0.0, W / 2], [0.0, 400.0, H / 2],
                           [0.0, 0.0, 1.0]])
        pts = np.array([[W * 0.4, H * 0.5]])  # in-bounds at any BENCH_RES

        def view_frame(i):
            cam = cam_at(i)
            return snr_view.render_view(
                params, cam, 0, intrin, np.asarray(cam.camera_to_worlds[0]),
                points=pts, text_prompt="object", width=W, height=H,
                preset="static")

        out = view_frame(0)   # compile + lock the click into a 3D prompt
        assert "masked_rgb" in out and out["masked_rgb"].shape[:2] == (H, W)
        view_frame(1)
        n = 4
        t0 = time.time()
        for i in range(2, 2 + n):
            view_frame(i)
        fps_view = n / (time.time() - t0)

    # v5e-8 extrapolation factor: measured strong-scaling overhead of the
    # sharded frame fn (scripts/bench_scaling.py -> docs/SCALING.json);
    # falls back to the ideal 8x minus nothing only if unmeasured
    try:
        import pathlib
        scaling = json.loads(pathlib.Path(
            "docs/SCALING.json").read_text())
        factor = float(scaling["extrapolation_factor_v5e8"])
    except Exception:
        factor, scaling = 7.5, None

    extra = {}
    if trained:
        extra["trained"] = (ckpt_dir or
                            f"in-bench {train_steps}-step full-capacity run")
        if occ_frac is not None:
            extra["occupied_frac"] = round(occ_frac, 4)
        if model.config.serve_transmittance_eps:
            extra["early_termination_eps"] = \
                model.config.serve_transmittance_eps
    extra["serve_preset"] = ("move: 16 nerf / 32 prop / top-2 SAM samples "
                             "(-0.9 dB GT PSNR vs train counts, motion "
                             "frames only; docs/QUALITY.md)")
    extra["static_fps"] = round(fps_static, 3)
    extra["static_preset"] = ("train counts, SAM top-k 8 (visually "
                              "identical: 59.7 dB frame parity)")
    if fps_view is not None:
        extra["render_view_fps"] = round(fps_view, 3)
        extra["render_view_flow"] = (
            "full interactive loop (sam_model.py:437-514): chunked render "
            "+ 3D prompt lock + visibility + ClipSeg text decode + "
            "set_feature SAM predict + overlay, host round trips included")
    print(json.dumps({
        "metric": "interactive_sam_512_fps",
        "value": round(fps, 3),
        **extra,
        "unit": "frames/s (512^2 render + SAM mask decode + overlay, 1 chip, "
                "REFERENCE-capacity 2^19/2^17 hash tables, int8 serve "
                "tables, morton hash, moving-camera serve preset)",
        "vs_baseline": round(fps / 3.75, 4),
        "tables": f"2^{model.config.log2_hashmap_size} fields / "
                  f"2^{model.config.proposal_net_args[0]['log2_hashmap_size']}"
                  " props",
        "sharded_v5e8_fps_extrapolated": round(fps * factor, 2),
        "extrapolation_factor": {
            "value": factor,
            "source": ("docs/SCALING.json (analytic ICI collective "
                       "budget, docs/SCALING.md; CPU-mesh curve "
                       "recorded but unusable on this host)"
                       if scaling else "fallback"),
        },
    }))


if __name__ == "__main__":
    main()
