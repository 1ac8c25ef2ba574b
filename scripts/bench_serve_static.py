"""Static-preset serve A/B: one trained model, many serve variants.

VERDICT round-3 item #2: full-quality (train-count) static serving must
beat 3.75 FPS/chip at 512^2.  The frame profile (scripts/profile_frame.py)
splits the ~450 ms static frame into nerf encode ~137 ms, SAM pyramids
~66 ms (k=8), proposals ~70 ms, fused MLPs/misc ~160 ms.  This script
trains ONCE at reference capacity and then measures serve levers that do
NOT change outputs' quality class, each through the shipped
``SamNerfRenderer.serve_frame_fn`` path (the exact fn bench.py times):

  base      v2 kernel, f32 MLPs, chunk 2^15 (the round-3 static number)
  v4        touched-slab prefetch kernels (SAMNERF_HASH_KERNEL=v4)
  slab16/8  finer slab granularity for the v2 scan skip (V2_SLAB)
  bf16      bfloat16 serve MLPs (encode stays f32-accumulated)
  chunk16   2^16-ray serve chunks (fewer, bigger dispatches)
  gs1       per-128-point-group slab skip on dense tiles
            (SAMNERF_GROUP_SKIP=1; default OFF after the micro-A/B
            measured it slower on all-live tiles — verify_gs.log)

Parity PSNR of each variant's uint8 frame vs base is reported: bf16 must
stay visually identical (>40 dB) to qualify; kernel/chunk variants are
bit-exact candidates but parity is measured anyway.

Run on the real TPU: python scripts/bench_serve_static.py [--steps 500]
The trained model persists to /tmp/qruns/<run-name> (config.json + ckpt);
re-run variants without retraining via --load /tmp/qruns/<run-name>.
"""
import argparse
import dataclasses
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def psnr_u8(a, b):
    mse = np.mean((a.astype(np.float32) - b.astype(np.float32)) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * np.log10(255.0) - 10 * np.log10(mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--variants",
                    default="base,v4,slab16,bf16,chunk16")
    ap.add_argument("--load", default=None,
                    help="run dir from a previous invocation "
                         "(/tmp/qruns/<run-name>): reuse its checkpoint "
                         "instead of retraining")
    ap.add_argument("--run-name", default="serve_ab",
                    help="persisted run dir name under /tmp/qruns")
    ap.add_argument("--hash-fn", default="morton",
                    help="training hash_fn (morton / morton6 / reference); "
                         "serve inherits it from the saved model config")
    ap.add_argument("--out", default="/tmp/r4/serve_ab.json")
    ap.add_argument("--trace", action="store_true",
                    help="capture a jax.profiler trace of one frame per "
                         "variant and print the device-op breakdown "
                         "(scripts/profile_frame.py aggregation)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from samnerf_tpu.core.cameras import Cameras
    from samnerf_tpu.engine.render_pipeline import SamNerfRenderer
    from samnerf_tpu.models.sam_model import SAMModel
    from samnerf_tpu.ops import hash_pallas
    from samnerf_tpu.perception.sam.build_sam import sam_model_registry
    from samnerf_tpu.perception.sam.sam import Sam
    from samnerf_tpu.utils.synthetic import write_textured_scene
    from quality_capacity import train_and_eval

    H = W = args.res
    if args.load:
        from samnerf_tpu.utils.eval_utils import eval_setup
        t0 = time.time()
        trainer, _ = eval_setup(Path(args.load))
        print(f"loaded {args.load} in {time.time()-t0:.0f}s", flush=True)
    else:
        scene = write_textured_scene(
            Path("/tmp/bench_train_scene"), num_train=args.views,
            num_test=2, h=256, w=256, with_features=True, detail=4.0)
        t0 = time.time()
        _, trainer = train_and_eval(scene, 19, 17, args.steps, args.rays,
                                    args_views=args.views,
                                    hash_fn=args.hash_fn,
                                    return_trainer=True, skip_metrics=True,
                                    persist_run=True,
                                    run_name=args.run_name)
        print(f"trained {args.steps} steps in {time.time()-t0:.0f}s "
              f"(run dir /tmp/qruns/{args.run_name})", flush=True)
    params = trainer.state.params
    base_cfg = dataclasses.replace(trainer.model.config, hash_q8_serve=True)

    sam, _ = sam_model_registry["vit_b"]()
    feat0 = jnp.zeros((1, 64, 64, 256))
    pts0 = (jnp.zeros((1, 4, 2)), -jnp.ones((1, 4), jnp.int32))
    dec_params = sam.init(jax.random.PRNGKey(1), feat0, pts0, None, None,
                          False, method=Sam.decode_masks)

    def cam_at(i):
        ang = 0.02 * i
        c = np.eye(4)[:3, :4].astype(np.float32)
        c[0, 3] = 1.5 * np.sin(ang)
        c[2, 3] = 1.5 * np.cos(ang)
        return Cameras(camera_to_worlds=jnp.asarray(c[None]),
                       fx=jnp.asarray([[400.0]]), fy=jnp.asarray([[400.0]]),
                       cx=jnp.asarray([[W / 2.0]]),
                       cy=jnp.asarray([[H / 2.0]]), width=W, height=H)

    clicks = [(200.0 + 3.0 * i, 256.0 - 2.0 * i) for i in range(64)]

    def measure(serve_fn, run_params):
        out, mask = serve_fn(run_params, cam_at(0), 0, clicks[0],
                             return_mask=True)
        out, mask = np.asarray(out), np.asarray(mask)
        np.asarray(serve_fn(run_params, cam_at(1), 0, clicks[1]))
        n = 8
        t0 = time.time()
        pending = serve_fn(run_params, cam_at(2), 0, clicks[2])
        for i in range(1, n + 1):
            nxt = (serve_fn(run_params, cam_at(2 + i), 0, clicks[2 + i])
                   if i < n else None)
            np.asarray(pending)
            pending = nxt
        return n / (time.time() - t0), out, mask

    def mask_iou(a, b):
        union = np.logical_or(a, b).sum()
        if union == 0:
            return 1.0
        return float(np.logical_and(a, b).sum() / union)

    VARIANTS = {
        "base": {},
        "v4": {"kernel": "v4"},
        "slab16": {"slab": 16},
        "slab8": {"slab": 8},
        "bf16": {"bf16": True},
        "chunk16": {"chunk": 1 << 16},
        "v4slab16": {"kernel": "v4", "slab": 16},
        "bf16v4": {"kernel": "v4", "bf16": True},
        "bf16slab16": {"slab": 16, "bf16": True},
        "bf16slab8": {"slab": 8, "bf16": True},
        "gs1": {"gs": "1"},             # dense-tile group skip (opt-in)
        "gs1slab16": {"gs": "1", "slab": 16},
        # occupancy-culled serve with the cull mask forwarded into the
        # kernels (SAMNERF_LIVE_KERNEL): with the per-group skip, fully
        # dead 128-sample groups now skip their slab scans entirely
        "occ": {"occ": True},
        "occlive": {"occ": True, "livek": True},
        "occlive16": {"occ": True, "livek": True, "slab": 16},
        # fused encode+MLP epilogue kernel / int4 serve tables
        "fused": {"fuse": True},
        "q4": {"qbits": 4},
        "fusedq4": {"fuse": True, "qbits": 4},
        "fusedq4prop": {"fuse": True, "qbits": "prop4"},
        # round-4 second wave: pre-baked tables (quantize once at setup,
        # MSE-optimal clip scales), per-field int4, fixed fused kernel
        "bake": {"bake": 0},            # bit-exact vs base (parity check)
        "bakeopt": {"bake": 12},
        "q4opt": {"qbits": 4, "bake": 12},
        "q4sam": {"qbits_sam": 4},      # rgb bit-exact, SAM scan halved
        "q4samopt": {"qbits_sam": 4, "bake": 12},
        "q4props": {"qbits": "prop4"},
        "fusedfix": {"fuse": True, "bake": 12},
        "fusedfixq4": {"fuse": True, "qbits": 4, "bake": 12},
        "best": {"qbits": 4, "qbits_sam": 4, "bake": 12, "slab": 8},
        "q4slab8": {"qbits": 4, "slab": 8, "bake": 12},
        # SAM top-k below the static preset's 8 (parity gates: >40 dB
        # frame + mask IoU ~1.0 to qualify as "visually identical")
        "k4": {"k": 4},
        "k6": {"k": 6},
        "k4q4sam": {"k": 4, "qbits_sam": 4, "bake": 12},
        # round-5: compose the quality-passing levers (k=4 trim +
        # int4-on-SAM-pyramids) with the scan/dispatch levers that were
        # only ever measured on the full-k path
        "k4q4samslab8": {"k": 4, "qbits_sam": 4, "bake": 12, "slab": 8},
        "k4q4samslab16": {"k": 4, "qbits_sam": 4, "bake": 12, "slab": 16},
        "k4q4sambake0": {"k": 4, "qbits_sam": 4, "bake": 0},
        "k4q4samc16": {"k": 4, "qbits_sam": 4, "bake": 12,
                       "chunk": 1 << 16},
        "k6q4samslab8": {"k": 6, "qbits_sam": 4, "bake": 12, "slab": 8},
        "k4q4samp4": {"k": 4, "qbits_sam": 4, "qbits": "prop4",
                      "bake": 12, "slab": 8},
        # round-5 wave 2: with the scans shrunk (q4 SAM tables + k=4),
        # the fused MLPs/compositing are a bigger share — retry bf16
        # there; probe deeper k trims and a smaller chunk
        "k4q4sambf16": {"k": 4, "qbits_sam": 4, "bake": 0, "bf16": True},
        "k3q4sam": {"k": 3, "qbits_sam": 4, "bake": 0},
        "k2q4sam": {"k": 2, "qbits_sam": 4, "bake": 0},
        "k4q4samc14": {"k": 4, "qbits_sam": 4, "bake": 0,
                       "chunk": 1 << 14},
        "k4q4samv4": {"k": 4, "qbits_sam": 4, "bake": 0, "kernel": "v4"},
    }

    results = []
    ref = {}
    for name in [v for v in args.variants.split(",") if v]:
        spec = VARIANTS[name]
        os.environ["SAMNERF_HASH_KERNEL"] = spec.get("kernel", "v2")
        if "gs" in spec:
            os.environ["SAMNERF_GROUP_SKIP"] = spec["gs"]
        old_slab = hash_pallas.V2_SLAB
        old_slab_serve = hash_pallas.V2_SLAB_SERVE
        hash_pallas.V2_SLAB = spec.get("slab", old_slab)
        # q8 serve reads the serve-only default; slab variants override
        # both so the spec value is what actually runs
        hash_pallas.V2_SLAB_SERVE = spec.get("slab", old_slab_serve)
        cfg = base_cfg
        if spec.get("bf16"):
            cfg = dataclasses.replace(cfg, compute_dtype=jnp.bfloat16)
        if spec.get("fuse"):
            cfg = dataclasses.replace(cfg, serve_fuse_mlp=True)
        if spec.get("qbits") == 4:
            cfg = dataclasses.replace(cfg, serve_quant_bits=4)
        elif spec.get("qbits") == "prop4":
            cfg = dataclasses.replace(cfg, serve_quant_bits_props=4)
        if spec.get("qbits_sam"):
            cfg = dataclasses.replace(cfg,
                                      serve_quant_bits_sam=spec["qbits_sam"])
        from samnerf_tpu.fields import nerfacto_field
        old_livek = nerfacto_field._LIVE_TO_KERNEL
        nerfacto_field._LIVE_TO_KERNEL = bool(spec.get("livek"))
        old_presets = dict(SamNerfRenderer.SERVE_PRESETS)
        if "k" in spec:
            SamNerfRenderer.SERVE_PRESETS = {
                **old_presets, "static": dict(k=spec["k"])}
        try:
            snr = SamNerfRenderer(SAMModel(cfg),
                                  chunk=spec.get("chunk", 1 << 15),
                                  serve_preset="static")
            if spec.get("occ"):
                occ_frac = snr.bake_occupancy(params)
                print(f"{name}: occupancy baked, "
                      f"{occ_frac:.3f} occupied", flush=True)
            run_params = params
            if "bake" in spec:
                t0 = time.time()
                run_params = snr.bake_serve_tables(params,
                                                   optimize=spec["bake"])
                jax.block_until_ready(run_params)
                print(f"{name}: tables baked (optimize={spec['bake']}) "
                      f"in {time.time()-t0:.1f}s", flush=True)
            serve = snr.serve_frame_fn(sam, dec_params, H, W,
                                       preset="static")
            t0 = time.time()
            fps, frame, mask = measure(serve, run_params)
            if args.trace:
                from profile_frame import aggregate
                trace_dir = f"/tmp/trace_serve_{name}"
                jax.profiler.start_trace(trace_dir)
                np.asarray(serve(run_params, cam_at(40), 0, clicks[40]))
                jax.profiler.stop_trace()
                buckets, total, nev = aggregate(trace_dir)
                print(f"--- {name} device-op breakdown "
                      f"({nev} events, {total/1e3:.0f} ms):", flush=True)
                for bname, dur in buckets.most_common(24):
                    print(f"  {dur/1e3:9.1f} ms  {bname}", flush=True)
            if name == "base":
                ref["frame"], ref["mask"] = frame, mask
            parity = (psnr_u8(frame, ref["frame"])
                      if "frame" in ref and name != "base" else float("inf"))
            miou = (mask_iou(mask, ref["mask"])
                    if "mask" in ref and name != "base" else 1.0)
            row = {"variant": name, "static_fps": round(fps, 3),
                   "parity_psnr_vs_base": round(parity, 2),
                   "mask_iou_vs_base": round(miou, 4),
                   "compile_s": round(time.time() - t0)}
        except Exception as e:
            row = {"variant": name, "error": repr(e)[:200]}
        finally:
            hash_pallas.V2_SLAB = old_slab
            hash_pallas.V2_SLAB_SERVE = old_slab_serve
            nerfacto_field._LIVE_TO_KERNEL = old_livek
            SamNerfRenderer.SERVE_PRESETS = old_presets
            os.environ.pop("SAMNERF_HASH_KERNEL", None)
            os.environ.pop("SAMNERF_GROUP_SKIP", None)
        results.append(row)
        print(json.dumps(row), flush=True)
        Path(args.out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
