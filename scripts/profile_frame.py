"""XLA device-op profile of the 512^2 serve frame.

Captures a jax.profiler trace of one frame and aggregates device op
durations from the chrome-trace json, bucketed by op kind.

Run: python scripts/profile_frame.py [--q8] [--morton] [--rgb-only]
"""
import argparse
import collections
import glob
import gzip
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def aggregate(trace_dir):
    path = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                            recursive=True))[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # keep device lanes only (TensorCore / XLA Ops), drop python/host
    buckets = collections.Counter()
    total = 0.0
    for e in events:
        name = e.get("name", "")
        args = e.get("args", {}) or {}
        hlo = args.get("long_name") or args.get("name") or name
        if not isinstance(hlo, str):
            continue
        pid_name = str(e.get("pid", ""))
        cat = args.get("device_type", "")
        # heuristics: device ops carry 'run_id' / occur on TensorCore pids;
        # python traces have 'tf_op' absent and names like 'HostToDevice'.
        if "fusion" in name or "copy" in name or "custom-call" in name \
                or "dynamic" in name or "convolution" in name \
                or "all-reduce" in name or "dot" in name or "scan" in name \
                or name.startswith(("jit_", "pmap_")) is False:
            pass
        buckets[name.split(".")[0][:60]] += e["dur"]
        total += e["dur"]
    return buckets, total, len(events)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q8", action="store_true")
    ap.add_argument("--morton", action="store_true")
    ap.add_argument("--rgb-only", action="store_true")
    ap.add_argument("--occ", action="store_true",
                    help="serve occupancy culling (analytic grid)")
    ap.add_argument("--chunk", type=int, default=15,
                    help="log2 rays per serve chunk")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute dtype (serve)")
    ap.add_argument("--no-fuse", action="store_true",
                    help="independent feature ray grids (reference style)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from samnerf_tpu.core.cameras import Cameras
    from samnerf_tpu.core.rays import RayBundle
    from samnerf_tpu.engine.eval_render import ImageRenderer
    from samnerf_tpu.models.sam_model import SAMModel, SAMModelConfig

    cfg = SAMModelConfig(num_images=4, hash_q8_serve=args.q8,
                         hash_fn="morton" if args.morton else "reference",
                         compute_dtype=(jnp.bfloat16 if args.bf16
                                        else jnp.float32))
    model = SAMModel(cfg)
    feats = () if args.rgb_only else ("sam", "clipseg")

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

    def cam_at(i):
        c = np.eye(4)[:3, :4].astype(np.float32)
        c[0, 3] = 0.02 * (i + 1)
        c[2, 3] = 1.5
        return Cameras(camera_to_worlds=jnp.asarray(c[None]),
                       fx=jnp.asarray([[400.0]]), fy=jnp.asarray([[400.0]]),
                       cx=jnp.asarray([[256.0]]), cy=jnp.asarray([[256.0]]),
                       width=512, height=512)

    kw = {}
    if args.occ:
        from samnerf_tpu.ops.occupancy import pack_serve_occupancy
        sys.path.insert(0, "scripts")
        from bench_frame_v4 import analytic_cells
        kw["occ"] = pack_serve_occupancy(analytic_cells(96))

    renderer = ImageRenderer(model, chunk=1 << args.chunk,
                             fuse_features=not args.no_fuse)
    t0 = time.time()
    renderer.render_image(params, cam_at(0), 0, 512, 512, features=feats,
                          **kw)
    print(f"compile+1: {time.time()-t0:.0f}s", flush=True)

    trace_dir = "/tmp/trace_frame"
    jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    renderer.render_image(params, cam_at(1), 0, 512, 512, features=feats,
                          **kw)
    wall = time.time() - t0
    jax.profiler.stop_trace()
    print(f"frame wall: {wall*1e3:.0f} ms")

    buckets, total, n = aggregate(trace_dir)
    print(f"trace events: {n}, total dur {total/1e3:.0f} ms")
    for name, dur in buckets.most_common(30):
        print(f"  {dur/1e3:9.1f} ms  {name}")


if __name__ == "__main__":
    main()
