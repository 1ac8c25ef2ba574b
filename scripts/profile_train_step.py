"""Device-time breakdown of one full-capacity samnerf_distill train step.

Aggregates a jax.profiler trace of K chained train steps (tunnel-proof)
into named buckets: hash fwd kernels, hash bwd kernels, MXU matmuls
(MLPs + one-hot scatters), everything else.

Run: python scripts/profile_train_step.py [--no-remat] [--hash-fn morton]
"""
import argparse
import glob
import gzip
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def aggregate_trace(trace_dir):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return None
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device ops: pid for /device:TPU:0 XLA Ops
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    buckets = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pids.get(e["pid"], "")
        tname = tids.get((e["pid"], e["tid"]), "")
        if "TPU" not in pname or "XLA Ops" not in tname:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # ms
        total += dur
        if "fwd_kernel" in name or "custom-call" in name and "fwd" in name:
            key = "hash fwd kernels"
        elif "bwd_kernel" in name:
            key = "hash bwd kernels"
        elif "fusion" in name:
            key = "fusions (VPU/mixed)"
        elif "dot" in name or "conv" in name:
            key = "matmuls"
        else:
            key = "other"
        buckets[key] = buckets.get(key, 0.0) + dur
    # also bucket by raw name prefix for the top ops
    by_name = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pids.get(e["pid"], "")
        tname = tids.get((e["pid"], e["tid"]), "")
        if "TPU" not in pname or "XLA Ops" not in tname:
            continue
        n = e.get("name", "").split(".")[0]
        by_name[n] = by_name.get(n, 0.0) + e.get("dur", 0) / 1e3
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:20]
    return buckets, total, top


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--hash-fn", default="morton")
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from samnerf_tpu.configs.methods import method_configs
    from samnerf_tpu.engine.trainer import Trainer
    from samnerf_tpu.utils import synthetic

    cfgs = method_configs()["samnerf_distill"]
    import dataclasses
    cfgs.model = dataclasses.replace(
        cfgs.model, hash_fn=args.hash_fn, use_remat=not args.no_remat)
    cfgs.datamanager.train_num_rays_per_batch = args.rays
    cfgs.trainer.steps_per_dispatch = 1

    import tempfile
    from pathlib import Path
    scene = synthetic.write_textured_scene(
        Path(tempfile.mkdtemp(prefix="profscene_")), num_train=8,
        num_test=1, h=64, w=64, with_features=True)
    cfgs.datamanager.dataparser.data = scene

    from samnerf_tpu.data.datamanager import DataManager
    dm = DataManager(cfgs.datamanager, seed=0)
    model_cfg = dataclasses.replace(cfgs.model,
                                    num_images=dm.num_train_images)
    tr = Trainer(model_cfg, cfgs.trainer, cfgs.optimizers, dm)

    t0 = time.time()
    m = tr.train_iteration(0)
    print(f"compile+step0: {time.time()-t0:.1f}s loss="
          f"{m.get('total_loss', float('nan')):.4f}", flush=True)
    for i in range(1, 3):
        tr.train_iteration(i)

    trace_dir = tempfile.mkdtemp(prefix="trace_")
    jax.profiler.start_trace(trace_dir)
    t0 = time.time()
    for i in range(3, 3 + args.steps):
        m = tr.train_iteration(i)
    # force completion
    _ = float(m["total_loss"])
    wall = (time.time() - t0) / args.steps
    jax.profiler.stop_trace()
    print(f"wall: {wall*1e3:.0f} ms/step "
          f"({args.rays/wall:.0f} rays/s)", flush=True)

    res = aggregate_trace(trace_dir)
    if res:
        buckets, total, top = res
        print(f"device total: {total/args.steps:.0f} ms/step")
        for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
            print(f"  {k:24s} {v/args.steps:8.1f} ms")
        print("top ops:")
        for n, v in top:
            print(f"  {n[:60]:60s} {v/args.steps:8.1f} ms")


if __name__ == "__main__":
    main()
