"""Multi-scene benchmark driver (train + eval a method over scenes).

Reference: ``scripts/benchmarking/launch_train_blender.sh`` (trains a
method over the 8 Blender scenes, one GPU per scene, with per-method
flag overrides at :28-32) and ``launch_eval_blender.sh`` +
``scripts/eval.py:21-60`` (ComputePSNR JSON).  The GPU-pool shell
orchestration becomes a single-process loop on the TPU host: scenes run
sequentially on the chip (data-parallel *within* a run via the mesh),
and the summary table lands in one JSON.

Usage:
    python -m samnerf_tpu.scripts.benchmark samnerf_distill \
        --scenes dir1,dir2,... --output benchmark.json \
        [--trainer.max-num-iterations N] [dotted overrides...]
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    from samnerf_tpu.configs.cli import apply_overrides
    from samnerf_tpu.configs.methods import method_configs

    registry = method_configs()
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("methods:", ", ".join(registry))
        return 0
    method = argv.pop(0)
    if method not in registry:
        print(f"unknown method {method!r}; methods: {', '.join(registry)}")
        return 2

    scenes, output = [], Path("benchmark.json")
    rest = []
    it = iter(argv)
    for a in it:
        if a == "--scenes":
            scenes = [Path(s) for s in next(it).split(",") if s]
        elif a == "--output":
            output = Path(next(it))
        else:
            rest.append(a)
    if not scenes:
        print("--scenes dir1,dir2,... is required")
        return 2

    from samnerf_tpu.train import save_config, train_loop
    from samnerf_tpu.utils.eval_utils import compute_eval_metrics

    rows = {}
    for scene in scenes:
        # rebuild from a fresh registry: apply_overrides mutates the
        # config in place, so reusing one object would compound
        # output_dir (and any other override) across scenes
        config = apply_overrides(method_configs()[method], rest)
        if not any(a == "--vis" or a.startswith("--vis=") for a in rest):
            config.vis = "json"   # batch runs: no live viewer
        config.datamanager.dataparser.data = scene
        config.trainer.output_dir = (Path(config.trainer.output_dir)
                                     / scene.name / method)
        save_config(config)
        t0 = time.time()
        trainer = train_loop(config)
        train_s = time.time() - t0
        metrics = compute_eval_metrics(trainer)
        metrics["train_s"] = round(train_s, 1)
        rows[scene.name] = metrics
        print(f"{scene.name}: {metrics}", flush=True)

    summary = {
        "method": method,
        "scenes": rows,
        "mean_psnr": (sum(m["psnr"] for m in rows.values()) / len(rows)),
        "mean_ssim": (sum(m["ssim"] for m in rows.values()) / len(rows)),
    }
    output.parent.mkdir(parents=True, exist_ok=True)
    output.write_text(json.dumps(summary, indent=2))
    print(f"wrote {output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
