"""Checkpoint evaluation CLI.

Reference: ``scripts/eval.py:21-60`` (ComputePSNR): load a run directory,
render every eval image, write PSNR/SSIM JSON.

Usage: ``python -m samnerf_tpu.scripts.eval <run_dir> [--output out.json]
[--max-images N]``.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("run_dir", type=str)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--max-images", type=int, default=None)
    a = p.parse_args(argv)

    from samnerf_tpu.utils.eval_utils import compute_eval_metrics, eval_setup

    trainer, config = eval_setup(Path(a.run_dir))
    metrics = compute_eval_metrics(trainer, max_images=a.max_images)
    out = {"experiment_name": config.method_name,
           "checkpoint_dir": str(Path(a.run_dir) / "samnerf_tpu_ckpts"),
           "results": metrics}
    text = json.dumps(out, indent=2)
    print(text)
    if a.output:
        Path(a.output).write_text(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
