"""Quality-vs-capacity evidence: train samnerf's radiance field on the
structured textured synthetic scene at several hash-table capacities and
record test-split PSNR/SSIM (VERDICT round-1 item #2: show what 2^19 buys
over the shrunken 2^15 tables).

Run on the real TPU: python scripts/quality_capacity.py [--steps 2000]
Writes docs/QUALITY.md.
"""
import argparse
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")


def train_and_eval(scene, log2_size, prop_log2, steps, rays_per_batch,
                   args_views=24, hash_fn="reference",
                   return_trainer=False, skip_metrics=False,
                   persist_run=True, compute_dtype=None,
                   steps_per_save=10 ** 9, run_name=None,
                   load_dir=None):
    from samnerf_tpu.configs.methods import method_configs
    from samnerf_tpu.data.datamanager import DataManager, DataManagerConfig
    from samnerf_tpu.data.dataparser import DataparserConfig
    from samnerf_tpu.engine.trainer import Trainer, TrainerConfig
    from samnerf_tpu.utils.eval_utils import compute_eval_metrics

    preset = method_configs()["samnerf_distill"]
    model_cfg = dataclasses.replace(
        preset.model,
        log2_hashmap_size=log2_size,
        hashgrid_sizes=(log2_size, log2_size),
        proposal_net_args=tuple({**a, "log2_hashmap_size": prop_log2}
                                for a in preset.model.proposal_net_args),
        num_images=args_views, hash_fn=hash_fn,
        **({"compute_dtype": compute_dtype} if compute_dtype else {}))
    dm_cfg = DataManagerConfig(
        dataparser=DataparserConfig(data=scene, train_val_json_split=True),
        train_num_rays_per_batch=rays_per_batch,
        patch_size=preset.model.patch_size,
        distill_sam=True, use_clipseg_feature=True)
    dm = DataManager(dm_cfg)
    t0 = time.time()
    trainer_cfg = TrainerConfig(
        max_num_iterations=steps, steps_per_save=steps_per_save,
        steps_per_eval_batch=10 ** 9,
        output_dir=Path(f"/tmp/qruns/"
                        f"{run_name or f'{log2_size}-{hash_fn}-{steps}'}"),
        log_every=max(steps // 4, 1), save_final=persist_run,
        load_dir=Path(load_dir) if load_dir else None)
    trainer = Trainer(model_cfg, trainer_cfg, preset.optimizers, dm)
    start_step = int(trainer.state.step)  # nonzero when resuming
    if persist_run:
        # persist a servable run dir (config.json + final ckpt): eval_setup /
        # BENCH_CKPT can then re-serve any quality-study checkpoint.
        # persist_run=False skips this: at full capacity the final
        # params+opt_state fetch is hundreds of MB over the ~9 MB/s TPU
        # tunnel, which dwarfs the training itself for throwaway runs.
        from samnerf_tpu.train import save_config
        save_config(dataclasses.replace(
            preset, model=model_cfg, trainer=trainer_cfg, datamanager=dm_cfg))
    trainer.train()
    train_s = time.time() - t0
    if skip_metrics:
        return None, trainer
    m = compute_eval_metrics(trainer, max_images=4)
    m["train_s"] = round(train_s, 1)
    m["rays_per_s"] = round((steps - start_step) * rays_per_batch / train_s)
    m["resumed_from"] = start_step

    # train-split PSNR on 2 held-in views: separates overfitting (train
    # high / test low) from a model that never learned (both low).
    import jax
    import jax.numpy as jnp
    from samnerf_tpu.engine.eval_render import ImageRenderer
    from samnerf_tpu.utils.metrics import psnr
    renderer = ImageRenderer(trainer.model)
    cams = jax.tree.map(jnp.asarray, dm.cameras)
    tp = []
    for i in range(2):
        out = renderer.render_image(trainer.state.params, cams, i)
        rgb = np.asarray(out["rgb"])
        gt = dm.images[i].astype(np.float32) / 255.0
        if not np.isfinite(rgb).all():
            print(f"  train view {i}: {np.isnan(rgb).sum()} NaNs!")
        tp.append(float(psnr(jnp.asarray(rgb), jnp.asarray(gt))))
    m["train_psnr"] = float(np.mean(tp))

    # distillation quality: MSE between the RENDERED SAM embedding grid
    # (the serve-time replacement for the ViT encoder) and the ground-
    # truth feature map the field was distilled from, view 0.  Rendered
    # grid is avg-pooled to the stored map's resolution.
    out = renderer.render_image(trainer.state.params, cams, 0,
                                features=("sam",))
    rend = np.asarray(out["sam"])                 # [fh, fw, 256]
    gt_f = np.asarray(dm.sam_loader.features[0])  # [gh, gw, 256]
    kh = rend.shape[0] // gt_f.shape[0]
    kw = rend.shape[1] // gt_f.shape[1]
    if kh >= 1 and kw >= 1:
        pooled = rend[:gt_f.shape[0] * kh, :gt_f.shape[1] * kw] \
            .reshape(gt_f.shape[0], kh, gt_f.shape[1], kw, -1).mean((1, 3))
        m["sam_feature_mse"] = float(np.mean((pooled - gt_f) ** 2))
        m["sam_feature_cos"] = float(np.mean(
            np.sum(pooled * gt_f, -1)
            / np.maximum(np.linalg.norm(pooled, axis=-1)
                         * np.linalg.norm(gt_f, axis=-1), 1e-9)))
    if return_trainer:
        return m, trainer
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--rays", type=int, default=16384)
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--detail", type=float, default=1.0)
    ap.add_argument("--hash-fn", default="reference",
                    choices=("reference", "morton"))
    ap.add_argument("--capacities", default="15:13,17:15,19:17",
                    help="comma list of fieldlog2:proplog2 rows")
    ap.add_argument("--out", default="docs/QUALITY.md")
    ap.add_argument("--smooth-texture", action="store_true",
                    help="continuous multi-octave texture + 2x supersampled"
                         " (anti-aliased) ground truth: reconstruction "
                         "error tracks table capacity instead of being "
                         "floored by binary step edges")
    args = ap.parse_args()

    from samnerf_tpu.utils.synthetic import write_textured_scene
    scene = write_textured_scene(Path("/tmp/qscene"),
                                 num_train=args.views,
                                 num_test=4, h=args.res, w=args.res,
                                 with_features=True, detail=args.detail,
                                 smooth_texture=args.smooth_texture,
                                 supersample=2 if args.smooth_texture else 1)
    rows = []
    caps = [tuple(int(x) for x in c.split(":"))
            for c in args.capacities.split(",")]
    for log2, plog2 in caps:
        print(f"--- capacity 2^{log2} / proposals 2^{plog2}", flush=True)
        m = train_and_eval(scene, log2, plog2, args.steps, args.rays,
                           args_views=args.views, hash_fn=args.hash_fn)
        print(m, flush=True)
        rows.append((log2, plog2, m))

    out = Path(args.out)
    out.parent.mkdir(exist_ok=True)
    lines = [
        "# Quality vs hash-table capacity",
        "",
        "Structured textured synthetic scene (3 procedurally-textured",
        "spheres + textured ground, `synthetic.write_textured_scene`,",
        f"texture detail x{args.detail:g}"
        + (", smooth multi-octave texture, 2x-supersampled GT),"
           if args.smooth_texture else ", binary checker/stripe texture),"),
        f"{args.views} train / 4 test views at {args.res}x{args.res}, "
        f"{args.steps} steps of",
        f"`samnerf_distill` ({args.rays} rays/step) on one v5e chip.",
        f"hash_fn={args.hash_fn}.",
        "Reference capacity is 2^19 fields / 2^17 proposals",
        "(`nerfacto.py:89,105-106`, `sam_field.py:97-110`).",
        "",
        "| field tables | proposal tables | test PSNR | train PSNR "
        "| SSIM | SAM-feat MSE | SAM-feat cos | train s | rays/s |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for log2, plog2, m in rows:
        lines.append(f"| 2^{log2} | 2^{plog2} | {m['psnr']:.2f} | "
                     f"{m['train_psnr']:.2f} | {m['ssim']:.4f} | "
                     f"{m.get('sam_feature_mse', float('nan')):.4f} | "
                     f"{m.get('sam_feature_cos', float('nan')):.4f} | "
                     f"{m['train_s']} | {m['rays_per_s']} |")
    lines += ["", f"(generated by scripts/quality_capacity.py, "
              f"steps={args.steps})"]
    # preserve appended study sections (e.g. the closed-distillation-loop
    # mIoU table from scripts/quality_distill_miou.py) across regenerations
    tail = ""
    if out.exists():
        old = out.read_text()
        idx = old.find("\n## ")
        if idx >= 0:
            tail = "\n" + old[idx + 1:]
    out.write_text("\n".join(lines) + "\n" + tail)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
