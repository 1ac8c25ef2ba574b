"""Closed distillation loop: distilled-features masks vs encoder masks.

The reference's headline capability is that a SAM feature map *rendered
from the distilled field* can replace the ViT image encoder in the mask
decoder with the same masks coming out (``samnerf/sam_model.py:486``
set_feature vs ``:529-547`` set_image on the rendered rgb).  This study
closes that loop in-environment:

1. generate per-view SAM feature targets with the in-repo flax ViT-B
   encoder (fixed-seed random init — no released SAM weights exist here;
   random ViT features are spatially high-frequency, unlike the
   procedural ±1 maps of ``utils/synthetic.py``),
2. train ``samnerf_distill`` at reference capacity on those targets,
3. for each held-out view, decode masks twice — from
   ``set_feature(rendered_features)`` and from ``set_image(rendered_rgb)``
   (the SAME encoder weights that produced the targets) — over a grid of
   point prompts, and report the mean IoU between the two mask paths.

Run on the real TPU:  python scripts/quality_distill_miou.py
Writes the mIoU table into docs/QUALITY.md (appended section).
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")


def make_vit_features(scene: Path, seed: int = 0):
    """Replace the scene's procedural sam_features/*.npy with real flax
    ViT-B encoder outputs on each view image.  Returns (sam, params)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from samnerf_tpu.perception.sam.build_sam import build_sam_vit_b
    from samnerf_tpu.perception.sam.transforms import ResizeLongestSide

    sam, _ = build_sam_vit_b()
    tf = ResizeLongestSide(sam.image_encoder.img_size)

    img_paths = sorted((scene / "images").glob("*.png"))
    im0 = np.asarray(Image.open(img_paths[0]))
    x0 = sam.preprocess(jnp.asarray(
        tf.apply_image(im0), jnp.float32)[None])
    t0 = time.time()
    # full-model init (encoder + prompt encoder + mask decoder): the
    # decode phase below drives SamPredictor.predict with these params
    params = jax.jit(
        lambda k, x: sam.init(
            k, x, points=(jnp.zeros((1, 1, 2)),
                          jnp.zeros((1, 1), jnp.int32))))(
            jax.random.PRNGKey(seed), x0)
    encode = jax.jit(lambda p, x: sam.apply(p, x, method=sam.encode_image))
    print(f"  vit-b init: {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    for p in img_paths:
        img = np.asarray(Image.open(p))
        x = sam.preprocess(jnp.asarray(tf.apply_image(img), jnp.float32)[None])
        feat = np.asarray(encode(params, x))[0]          # [64, 64, 256]
        np.save(scene / "sam_features" / (p.stem + ".npy"),
                np.moveaxis(feat, -1, 0).astype(np.float32))  # [256, 64, 64]
    print(f"  encoded {len(img_paths)} views in {time.time()-t0:.0f}s",
          flush=True)
    return sam, params


def grid_mIoU(pred, grid: int, chunk: int = 256):
    """Decode masks at a grid x grid point-prompt lattice through the
    currently-set features; returns stacked bool masks [G*G, H, W]."""
    h, w = pred.original_size
    ys = (np.arange(grid) + 0.5) / grid * h
    xs = (np.arange(grid) + 0.5) / grid * w
    pts = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 1, 2)  # [G*G, 1, 2]
    pts_in = pred.transform.apply_coords(pts, pred.original_size)
    labels = np.ones((pts.shape[0], 1), np.int32)
    masks = []
    for i in range(0, pts.shape[0], chunk):
        m, _, _ = pred.predict_batched(
            pts_in[i:i + chunk].astype(np.float32), labels[i:i + chunk],
            multimask_output=False)
        masks.append(np.asarray(m[:, 0]))  # [B, H, W] bool
    return np.concatenate(masks, axis=0)


def miou(a: np.ndarray, b: np.ndarray) -> float:
    """Mean IoU over leading prompt axis; empty-vs-empty counts as 1."""
    inter = np.logical_and(a, b).sum((-2, -1)).astype(np.float64)
    union = np.logical_or(a, b).sum((-2, -1)).astype(np.float64)
    return float(np.where(union > 0, inter / np.maximum(union, 1), 1.0)
                 .mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--rays", type=int, default=16384)
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--detail", type=float, default=4.0)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--log2", type=int, default=19)
    ap.add_argument("--plog2", type=int, default=17)
    ap.add_argument("--test-views", type=int, default=4)
    ap.add_argument("--out", default="docs/QUALITY.md")
    ap.add_argument("--persist", action="store_true",
                    help="persist the run (config.json + checkpoints "
                         "every --save-every steps + final + eval-image "
                         "PNGs) — used for the full reference-schedule "
                         "run (samconfigs.py:109,120-121: 10k x 16384)")
    ap.add_argument("--save-every", type=int, default=2500)
    ap.add_argument("--run-name", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint under the "
                         "persisted run dir (scene + feature targets are "
                         "regenerated deterministically)")
    args = ap.parse_args()

    from samnerf_tpu.utils.synthetic import write_textured_scene
    from quality_capacity import train_and_eval

    scene = write_textured_scene(Path("/tmp/miou_scene"),
                                 num_train=args.views, num_test=4,
                                 h=args.res, w=args.res,
                                 with_features=True, detail=args.detail)
    print("--- generating ViT-B feature targets", flush=True)
    sam, sam_params = make_vit_features(scene)

    print(f"--- training samnerf_distill 2^{args.log2} "
          f"({args.steps} x {args.rays} rays)", flush=True)
    t_train = time.time()
    m, trainer = train_and_eval(scene, args.log2, args.plog2, args.steps,
                                args.rays, args_views=args.views,
                                hash_fn="morton",  # +22%, quality parity
                                return_trainer=True,
                                persist_run=args.persist,
                                steps_per_save=(args.save_every
                                                if args.persist else 10 ** 9),
                                run_name=args.run_name,
                                load_dir=(f"/tmp/qruns/{args.run_name}/"
                                          "samnerf_tpu_ckpts"
                                          if args.resume and args.run_name
                                          else None))
    t_train = time.time() - t_train
    print(m, flush=True)
    print(f"train+metrics wall: {t_train:.0f}s "
          f"({args.steps * args.rays / max(m.get('train_s', t_train), 1):,.0f}"
          " rays/s)", flush=True)

    import jax
    import jax.numpy as jnp

    from samnerf_tpu.engine.eval_render import ImageRenderer, get_feature_size
    from samnerf_tpu.perception.sam.predictor import SamPredictor

    renderer = ImageRenderer(trainer.model)
    dm = trainer.datamanager
    cams = jax.tree.map(jnp.asarray, dm.eval_cameras)
    train_cams = jax.tree.map(jnp.asarray, dm.cameras)
    pred = SamPredictor(sam, sam_params)

    run_dir = Path(f"/tmp/qruns/{args.run_name}") if args.run_name else None
    if args.persist and run_dir is not None:
        (run_dir / "eval_images").mkdir(parents=True, exist_ok=True)

    def view_miou(cam_tree, i, gt_path=None, tag="test"):
        """Returns (mIoU vs rendered-rgb masks, mIoU vs GT-image masks).

        The second column is the reference's actual serving claim:
        rendered features replace running the encoder on the *real*
        view (``sam_model.py:486`` — the viewer never re-encodes);
        the first isolates the feature path from rgb reconstruction
        error by re-encoding the render itself."""
        out = renderer.render_image(trainer.state.params, cam_tree, i,
                                    features=("sam",))
        rgb = np.clip(np.asarray(out["rgb"]), 0, 1)
        if args.persist and run_dir is not None:
            from PIL import Image
            Image.fromarray((rgb * 255).astype(np.uint8)).save(
                run_dir / "eval_images" / f"{tag}_{i}_render.png")
        H, W = rgb.shape[:2]
        rendered = np.asarray(out["sam"])          # [fh, fw, 256]
        fh, fw = get_feature_size(H, W)
        rendered = rendered[:fh, :fw]
        pred.set_feature(jnp.asarray(rendered), (H, W))
        masks_feat = grid_mIoU(pred, args.grid)
        pred.set_image((rgb * 255).astype(np.uint8))
        masks_img = grid_mIoU(pred, args.grid)
        v_gt = float("nan")
        if gt_path is not None:
            from PIL import Image
            pred.set_image(np.asarray(Image.open(gt_path))[..., :3])
            masks_gt = grid_mIoU(pred, args.grid)
            v_gt = miou(masks_feat, masks_gt)
        return miou(masks_feat, masks_img), v_gt

    # train-view diagnostic: distillation fidelity isolated from
    # novel-view reconstruction error (both mask paths consume renders;
    # on a train view the renders are near-GT, so any mIoU gap here is
    # the distilled features themselves)
    import json as _json
    def _gt_paths(meta_name):
        meta = _json.loads((scene / meta_name).read_text())
        return [scene / f["file_path"] for f in meta["frames"]]
    train_paths = _gt_paths("transforms_train.json")
    test_paths = _gt_paths("transforms_test.json")

    train_rows = []
    for i in range(min(2, dm.cameras.num_cameras)):
        t0 = time.time()
        v, v_gt = view_miou(train_cams, i, gt_path=train_paths[i],
                            tag="train")
        train_rows.append((v, v_gt))
        print(f"  TRAIN view {i}: mIoU vs set_image(render) = {v:.4f}, "
              f"vs set_image(GT) = {v_gt:.4f}  ({time.time()-t0:.0f}s)",
              flush=True)

    rows = []
    for i in range(min(args.test_views, dm.eval_cameras.num_cameras)):
        t0 = time.time()
        v, v_gt = view_miou(cams, i, gt_path=test_paths[i])
        rows.append((v, v_gt))
        print(f"  view {i}: mIoU vs set_image(render) = {v:.4f}, "
              f"vs set_image(GT) = {v_gt:.4f}  ({time.time()-t0:.0f}s)",
              flush=True)

    mean_miou = float(np.mean([r[0] for r in rows]))
    mean_gt = float(np.mean([r[1] for r in rows]))
    mean_train_miou = float(np.mean([r[0] for r in train_rows]))
    print(f"mean mIoU over {len(rows)} held-out views: {mean_miou:.4f} "
          f"(vs GT-image masks {mean_gt:.4f}; train views "
          f"{mean_train_miou:.4f})", flush=True)

    section = [
        "",
        "## Closed distillation loop: distilled-features vs encoder masks",
        "",
        "Feature targets from the in-repo flax ViT-B encoder (fixed-seed",
        "random init; high-frequency spatial structure), trained at "
        f"2^{args.log2}/2^{args.plog2}",
        f"for {args.steps} steps x {args.rays} rays on the textured scene "
        f"({args.views} views, {args.res}x{args.res}, detail x"
        f"{args.detail:g}).",
        "Per held-out view, masks decoded from "
        "`set_feature(rendered_features)`",
        "vs `set_image(rendered_rgb)` (the same encoder that made the "
        "targets)",
        f"at a {args.grid}x{args.grid} point-prompt grid, "
        "single-mask decode.",
        "Reference behavior: `samnerf/sam_model.py:486` vs `:529-547`.",
        "",
        "| view | mIoU vs set_image(rendered rgb) | mIoU vs "
        "set_image(GT image) |",
        "|---|---|---|",
    ]
    for i, (v, vg) in enumerate(train_rows):
        section.append(f"| train {i} | {v:.4f} | {vg:.4f} |")
    for i, (v, vg) in enumerate(rows):
        section.append(f"| held-out {i} | {v:.4f} | {vg:.4f} |")
    section += ["| **mean (held-out)** | **" + f"{mean_miou:.4f}" + "** | **"
                + f"{mean_gt:.4f}" + "** |",
                "",
                f"test PSNR {m['psnr']:.2f}, SAM-feat MSE "
                f"{m.get('sam_feature_mse', float('nan')):.4f}, "
                f"cos {m.get('sam_feature_cos', float('nan')):.4f} "
                "(vs ViT targets).",
                f"Training wall-clock {m.get('train_s', 0):.0f}s "
                f"({m.get('rays_per_s', 0):,} rays/s) for "
                f"{args.steps} x {args.rays} rays, one v5e chip"
                + (f"; run persisted with checkpoints every "
                   f"{args.save_every} steps + eval renders "
                   f"(/tmp/qruns/{args.run_name})." if args.persist
                   else "."),
                "(generated by scripts/quality_distill_miou.py)"]
    out_p = Path(args.out)
    txt = out_p.read_text() if out_p.exists() else "# Quality\n"
    marker = "## Closed distillation loop"
    if marker in txt:
        txt = txt[:txt.index(marker)].rstrip() + "\n"
    out_p.write_text(txt + "\n".join(section) + "\n")
    print(f"wrote {out_p}")


if __name__ == "__main__":
    main()
