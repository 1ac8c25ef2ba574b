"""Training entrypoint.

Reference: ``samnerf/train.py`` (entrypoint :246-255, main :220, launch
:149, train_loop :79).  The multiprocess NCCL launcher (mp.spawn +
init_process_group, :93-146) is replaced by JAX's single-process-per-host
runtime: one process drives all local TPU chips through the mesh; multi-host
uses ``jax.distributed.initialize`` (see ``parallel/mesh.py``).

Usage:
    python -m samnerf_tpu.train samnerf_distill --data /path/to/scene \
        [--trainer.max-num-iterations N] [--machine.num-devices N] ...
"""
from __future__ import annotations

import dataclasses
import json
import random
import sys
import time
from pathlib import Path

import numpy as np

from samnerf_tpu.configs.cli import apply_overrides
from samnerf_tpu.configs.methods import MethodConfig, method_configs


def train_loop(config: MethodConfig, num_devices=None):
    """``samnerf/train.py:79-90`` equivalent: seed + build + train."""
    from samnerf_tpu.data.datamanager import DataManager
    from samnerf_tpu.engine.trainer import Trainer
    from samnerf_tpu.utils.jax_setup import setup_jax

    setup_jax()

    seed = config.trainer.seed
    random.seed(seed)
    np.random.seed(seed)

    dm = DataManager(config.datamanager, seed=seed)
    num_images = dm.num_train_images
    model_cfg = dataclasses.replace(config.model, num_images=num_images)
    trainer = Trainer(model_cfg, config.trainer, config.optimizers, dm,
                      num_devices=num_devices)
    step_callback = _setup_vis(config, trainer)
    trainer.train(step_callback=step_callback)
    return trainer


def _setup_vis(config: MethodConfig, trainer):
    """``--vis`` consumption (reference ``trainer.py:154-186``): event
    writers for the wandb/tensorboard/json tokens, a live attached
    viewer for "viewer".  Returns the per-step viewer callback (or
    None)."""
    from samnerf_tpu.utils import writer

    writer.reset()        # a prior run's writers must not leak into this one
    vis = (getattr(config, "vis", "") or "").lower()
    out = Path(config.trainer.output_dir)
    for kind in ("tensorboard", "wandb", "json"):
        if kind in vis:
            writer.setup_event_writer(kind, out)
    if "viewer" not in vis:
        return None
    try:
        return _launch_viewer(trainer, config)
    except Exception as e:          # headless / port busy / missing deps
        print(f"viewer unavailable ({e}); training continues headless")
        return None


def _launch_viewer(trainer, config: MethodConfig):
    """Attach the interactive viewer to a live training run (reference
    ``trainer.py:154-166`` ViewerState launch + websocket server)."""
    import os

    import jax
    import jax.numpy as jnp

    from samnerf_tpu.engine.render_pipeline import SamNerfRenderer
    from samnerf_tpu.perception.sam.build_sam import build_sam
    from samnerf_tpu.perception.sam.predictor import SamPredictor
    from samnerf_tpu.viewer.server import serve_client
    from samnerf_tpu.viewer.viewer_state import ViewerState

    ckpt = os.environ.get("SAM_CHECKPOINT")
    if not (ckpt and Path(ckpt).exists()):
        ckpt = next((c for c in ("checkpoints/sam_vit_h_4b8939.pth",
                                 "checkpoints/sam_vit_b_01ec64.pth")
                     if Path(c).exists()), None)
    model_type = "vit_h" if (ckpt and "vit_h" in ckpt) else "vit_b"
    sam, sam_params = build_sam(model_type, checkpoint=ckpt)
    if sam_params is None:
        print("viewer: no SAM checkpoint found ($SAM_CHECKPOINT or "
              "./checkpoints/) — mask decode uses random weights")
        sam_params = jax.jit(lambda r: sam.init(
            r, jnp.zeros((1, 16, 16, 3)),
            points=(jnp.zeros((1, 1, 2)),
                    jnp.zeros((1, 1), jnp.int32))))(jax.random.PRNGKey(1))
    predictor = SamPredictor(sam, sam_params)
    renderer = SamNerfRenderer(trainer.model, sam_predictor=predictor,
                               serve_preset="static")
    cams = jax.tree.map(jnp.asarray, trainer.datamanager.cameras)
    state = ViewerState(renderer,
                        params_fn=lambda: trainer.state.params,
                        cameras=cams, port=config.websocket_port,
                        save_checkpoint_fn=trainer.save_checkpoint)
    state.start()
    state.camera_paths_dir = str(
        Path(config.trainer.output_dir) / "camera_paths")
    state.init_scene(
        cameras=trainer.datamanager.cameras,
        images=trainer.datamanager.images,
        config_base_dir=str(config.trainer.output_dir),
        data_base_dir=str(config.datamanager.dataparser.data),
        export_path_name=Path(str(config.trainer.output_dir)).stem)
    serve_client(http_port=config.http_port, ws_port=config.websocket_port)
    print(f"viewer: http://localhost:{config.http_port}/"
          f"?port={config.websocket_port}")
    return state.step_callback


def save_config(config: MethodConfig):
    """Persist the resolved config per run (``experiment_config.py:117-130``)."""
    out = Path(config.trainer.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    def enc(o):
        if dataclasses.is_dataclass(o):
            return {f.name: enc(getattr(o, f.name)) for f in dataclasses.fields(o)}
        if isinstance(o, (Path,)):
            return str(o)
        if isinstance(o, dict):
            return {k: enc(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [enc(v) for v in o]
        if o is None or isinstance(o, (bool, int, float, str)):
            return o
        return str(o)  # dtypes and other non-JSON leaves

    (out / "config.json").write_text(json.dumps(enc(config), indent=2))


def train_zoo(name: str, argv) -> int:
    """Train a zoo (non-samnerf) method end-to-end, like the reference's
    ``ns-train <method>`` over its full registry
    (``nerfstudio/configs/method_configs.py``): rgb-only loop with
    per-method extra channels (depth / semantics), final checkpoint +
    eval PSNR."""
    import argparse

    import jax
    import jax.numpy as jnp
    import optax

    from samnerf_tpu.configs.zoo import make_zoo_train_chunk, zoo_methods
    from samnerf_tpu.core.cameras import generate_rays
    from samnerf_tpu.data.datamanager import (DataManager, DataManagerConfig)
    from samnerf_tpu.data.dataparser import DataparserConfig
    from samnerf_tpu.utils.jax_setup import setup_jax
    from samnerf_tpu.utils.metrics import psnr

    ap = argparse.ArgumentParser(prog=f"samnerf_tpu.train {name}")
    ap.add_argument("--data", required=True)
    ap.add_argument("--max-num-iterations", type=int, default=30000,
                    help="rounded UP to a multiple of the 16-step scan "
                         "chunk (one compiled shape; up to 15 extra steps)")
    ap.add_argument("--rays-per-batch", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=None,
                    help="override the per-method default lr")
    ap.add_argument("--output-dir", default="outputs")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--log-every", type=int, default=100,
                    help="quantized to the 16-step scan chunk")
    args = ap.parse_args(argv)

    setup_jax()
    random.seed(args.seed)
    np.random.seed(args.seed)

    method = zoo_methods()[name]
    model, cfg = method.build()

    data = Path(args.data)
    split = (not (data / "transforms.json").exists()
             and (data / "transforms_train.json").exists())
    dm_cfg = DataManagerConfig(
        dataparser=DataparserConfig(data=data, train_val_json_split=split),
        train_num_rays_per_batch=args.rays_per_batch)
    if name == "depth-nerfacto":
        from samnerf_tpu.data.datamanagers_extra import DepthDataManager
        dm = DepthDataManager(dm_cfg, seed=args.seed)
    elif name == "semantic-nerfw":
        from samnerf_tpu.data.datamanagers_extra import SemanticDataManager
        dm = SemanticDataManager(dm_cfg, seed=args.seed)
    else:
        dm = DataManager(dm_cfg, seed=args.seed)
    cameras = jax.tree.map(jnp.asarray, dm.cameras)

    batch0 = {k: jnp.asarray(v) for k, v in dm.next_train(0).items()}
    bundle0 = generate_rays(cameras, batch0["indices"][:, 0],
                            batch0["indices"][:, 1:].astype(jnp.float32))
    params = jax.jit(lambda r, b: model.init(r, b, rng=r, train=True))(
        jax.random.PRNGKey(args.seed), bundle0)
    lr = args.lr if args.lr is not None else method.lr
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    step_fn = jax.jit(make_zoo_train_chunk(method, model, cfg, opt))

    # occupancy-grid maintenance for the ngp variants (the reference's
    # nerfacc OccupancyGrid every-16-step EMA update,
    # ``models/instant_ngp.py:117-124,186-190``; the grid is all-ones
    # until warmup so early training sees the whole volume)
    occupancy = grid_density = occ_update = None
    occ_warmup, occ_every = 256, 16
    if method.use_occupancy:
        from samnerf_tpu.ops.occupancy import update_occupancy
        res = 64
        grid_density = jnp.zeros((res ** 3,), jnp.float32)
        occupancy = jnp.ones((res, res, res), jnp.float32)
        occ_aabb = (model.aabb if hasattr(model, "aabb")
                    else jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]],
                                     jnp.float32))

        @jax.jit
        def occ_update(params, grid_density, rng):
            def dfn(pos):
                return model.apply(params, pos, method=model.density_fn)
            return update_occupancy(grid_density, dfn, occ_aabb, rng,
                                    num_samples=res ** 3 // 4)

    # fused dispatch: scan CHUNK steps per device call (the per-step
    # host/tunnel gap otherwise dominates these small models; the
    # flagship Trainer uses the same pattern).  The iteration count is
    # rounded UP to a chunk multiple so there is exactly one compiled
    # shape.  Slow-step methods use a short per-method chunk
    # (ZooMethod.dispatch_chunk) — a single multi-minute dispatch gets
    # the TPU worker killed; the occupancy-EMA cadence stays occ_every
    # steps regardless.
    chunk = method.dispatch_chunk
    n_chunks = -(-args.max_num_iterations // chunk)
    t0 = time.time()
    for c in range(n_chunks):
        start = c * chunk + 1
        host_batches = [dm.next_train(s)
                        for s in range(start, start + chunk)]
        batches = {k: jnp.stack([jnp.asarray(b[k]) for b in host_batches])
                   for k in host_batches[0]}
        rngs = jnp.stack([jax.random.PRNGKey(args.seed + s)
                          for s in range(start, start + chunk)])
        if method.use_occupancy:
            if start > occ_warmup and (start - 1) % occ_every < chunk:
                # distinct key stream from the training keys
                # PRNGKey(seed+s): fold the step into a tagged base key.
                # (The one-chunk warmup shift vs the reference's exact
                # step-272 boundary is intentional: the update runs at
                # chunk granularity.)
                occ_rng = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(args.seed), 0x0CC),
                    start)
                grid_density, occupancy = occ_update(
                    params, grid_density, occ_rng)
            params, opt_state, metrics = step_fn(
                params, opt_state, cameras, batches, rngs, occupancy)
        else:
            params, opt_state, metrics = step_fn(
                params, opt_state, cameras, batches, rngs)
        step = start + chunk - 1
        if (step // chunk) % max(1, args.log_every // chunk) == 0 \
                or c == n_chunks - 1:
            print(f"step {step}: loss={float(metrics['total_loss']):.5f} "
                  f"({(time.time() - t0):.0f}s)", flush=True)

    out = (Path(args.output_dir) / Path(args.data).name / name /
           time.strftime("%Y-%m-%d_%H%M%S"))
    out.mkdir(parents=True, exist_ok=True)
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save((out / "params").absolute(), params)
    ckptr.wait_until_finished()

    # eval PSNR on one held-out view, chunked generic render
    ec = jax.tree.map(jnp.asarray, dm.eval_cameras)
    h, w = ec.height, ec.width
    from samnerf_tpu.engine.eval_render import _chunked_coords
    coords = jnp.asarray(_chunked_coords(h, w, 4096))

    @jax.jit
    def render(params):
        kw = {"occupancy": occupancy} if method.use_occupancy else {}
        def body(c):
            rb = generate_rays(ec, jnp.zeros((c.shape[0],), jnp.int32), c)
            return model.apply(params, rb, train=False, **kw)["rgb"]
        return jax.lax.map(body, coords)

    rgb = np.asarray(render(params)).reshape(-1, 3)[:h * w].reshape(h, w, 3)
    gt = dm.eval_images[0].astype(np.float32) / 255.0
    p = float(psnr(jnp.asarray(rgb), jnp.asarray(gt)))
    print(f"eval view 0 PSNR: {p:.2f}; saved {out}")
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    registry = method_configs()
    if not argv or argv[0] in ("-h", "--help"):
        from samnerf_tpu.configs.zoo import zoo_methods
        print(__doc__)
        print("methods:", ", ".join(registry),
              "| zoo:", ", ".join(zoo_methods()))
        return 0
    method = argv.pop(0)
    if method not in registry:
        from samnerf_tpu.configs.zoo import zoo_methods
        if method in zoo_methods():
            return train_zoo(method, argv)
        print(f"unknown method {method!r}; available: {', '.join(registry)}")
        return 2
    config = registry[method]
    config = apply_overrides(config, argv)
    timestamp = time.strftime("%Y-%m-%d_%H%M%S")
    config.trainer.output_dir = (Path(config.trainer.output_dir) /
                                 Path(config.datamanager.dataparser.data).name /
                                 method / timestamp)
    save_config(config)
    train_loop(config)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
