"""View-time pipeline: render a camera, lock 3D prompts, decode SAM masks.

Reference: ``SAMModel.get_outputs_for_camera_ray_bundle``
(``samnerf/sam_model.py:337-548``) and its geometry helpers
(``project`` :95-123, ``show_prompts`` visibility test :48-92):

1. render rgb/depth (+ SAM 64x64x256 and ClipSeg 32x32x192 feature grids
   when distilling);
2. a new 2D click is back-projected through the rendered depth (minus
   TOR=1e-2) into a persistent 3D point (:437-469);
3. every frame, all locked 3D points are re-projected into the current
   view, bounds-filtered (:473-483) and visibility-tested against depth;
4. the rendered SAM embedding is injected via ``predictor.set_feature``
   (:486) and masks are decoded from the projected points (+ ClipSeg
   text-relevance points, :487-514);
5. output composite ``masked_rgb`` with pin overlay (:516-528).

The no-distill branch instead runs LanguageSAM on the rendered rgb
(:529-542).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from samnerf_tpu.core.cameras import Cameras
from samnerf_tpu.engine.eval_render import ImageRenderer
from samnerf_tpu.models.sam_model import SAMModel

EPS = 1e-4  # visibility epsilon (sam_model.py:36)
TOR = 1e-2  # back-projection depth offset (sam_model.py:37)


def serve_model(model: SAMModel, nerf: int = 0, props: int = 0,
                k: int = 0) -> SAMModel:
    """A serve-time variant of ``model`` with reduced sample counts.

    Sample counts are static config, not checkpoint state, so the same
    trained params serve through any of these. Measured on a 1000-step
    2^19 checkpoint at 512^2 (scripts/tune_serve.py, one v5e chip):
    masking-based culling (baked occupancy, early termination) does NOT
    help — dead samples cost the same as live ones in the encode scan —
    but fewer samples do. SAM top-k 16->8 is visually identical
    (59.7 dB frame parity; the train-time weight sharpening w^10
    concentrates mass on the top 1-3 samples) and nerf 16 / props 32 /
    k 4 reaches 2.3x the full-count frame rate.
    """
    cfg = model.config
    if cfg.sort_points:
        # serve streams are 2D-block-coherent by construction; the
        # training-batch morton sort would be pure overhead here
        cfg = dataclasses.replace(cfg, sort_points=False)
    if nerf:
        # a preset only ever REDUCES counts relative to the trained config
        cfg = dataclasses.replace(
            cfg, num_nerf_samples_per_ray=min(
                nerf, cfg.num_nerf_samples_per_ray))
    if props:
        cfg = dataclasses.replace(
            cfg, num_proposal_samples_per_ray=tuple(
                min(props, p) for p in cfg.num_proposal_samples_per_ray))
    if k or nerf:
        # never RAISE k above the trained top-k; cap at the serve nerf count
        cfg = dataclasses.replace(
            cfg, num_sam_samples=min(k or cfg.num_sam_samples,
                                     cfg.num_sam_samples,
                                     cfg.num_nerf_samples_per_ray))
    return SAMModel(cfg)


def backproject(points_2d: np.ndarray, depth: np.ndarray, intrin: np.ndarray,
                c2w: np.ndarray) -> np.ndarray:
    """2D clicks -> 3D points through rendered depth
    (``sam_model.py:446-463``).

    points_2d: [N, 2] int (x, y); depth: [H, W] or [H, W, 1]; c2w: [3|4, 4].
    """
    depth = depth[..., 0] if depth.ndim == 3 else depth
    fx, fy = intrin[0, 0], intrin[1, 1]
    cx, cy = intrin[0, 2], intrin[1, 2]
    px = points_2d[:, 0].astype(np.int64)
    py = points_2d[:, 1].astype(np.int64)
    t = depth[py, px] - TOR
    x = (points_2d[:, 0] - cx) / fx
    y = -(points_2d[:, 1] - cy) / fy
    coords = np.stack([x, y, -np.ones_like(x)], axis=-1)  # [N, 3]
    rotation = c2w[:3, :3]
    direction = coords @ rotation.T
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    return c2w[:3, 3][None] + t[:, None] * direction


def project(intrin: np.ndarray, c2w: np.ndarray,
            points: np.ndarray) -> np.ndarray:
    """3D points -> int pixel coords (x, y) (``sam_model.py:95-123``)."""
    fx, fy = intrin[0, 0], intrin[1, 1]
    cx, cy = intrin[0, 2], intrin[1, 2]
    if c2w.shape[0] == 3:
        c2w = np.concatenate([c2w, np.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)
    if points.shape[-1] == 3:
        points = np.concatenate(
            [points, np.ones((points.shape[0], 1))], axis=-1)
    w2c = np.linalg.inv(c2w)[:3]
    img = points @ w2c.T  # [N, 3]
    img = -img / img[:, -1:]
    out = np.stack([img[:, 0] * fx + cx, img[:, 1] * (-fy) + cy], axis=-1)
    return out.astype(np.int32)


def visible_mask(prompts_2d: np.ndarray, prompts_3d: np.ndarray,
                 depth: np.ndarray, intrin: np.ndarray, c2w: np.ndarray,
                 t_reduce: str = "min") -> np.ndarray:
    """Depth visibility test for projected pins (``sam_model.py:60-82``)."""
    depth = depth[..., 0] if depth.ndim == 3 else depth
    fx, fy = intrin[0, 0], intrin[1, 1]
    cx, cy = intrin[0, 2], intrin[1, 2]
    coords = (prompts_2d - np.array([[cx, cy]])) / np.array([[fx, -fy]])
    coords = np.concatenate([coords, -np.ones_like(coords[:, :1])], axis=-1)
    rotation = c2w[:3, :3]
    rays_d = coords @ rotation.T
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = c2w[:3, 3][None]
    # per-axis t = (p-o)/d; components with d≈0 are ill-conditioned (0/0 ->
    # NaN propagating through min) so they are masked out of the reduce
    valid = np.abs(rays_d) > 1e-8
    safe_d = np.where(valid, rays_d, 1.0)
    ratios = (prompts_3d - rays_o) / safe_d
    if t_reduce == "min":
        ts = np.where(valid, ratios, np.inf).min(axis=-1)
    else:
        cnt = np.maximum(valid.sum(axis=-1), 1)
        ts = np.where(valid, ratios, 0.0).sum(axis=-1) / cnt
    d = depth[prompts_2d[:, 1].astype(np.int64),
              prompts_2d[:, 0].astype(np.int64)]
    return ts < (d + EPS)


def pooled_heatmap_points(heat: np.ndarray, image_hw: Tuple[int, int],
                          topk: int = 1000,
                          threshold: float = 0.7) -> Optional[np.ndarray]:
    """ClipSeg relevance -> extra point prompts (``sam_model.py:499-514``):
    16x16 average pool, top-k, > threshold, rescale to image pixels."""
    fh, fw = heat.shape[0] // 16, heat.shape[1] // 16
    pooled = heat.reshape(fh, 16, fw, 16).mean(axis=(1, 3))
    flat = pooled.reshape(-1)
    k = min(topk, flat.size)
    amax = np.argsort(-flat)[:k]
    aw = amax % fw
    ah = amax // fw
    mask = pooled[ah, aw] > threshold
    if not mask.any():
        return None
    pts = np.stack([aw, ah], axis=1)[mask].astype(np.float32)
    pts[:, 0] = pts[:, 0] / fw * image_hw[1]
    pts[:, 1] = pts[:, 1] / fh * image_hw[0]
    return pts


def draw_pins(image: np.ndarray, pins: np.ndarray, radius: int = 4,
              color=(1.0, 0.0, 0.0)) -> np.ndarray:
    """Overlay pin markers (stands in for torchvision draw_keypoints at
    ``sam_model.py:84-92``)."""
    img = image.copy()
    h, w = img.shape[:2]
    for x, y in pins.astype(np.int64):
        y0, y1 = max(0, y - radius), min(h, y + radius + 1)
        x0, x1 = max(0, x - radius), min(w, x + radius + 1)
        yy, xx = np.mgrid[y0:y1, x0:x1]
        inside = (yy - y) ** 2 + (xx - x) ** 2 <= radius ** 2
        img[yy[inside], xx[inside]] = color
    return img


def cameras_from_intrin_c2w(intrin: np.ndarray, c2w: np.ndarray,
                            height: int, width: int) -> Cameras:
    """Single-camera pytree from a viewer camera message
    (``render_state_machine.py:176-186``)."""
    return Cameras(
        camera_to_worlds=jnp.asarray(c2w, jnp.float32)[None, :3, :4],
        fx=jnp.asarray([[intrin[0, 0]]], jnp.float32),
        fy=jnp.asarray([[intrin[1, 1]]], jnp.float32),
        cx=jnp.asarray([[intrin[0, 2]]], jnp.float32),
        cy=jnp.asarray([[intrin[1, 2]]], jnp.float32),
        width=int(width), height=int(height))


class SamNerfRenderer:
    """Stateful interactive renderer (the viewer's backend)."""

    #: measured serve presets (see :func:`serve_model`): "static" keeps
    #: the train-count rgb path but trims the SAM-field top-k to 8
    #: (visually identical, +35% FPS); "move" additionally halves the
    #: nerf/proposal counts — the TPU analogue of the reference's
    #: degrade-during-motion resolution controller
    #: (``render_state_machine.py:321-359``), trading samples instead of
    #: (or on top of) resolution.
    SERVE_PRESETS = {"full": dict(),
                     "static": dict(k=8),
                     "move": dict(nerf=16, props=32, k=2)}

    def __init__(self, model: SAMModel, sam_predictor=None,
                 clipseg_predictor=None, lang_sam=None,
                 chunk: int = 1 << 15, serve_preset: str = "full"):
        model = serve_model(model, **self.SERVE_PRESETS[serve_preset])
        self.renderer = ImageRenderer(model, chunk=chunk)
        self.cfg = model.config
        self.predictor = sam_predictor
        self.clipseg = clipseg_predictor
        self.lang_sam = lang_sam
        self.prompts: Optional[np.ndarray] = None  # [M, 3] locked 3D points
        self.occ = None  # baked ServeOccupancy culling grid (optional)
        self._move_renderer: Optional[ImageRenderer] = None
        if serve_preset == "static":
            self._move_renderer = ImageRenderer(
                serve_model(model, **self.SERVE_PRESETS["move"]),
                chunk=chunk)

    def _renderer_for(self, preset: str) -> ImageRenderer:
        if preset == "move" and self._move_renderer is not None:
            return self._move_renderer
        return self.renderer

    def clear_prompts(self):
        self.prompts = None

    def bake_serve_tables(self, params, optimize: int = 12):
        """Pre-quantize every hash table for serving
        (``ops.hash_pallas.bake_quantized_tables``): the per-frame
        quantize+pack of the f32 masters disappears from the jitted
        frame, and the bake's MSE-optimal clip scales replace the
        outlier-dominated max scales (a pure quality win at int4).
        Returns the augmented params pytree; no-op unless this renderer
        serves quantized tables."""
        if not self.cfg.hash_q8_serve:
            return params
        from samnerf_tpu.ops.hash_pallas import bake_quantized_tables
        return bake_quantized_tables(params, optimize=optimize)

    def bake_occupancy(self, params, **kw):
        """Bake + install the serve occupancy grid from trained params
        (``engine.eval_render.bake_occupancy``); subsequent renders cull
        empty space.  Returns the occupied-cell fraction."""
        from samnerf_tpu.engine.eval_render import bake_occupancy
        self.occ, frac = bake_occupancy(self.renderer.model, params, **kw)
        return frac

    def serve_frame_fn(self, sam, dec_params, height: int, width: int,
                       max_points: int = 4, preset: str = "primary"):
        """Device-resident interactive serving fast path.

        Returns ``serve(params, cameras, cam_idx, click_xy) -> uint8
        [H, W, 3] device array``: one pipelined dispatch renders the
        view (rgb + SAM/ClipSeg feature grids via the fused frame fn),
        decodes a mask from the click prompt on the RENDERED embedding
        (the ``predictor.set_feature`` replacement flow,
        ``samnerf/sam_model.py:486``) and composites the red overlay —
        all on device; only the final uint8 frame crosses to the host.
        This is the path ``bench.py`` measures, and the all-device
        analogue of :meth:`render_view` (which round-trips through the
        host for interactive prompt locking).
        """
        from samnerf_tpu.perception.sam.sam import Sam, postprocess_masks

        H, W = height, width
        renderer = self._renderer_for(preset)
        feats = (("sam", "clipseg")
                 if self.cfg.distill_sam and self.cfg.use_clipseg_feature
                 else ("sam",) if self.cfg.distill_sam else ())

        occ = self.occ

        @jax.jit
        def render_decode(params, dec_params, cameras, cam_idx, coords,
                          labels):
            # ONE dispatch per frame: the (minimal) frame render inlines
            # with the mask decode + composite, so serving costs a single
            # host->device round trip (two dispatches measurably add
            # tunnel latency per frame)
            frame = renderer.render_image_device(params, cameras, cam_idx,
                                                 W, H, features=feats,
                                                 occ=occ, minimal=True)
            low_res, _ = sam.apply(dec_params, frame["sam"][None],
                                   (coords, labels), None, None, False,
                                   method=Sam.decode_masks)
            masks = postprocess_masks(low_res, (1024, 1024), (H, W),
                                      sam.image_encoder.img_size)
            mask = masks[0, 0] > 0.0
            rgb = frame["rgb"]
            overlay = jnp.where(
                mask[..., None],
                0.5 * rgb + 0.5 * jnp.asarray([1.0, 0.0, 0.0]), rgb)
            img = (jnp.clip(overlay, 0.0, 1.0) * 255.0).astype(jnp.uint8)
            # the ClipSeg grid is part of the serve frame contract (text
            # prompts decode from it); return it so XLA cannot dead-code-
            # eliminate its render when the caller only fetches the frame
            extra = frame["clipseg"] if "clipseg" in frame else mask
            return img, mask, extra

        def serve(params, cameras, cam_idx, click_xy, return_mask=False):
            # click -> 1024-frame coords (ResizeLongestSide convention)
            scale = 1024.0 / max(H, W)
            pts = np.zeros((1, max_points, 2), np.float32)
            pts[0, 0] = [click_xy[0] * scale, click_xy[1] * scale]
            labels = np.full((1, max_points), -1, np.int32)
            labels[0, 0] = 1
            img, mask, _ = render_decode(params, dec_params, cameras, cam_idx,
                                         jnp.asarray(pts), jnp.asarray(labels))
            # mask is a decode by-product already on device; fetching it
            # is opt-in so the benched path still moves one buffer
            return (img, mask) if return_mask else img

        return serve

    def render_view(self, params, cameras: Cameras, camera_index: int,
                    intrin: np.ndarray, c2w: np.ndarray,
                    points: Optional[np.ndarray] = None,
                    text_prompt: Optional[str] = None,
                    topk: int = 5, thresh: float = 0.5,
                    width: Optional[int] = None,
                    height: Optional[int] = None,
                    crop_aabb: Optional[np.ndarray] = None,
                    crop_bg: Optional[np.ndarray] = None,
                    preset: str = "static"
                    ) -> Dict[str, np.ndarray]:
        """Full reference flow (``sam_model.py:337-548``).

        points: [N, 2] float (x, y) accumulated clicks from the client; new
        clicks beyond the locked count are back-projected and locked.
        crop_aabb: optional [2, 3] viewer crop box (``cameras.py:463-482``).
        preset: "move" renders through the reduced-sample move renderer
        when available (camera in motion); anything else uses the primary.
        """
        cfg = self.cfg
        feats = (("sam", "clipseg") if cfg.distill_sam else ())
        renderer = self._renderer_for(preset)
        outputs = renderer.render_image(params, cameras, camera_index,
                                        width=width, height=height,
                                        features=feats,
                                        crop_aabb=crop_aabb,
                                        crop_bg=crop_bg, occ=self.occ)
        h, w = outputs["rgb"].shape[:2]
        outputs["masked_rgb"] = outputs["rgb"]
        prompt = text_prompt if text_prompt is not None else "a man is cooking"

        # --- 3D prompt locking (sam_model.py:427-469)
        if points is None:
            self.prompts = None
        elif len(points) > 0:
            n_locked = 0 if self.prompts is None else len(self.prompts)
            if len(points) > n_locked:
                new_pts = np.asarray(points[n_locked:], np.float64)
                new_3d = backproject(new_pts, outputs["depth"], intrin, c2w)
                self.prompts = (new_3d if self.prompts is None else
                                np.concatenate([self.prompts, new_3d], axis=0))
        else:
            self.prompts = None

        input_points = None
        legal_3d = None
        prompts_2d = None
        if self.prompts is not None:
            prompts_2d = project(intrin, c2w, self.prompts)
            bounds = np.array([[w, h]])
            legal = np.logical_and(prompts_2d >= 0,
                                   prompts_2d < bounds).all(axis=-1)
            prompts_2d = prompts_2d[legal]
            legal_3d = self.prompts[legal]
            input_points = prompts_2d.astype(np.float64)

        if cfg.distill_sam and "sam" in outputs and self.predictor is not None:
            self.predictor.set_feature(outputs["sam"],
                                       original_image_size=(h, w))
            if cfg.use_clipseg_feature and self.clipseg is not None and \
                    text_prompt is not None:
                cond = self.clipseg.encode_text([prompt])
                heat = np.asarray(self.clipseg.decode_rendered(
                    outputs["clipseg"], cond))
                heat = 1.0 / (1.0 + np.exp(-heat))
                outputs["clipseg_feature"] = heat[..., None]
                clip_points = pooled_heatmap_points(heat, (h, w))
                if clip_points is not None:
                    input_points = (clip_points if input_points is None else
                                    np.concatenate([input_points, clip_points]))
            if input_points is not None and len(input_points) > 0:
                labels = np.ones(len(input_points), np.int32)
                masks, _, _ = self.predictor.predict(
                    point_coords=input_points, point_labels=labels,
                    multimask_output=False)
                from samnerf_tpu.perception.langsam import composite_mask
                outputs["masked_rgb"] = composite_mask(
                    masks[0], outputs["rgb"],
                    rng=np.random.default_rng(0)).astype(np.float32)
                if prompts_2d is not None and len(prompts_2d) > 0:
                    vis = visible_mask(prompts_2d.astype(np.float64),
                                       legal_3d, outputs["depth"], intrin, c2w)
                    outputs["masked_rgb"] = draw_pins(
                        outputs["masked_rgb"], prompts_2d[vis],
                        radius=max(1, int(4 * h / 840)))
        elif not cfg.distill_sam and self.lang_sam is not None:
            rgb_uint8 = (outputs["rgb"] * 255).astype(np.uint8)
            outputs["masked_rgb"] = self.lang_sam.set_and_segment(
                rgb_uint8, prompt, pts=topk, thres=thresh,
                points=input_points).astype(np.float32)
            if self.lang_sam.clipseg_feature is not None:
                outputs["clipseg_feature"] = \
                    self.lang_sam.clipseg_feature[..., None]
        return outputs
