"""Full-image rendering: rgb/depth/accumulation + low-res SAM and ClipSeg
feature grids, as ONE jitted program per resolution.

Reference: ``SAMModel.get_outputs_for_camera_ray_bundle``
(``samnerf/sam_model.py:337-418``): full-res rgb pass in ray chunks, a
separate (feature_h*ps x feature_w*ps) ray grid rearranged patch-major for
the SAM feature render, and a 32x32 grid for ClipSeg.

TPU redesign: the reference's python chunk loop (one kernel launch + host
sync per 2^15 rays) becomes ``lax.map`` over fixed-size chunks inside a
single jit — one dispatch and one device->host fetch per frame.  Pixel
coordinates are generated on device from the static resolution, so nothing
but the camera index crosses the host boundary.  One compiled executable
per (height, width, feature-set); bucket resolutions to bound recompiles.
"""
from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from samnerf_tpu.core.cameras import Cameras, generate_rays
from samnerf_tpu.models.sam_model import SAMModel


def get_feature_size(h: int, w: int, largesize: int = 64) -> Tuple[int, int]:
    """SAM's 64x64-embedding aspect logic (``samnerf/sam_utils.py:7-14``).

    The reference leaves h == w to fall through (both sides = largesize).
    """
    if h < w:
        return int(math.ceil(h / w * largesize)), largesize
    if h > w:
        return largesize, int(math.ceil(w / h * largesize))
    return largesize, largesize


def _chunked_coords(h: int, w: int, chunk: int) -> np.ndarray:
    """Row-major full-image (row, col) coords, padded and chunked:
    [n_chunks, chunk, 2] float32 (static; becomes a jit constant)."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords = np.stack([yy, xx], -1).reshape(-1, 2).astype(np.float32)
    pad = (-coords.shape[0]) % chunk
    if pad:
        coords = np.concatenate([coords, np.tile(coords[-1:], (pad, 1))])
    return coords.reshape(-1, chunk, 2)


def _feature_grid_coords(h: int, w: int, fh: int, fw: int, ps: int,
                         chunk: int) -> np.ndarray:
    """Patch-major linspace ray grid (``sam_model.py:369-379``):
    [n_chunks, chunk, 2]."""
    hi = np.linspace(0, h - 1, fh * ps)
    wi = np.linspace(0, w - 1, fw * ps)
    hh, ww = np.meshgrid(hi, wi, indexing="ij")
    grid = np.stack([hh, ww], -1).reshape(fh, ps, fw, ps, 2)
    grid = grid.transpose(0, 2, 1, 3, 4).reshape(-1, 2).astype(np.float32)
    pad = (-grid.shape[0]) % chunk
    if pad:
        grid = np.concatenate([grid, np.tile(grid[-1:], (pad, 1))])
    return grid.reshape(-1, chunk, 2)


class ImageRenderer:
    """Per-resolution jitted frame renderers over a shared model."""

    def __init__(self, model: SAMModel, chunk: int = 1 << 15):
        self.model = model
        self.cfg = model.config
        self.chunk = chunk
        self._frame_fns = {}

    def _build_frame_fn(self, h: int, w: int, features: Tuple[str, ...],
                        use_crop: bool = False):
        cfg = self.cfg
        chunk = self.chunk
        rgb_coords = jnp.asarray(_chunked_coords(h, w, chunk))
        n_pix = h * w

        sam_coords = None
        fh = fw = None
        if "sam" in features and cfg.distill_sam:
            fh, fw = get_feature_size(h, w)
            sam_coords = jnp.asarray(
                _feature_grid_coords(h, w, fh, fw, cfg.patch_size, chunk))
        clipseg_coords = None
        if "clipseg" in features and cfg.distill_sam and cfg.use_clipseg_feature:
            hi = np.linspace(0, h - 1, 32)
            wi = np.linspace(0, w - 1, 32)
            hh, ww = np.meshgrid(hi, wi, indexing="ij")
            clipseg_coords = jnp.asarray(
                np.stack([hh, ww], -1).reshape(1, 1024, 2).astype(np.float32))

        def frame(params, cameras, cam_idx, crop_aabb=None, crop_bg=None):
            def run(coords, get_features):
                def body(c):
                    # idx vector sized to this grid's chunk width (the
                    # clipseg grid is one 1024-ray chunk, not `chunk`)
                    rb = generate_rays(
                        cameras,
                        jnp.full((c.shape[0],), 0, jnp.int32) + cam_idx, c,
                        aabb_box=crop_aabb)
                    return self.model.apply(params, rb, train=False,
                                            get_features=get_features,
                                            bg_color=crop_bg)
                return jax.lax.map(body, coords)

            out = run(rgb_coords, ())
            outputs = {
                "rgb": out["rgb"].reshape(-1, 3)[:n_pix].reshape(h, w, 3),
                "depth": out["depth"].reshape(-1, 1)[:n_pix].reshape(h, w, 1),
                "accumulation": out["accumulation"].reshape(-1, 1)[:n_pix]
                .reshape(h, w, 1),
            }
            for i in range(cfg.num_proposal_iterations):
                k = f"prop_depth_{i}"
                outputs[k] = out[k].reshape(-1, 1)[:n_pix].reshape(h, w, 1)
            if sam_coords is not None:
                sam = run(sam_coords, ("sam",))["sam"]
                outputs["sam"] = sam.reshape(-1, sam.shape[-1])[:fh * fw] \
                    .reshape(fh, fw, -1)
            if clipseg_coords is not None:
                cs = run(clipseg_coords, ("clipseg",))["clipseg"]
                outputs["clipseg"] = cs.reshape(32, 32, -1)
            return outputs

        if use_crop:
            return jax.jit(frame)
        return jax.jit(lambda params, cameras, cam_idx: frame(params, cameras,
                                                              cam_idx))

    def _frame_fn(self, h: int, w: int, features: Tuple[str, ...],
                  use_crop: bool):
        key = (h, w, tuple(features), use_crop)
        if key not in self._frame_fns:
            self._frame_fns[key] = self._build_frame_fn(h, w, tuple(features),
                                                        use_crop)
        return self._frame_fns[key]

    def render_image(self, params, cameras: Cameras, camera_index: int,
                     width: Optional[int] = None, height: Optional[int] = None,
                     features: Tuple[str, ...] = (),
                     crop_aabb=None, crop_bg=None) -> Dict[str, np.ndarray]:
        """Render one camera; returns host numpy arrays.

        crop_aabb: optional [2, 3] viewer crop box (traced — dragging the
        crop sliders never recompiles); crop_bg: optional [3] rgb in [0,1].
        """
        h = height or cameras.height
        w = width or cameras.width
        fn = self._frame_fn(h, w, tuple(features), crop_aabb is not None)
        ci = jnp.asarray(camera_index, jnp.int32)
        if crop_aabb is not None:
            bg = (jnp.zeros(3) if crop_bg is None
                  else jnp.asarray(crop_bg, jnp.float32))
            out = fn(params, cameras, ci, jnp.asarray(crop_aabb, jnp.float32),
                     bg)
        else:
            out = fn(params, cameras, ci)
        return {k: np.asarray(v) for k, v in out.items()}

    def render_image_device(self, params, cameras: Cameras, camera_index,
                            width: int, height: int,
                            features: Tuple[str, ...] = (),
                            crop_aabb=None, crop_bg=None):
        """Device-resident variant (viewer keeps arrays on device)."""
        fn = self._frame_fn(height, width, tuple(features),
                            crop_aabb is not None)
        ci = jnp.asarray(camera_index, jnp.int32)
        if crop_aabb is not None:
            bg = (jnp.zeros(3) if crop_bg is None
                  else jnp.asarray(crop_bg, jnp.float32))
            return fn(params, cameras, ci,
                      jnp.asarray(crop_aabb, jnp.float32), bg)
        return fn(params, cameras, ci)


def build_sharded_frame_fn(renderer: ImageRenderer, mesh, h: int, w: int,
                           features: Tuple[str, ...] = (),
                           sam=None, max_points: int = 4):
    """Data-parallel INTERACTIVE frame rendering over a device mesh.

    The single-chip frame fn lax.maps over ray chunks; here every ray
    grid's chunk axis is sharded over the mesh's data axis with
    ``shard_map`` — each chip renders its slice of the rgb frame, the
    SAM 64x64x256 feature grid, and the ClipSeg 32x32 grid; XLA
    all-gathers at the shard_map boundary.  When a ``sam`` module is
    given, the full view-time path — prompt encode + mask decode on the
    RENDERED embedding (``predictor.set_feature`` flow,
    ``samnerf/sam_model.py:337-548``) + red overlay composite — runs in
    the same jitted program, so one dispatch serves a complete
    interactive frame on an N-chip slice.  Replaces the reference's
    single-GPU viewer render (``render_state_machine.py:135-243``) at
    scale.

    Returned fn: ``frame(params, cameras, cam_idx)`` or, with ``sam``,
    ``frame(params, dec_params, cameras, cam_idx, coords, labels)`` where
    coords [1, max_points, 2] are 1024-frame prompt coords padded with
    label -1 and ``labels`` [1, max_points].
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from samnerf_tpu.parallel.mesh import DATA_AXIS

    cfg = renderer.cfg
    chunk = renderer.chunk
    n_dev = mesh.shape[DATA_AXIS]

    def _pad_to_dev(coords):
        pad = (-coords.shape[0]) % n_dev
        if pad:
            coords = jnp.concatenate(
                [coords, jnp.tile(coords[-1:], (pad, 1, 1))])
        return coords

    rgb_coords = _pad_to_dev(jnp.asarray(_chunked_coords(h, w, chunk)))
    n_pix = h * w

    sam_coords = None
    fh = fw = None
    if "sam" in features and cfg.distill_sam:
        fh, fw = get_feature_size(h, w)
        sam_coords = _pad_to_dev(jnp.asarray(
            _feature_grid_coords(h, w, fh, fw, cfg.patch_size,
                                 min(chunk, 2048))))
    clipseg_coords = None
    if "clipseg" in features and cfg.distill_sam and cfg.use_clipseg_feature:
        hi = np.linspace(0, h - 1, 32)
        wi = np.linspace(0, w - 1, 32)
        hh, ww = np.meshgrid(hi, wi, indexing="ij")
        grid = np.stack([hh, ww], -1).reshape(-1, 2).astype(np.float32)
        # one 1024/n_dev-ray chunk per device
        clipseg_coords = jnp.asarray(grid.reshape(n_dev, 1024 // n_dev, 2))

    def local_render(params, cameras, cam_idx, coords, get_features):
        def body(c):
            rb = generate_rays(
                cameras, jnp.full((c.shape[0],), 0, jnp.int32) + cam_idx, c)
            return renderer.model.apply(params, rb, train=False,
                                        get_features=get_features)
        return jax.lax.map(body, coords)

    def smap(get_features):
        return shard_map(
            functools.partial(local_render, get_features=get_features),
            mesh=mesh, in_specs=(P(), P(), P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS), check_rep=False)

    def render_all(params, cameras, cam_idx):
        out = smap(())(params, cameras, cam_idx, rgb_coords)
        res = {}
        for k in ("rgb", "depth", "accumulation"):
            if k in out:
                v = out[k]
                res[k] = v.reshape(-1, v.shape[-1])[:n_pix].reshape(
                    h, w, v.shape[-1])
        if sam_coords is not None:
            s = smap(("sam",))(params, cameras, cam_idx, sam_coords)["sam"]
            res["sam"] = s.reshape(-1, s.shape[-1])[:fh * fw].reshape(
                fh, fw, -1)
        if clipseg_coords is not None:
            c = smap(("clipseg",))(params, cameras, cam_idx,
                                   clipseg_coords)["clipseg"]
            res["clipseg"] = c.reshape(-1, c.shape[-1])[:1024].reshape(
                32, 32, -1)
        return res

    if sam is None:
        @jax.jit
        def frame(params, cameras, cam_idx):
            return render_all(params, cameras, cam_idx)
        return frame

    from samnerf_tpu.perception.sam.sam import Sam, postprocess_masks

    @jax.jit
    def frame(params, dec_params, cameras, cam_idx, coords, labels):
        out = render_all(params, cameras, cam_idx)
        feat = out["sam"]
        pad_r = 64 - feat.shape[0]
        pad_c = 64 - feat.shape[1]
        feat = jnp.pad(feat, ((0, pad_r), (0, pad_c), (0, 0)))
        low_res, _ = sam.apply(dec_params, feat[None], (coords, labels),
                               None, None, False, method=Sam.decode_masks)
        masks = postprocess_masks(low_res, (1024, 1024), (h, w),
                                  sam.image_encoder.img_size)
        mask = masks[0, 0] > 0.0
        rgb = out["rgb"]
        overlay = jnp.where(mask[..., None],
                            0.5 * rgb + 0.5 * jnp.asarray([1.0, 0.0, 0.0]),
                            rgb)
        out["masked_rgb"] = jnp.clip(overlay, 0.0, 1.0)
        return out

    return frame
