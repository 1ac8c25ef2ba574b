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


import os as _os

PIXEL_BLOCK = int(_os.environ.get("SAMNERF_PIXEL_BLOCK", "32"))
"""Side of the 2D pixel blocks the serve ray stream is tiled into: 32x32
pixels = 1024 consecutive rays = one ``fields.nerfacto_field.SAMPLE_BLOCK``
— so hash-kernel tiles see compact image regions, not full-width strips,
and the morton slab skip actually bites.  All reorders are static
reshape/transposes (never gathers, which are scalar-core-bound on TPU).
Env-overridable for A/B runs (1 = row-major order)."""


def _chunked_coords(h: int, w: int, chunk: int) -> np.ndarray:
    """Row-major full-image (row, col) coords, padded and chunked:
    [n_chunks, chunk, 2] float32 (static; becomes a jit constant)."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords = np.stack([yy, xx], -1).reshape(-1, 2).astype(np.float32)
    pad = (-coords.shape[0]) % chunk
    if pad:
        coords = np.concatenate([coords, np.tile(coords[-1:], (pad, 1))])
    return coords.reshape(-1, chunk, 2)


def _blocked_coords(h: int, w: int, chunk: int, bs: int = PIXEL_BLOCK):
    """Full-image coords in 2D-block order + the inverse reshape.

    Returns (coords [n_chunks, chunk, 2], unflatten) where
    ``unflatten(flat [>=h*w, C]) -> [h, w, C]`` undoes the block order
    with reshapes/transposes only.  Falls back to row-major when the
    resolution does not tile evenly."""
    if h % bs or w % bs or chunk % (bs * bs):
        coords = _chunked_coords(h, w, chunk)

        def unflatten(flat):
            return flat[:h * w].reshape(h, w, flat.shape[-1])

        return coords, unflatten
    bh, bw = h // bs, w // bs
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    grid = np.stack([yy, xx], -1).astype(np.float32)
    grid = grid.reshape(bh, bs, bw, bs, 2).transpose(0, 2, 1, 3, 4) \
        .reshape(-1, 2)
    pad = (-grid.shape[0]) % chunk
    if pad:
        grid = np.concatenate([grid, np.tile(grid[-1:], (pad, 1))])

    def unflatten(flat):
        c = flat.shape[-1]
        x = flat[:h * w].reshape(bh, bw, bs, bs, c)
        return jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(h, w, c)

    return grid.reshape(-1, chunk, 2), unflatten


def _feature_grid_rays(h: int, w: int, fh: int, fw: int, ps: int,
                       bs: int = PIXEL_BLOCK):
    """Patch-major linspace ray grid (``sam_model.py:369-379``) in
    2D-patch-block order + the patch-level inverse reshape.

    Returns (coords [fh*fw*ps*ps, 2] float, unflatten) where
    ``unflatten(patch_feats [>=fh*fw, C]) -> [fh, fw, C]``.  Ray order:
    patch-block (bs/ps x bs/ps patches) -> patch -> pixel-in-patch, so
    the conv head still sees contiguous ps^2 pixel groups while kernel
    tiles see compact image regions."""
    hi = np.linspace(0, h - 1, fh * ps)
    wi = np.linspace(0, w - 1, fw * ps)
    hh, ww = np.meshgrid(hi, wi, indexing="ij")
    grid = np.stack([hh, ww], -1).reshape(fh, ps, fw, ps, 2)
    grid = grid.transpose(0, 2, 1, 3, 4)       # [fh, fw, ps, ps, 2]
    pb = max(bs // ps, 1)
    if fh % pb == 0 and fw % pb == 0 and pb > 1:
        gh, gw = fh // pb, fw // pb
        grid = grid.reshape(gh, pb, gw, pb, ps, ps, 2) \
            .transpose(0, 2, 1, 3, 4, 5, 6)

        def unflatten(flat):
            c = flat.shape[-1]
            x = flat[:fh * fw].reshape(gh, gw, pb, pb, c)
            return jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(fh, fw, c)
    else:
        def unflatten(flat):
            return flat[:fh * fw].reshape(fh, fw, flat.shape[-1])
    return grid.reshape(-1, 2).astype(np.float32), unflatten


def _feature_grid_coords(h: int, w: int, fh: int, fw: int, ps: int,
                         chunk: int, bs: int = PIXEL_BLOCK):
    """:func:`_feature_grid_rays`, padded and chunked for ``lax.map``:
    returns (coords [n_chunks, chunk, 2], unflatten)."""
    grid, unflatten = _feature_grid_rays(h, w, fh, fw, ps, bs)
    pad = (-grid.shape[0]) % chunk
    if pad:
        grid = np.concatenate([grid, np.tile(grid[-1:], (pad, 1))])
    return grid.reshape(-1, chunk, 2), unflatten


def _stream_index(h: int, w: int, chunk: int, bs: int = PIXEL_BLOCK):
    """Static (row, col) -> position in the :func:`_blocked_coords` ray
    stream (must mirror its blocked/row-major fallback logic)."""
    if h % bs or w % bs or chunk % (bs * bs):
        def index(r, c):
            return r * w + c
        return index
    bw = w // bs

    def index(r, c):
        return ((r // bs) * bw + c // bs) * bs * bs + (r % bs) * bs + (c % bs)
    return index


def _fused_feature_eval(model, params, cameras, cam_idx, w_flat, mid_flat,
                        px_coords, idx, get_features, rays_per_call,
                        k_top, group=1):
    """Feature rendering that reuses the rgb pass's top-k samples.

    ``w_flat`` [N, K, 1] / ``mid_flat`` [N, K] are the rgb stream's
    sharpened top-k weights and euclidean sample mids; ``idx`` [M] maps
    each feature ray to its (identical) pixel ray in that stream.  Only
    the SAM/ClipSeg field runs here — proposals+nerf were already paid
    for by the rgb pass (vs the reference re-running the full stack per
    grid, ``samnerf/sam_model.py:358-418``).  Rays are padded to a
    multiple of ``rays_per_call`` in whole ``group``-ray units (conv
    patches); callers slice the padding off the result.
    """
    wk = jnp.take(w_flat, idx, axis=0)
    mid = jnp.take(mid_flat, idx, axis=0)
    rb = generate_rays(
        cameras, jnp.full((idx.shape[0],), 0, jnp.int32) + cam_idx,
        px_coords)
    pos = (rb.origins[:, None, :] + rb.directions[:, None, :]
           * mid[..., None])
    m = pos.shape[0]
    pad = (-m) % rays_per_call
    if pad:
        pos = jnp.concatenate(
            [pos, jnp.tile(pos[-group:], (pad // group, 1, 1))])
        wk = jnp.concatenate(
            [wk, jnp.tile(wk[-group:], (pad // group, 1, 1))])
    posc = pos.reshape(-1, rays_per_call, k_top, 3)
    wc = wk.reshape(-1, rays_per_call, k_top, 1)
    res = jax.lax.map(
        lambda ab: model.apply(params, ab[0], ab[1], get_features,
                               cull=True,
                               method=SAMModel.features_from_topk),
        (posc, wc))
    return {k: v.reshape(-1, v.shape[-1]) for k, v in res.items()}


class ImageRenderer:
    """Per-resolution jitted frame renderers over a shared model."""

    def __init__(self, model: SAMModel, chunk: int = 1 << 15,
                 fuse_features: bool = True):
        self.model = model
        self.cfg = model.config
        self.chunk = chunk
        self.fuse_features = fuse_features
        """Fused serve path: the feature grids reuse the rgb pass's
        proposal+nerf work (top-k sample depths/weights per pixel ray)
        instead of re-running the full stack on separate ray grids.  The
        feature rays are the reference's linspace grids rounded to the
        nearest integer pixel — rays the rgb pass already rendered — so
        the result equals the unfused path evaluated at those rounded
        coords (eval-mode sampling is deterministic per ray).  False
        restores the reference's independent grids
        (``samnerf/sam_model.py:358-418``)."""
        import threading
        self._frame_fns = {}
        self._lock = threading.Lock()
        """Serializes frame-fn build + dispatch: the viewer's render
        thread and eval/test threads share one renderer, and both the
        ``_frame_fns`` cache and first-call jit tracing must not race."""

    def _build_frame_fn(self, h: int, w: int, features: Tuple[str, ...],
                        use_crop: bool = False, use_occ: bool = False,
                        minimal: bool = False):
        cfg = self.cfg
        chunk = self.chunk
        rgb_np, rgb_unflatten = _blocked_coords(h, w, chunk)
        rgb_coords = jnp.asarray(rgb_np)

        want_sam = "sam" in features and cfg.distill_sam
        want_clipseg = ("clipseg" in features and cfg.distill_sam
                        and cfg.use_clipseg_feature)
        fuse = self.fuse_features and (want_sam or want_clipseg)

        sam_coords = sam_unflatten = None
        clipseg_coords = None
        sam_px = sam_idx = None
        cs_px = cs_idx = None
        if want_sam:
            fh, fw = get_feature_size(h, w)
            if fuse:
                grid, sam_unflatten = _feature_grid_rays(
                    h, w, fh, fw, cfg.patch_size)
                px = np.rint(grid).astype(np.int64)
                idx_of = _stream_index(h, w, chunk)
                sam_idx = jnp.asarray(
                    idx_of(px[:, 0], px[:, 1]).astype(np.int32))
                sam_px = jnp.asarray(px.astype(np.float32))
            else:
                sam_np, sam_unflatten = _feature_grid_coords(
                    h, w, fh, fw, cfg.patch_size, chunk)
                sam_coords = jnp.asarray(sam_np)
        if want_clipseg:
            hi = np.linspace(0, h - 1, 32)
            wi = np.linspace(0, w - 1, 32)
            hh, ww = np.meshgrid(hi, wi, indexing="ij")
            cs_grid = np.stack([hh, ww], -1).reshape(-1, 2)
            if fuse:
                px = np.rint(cs_grid).astype(np.int64)
                idx_of = _stream_index(h, w, chunk)
                cs_idx = jnp.asarray(
                    idx_of(px[:, 0], px[:, 1]).astype(np.int32))
                cs_px = jnp.asarray(px.astype(np.float32))
            else:
                clipseg_coords = jnp.asarray(
                    cs_grid.reshape(1, 1024, 2).astype(np.float32))

        k_top = cfg.num_sam_samples
        ps = cfg.patch_size

        def frame(params, cameras, cam_idx, crop_aabb=None, crop_bg=None,
                  occ=None):
            def run(coords, get_features, return_topk=False):
                def body(c):
                    # idx vector sized to this grid's chunk width (the
                    # clipseg grid is one 1024-ray chunk, not `chunk`)
                    rb = generate_rays(
                        cameras,
                        jnp.full((c.shape[0],), 0, jnp.int32) + cam_idx, c,
                        aabb_box=crop_aabb)
                    return self.model.apply(params, rb, train=False,
                                            get_features=get_features,
                                            bg_color=crop_bg, occupancy=occ,
                                            return_topk=return_topk)
                return jax.lax.map(body, coords)

            out = run(rgb_coords, (), return_topk=fuse)
            outputs = {"rgb": rgb_unflatten(out["rgb"].reshape(-1, 3))}
            if not minimal:
                # depth/accumulation/per-level median depths are viewer
                # outputs; the serve fast path (rgb + feature grids +
                # on-device mask decode) drops them so XLA dead-code-
                # eliminates the one-hot median-depth contractions.
                outputs["depth"] = rgb_unflatten(out["depth"].reshape(-1, 1))
                outputs["accumulation"] = rgb_unflatten(
                    out["accumulation"].reshape(-1, 1))
                for i in range(cfg.num_proposal_iterations):
                    k = f"prop_depth_{i}"
                    outputs[k] = rgb_unflatten(out[k].reshape(-1, 1))

            if fuse:
                w_flat = out["topk_w"].reshape(-1, k_top, 1)
                mid_flat = out["topk_mid"].reshape(-1, k_top)
                if want_sam:
                    # rays per call: a multiple of ps^2 (whole conv
                    # patches), sized so points-per-call matches the rgb
                    # pass's chunk x samples (small calls = many tiny
                    # kernel launches, measurably slower)
                    rpc = max(chunk // (ps * ps), 1) * ps * ps
                    rpc = min(rpc, sam_idx.shape[0])
                    feats = _fused_feature_eval(
                        self.model, params, cameras, cam_idx, w_flat,
                        mid_flat, sam_px, sam_idx, ("sam",), rpc, k_top,
                        group=ps * ps)
                    outputs["sam"] = sam_unflatten(feats["sam"])
                if want_clipseg:
                    feats = _fused_feature_eval(
                        self.model, params, cameras, cam_idx, w_flat,
                        mid_flat, cs_px, cs_idx, ("clipseg",), 1024, k_top)
                    outputs["clipseg"] = feats["clipseg"][:1024].reshape(
                        32, 32, -1)
                return outputs

            if sam_coords is not None:
                sam = run(sam_coords, ("sam",))["sam"]
                outputs["sam"] = sam_unflatten(
                    sam.reshape(-1, sam.shape[-1]))
            if clipseg_coords is not None:
                cs = run(clipseg_coords, ("clipseg",))["clipseg"]
                outputs["clipseg"] = cs.reshape(32, 32, -1)
            return outputs

        # one jitted signature per (crop, occ) combination so untraced
        # Nones never appear as jit operands
        if use_crop and use_occ:
            return jax.jit(frame)
        if use_crop:
            return jax.jit(lambda p, c, i, a, b: frame(p, c, i, a, b))
        if use_occ:
            return jax.jit(lambda p, c, i, occ: frame(p, c, i, occ=occ))
        return jax.jit(lambda params, cameras, cam_idx: frame(params, cameras,
                                                              cam_idx))

    def _frame_fn(self, h: int, w: int, features: Tuple[str, ...],
                  use_crop: bool, use_occ: bool = False,
                  minimal: bool = False):
        key = (h, w, tuple(features), use_crop, use_occ, minimal)
        if key not in self._frame_fns:
            self._frame_fns[key] = self._build_frame_fn(h, w, tuple(features),
                                                        use_crop, use_occ,
                                                        minimal)
        return self._frame_fns[key]

    def render_image(self, params, cameras: Cameras, camera_index: int,
                     width: Optional[int] = None, height: Optional[int] = None,
                     features: Tuple[str, ...] = (),
                     crop_aabb=None, crop_bg=None,
                     occ=None) -> Dict[str, np.ndarray]:
        """Render one camera; returns host numpy arrays.

        crop_aabb: optional [2, 3] viewer crop box (traced — dragging the
        crop sliders never recompiles); crop_bg: optional [3] rgb in [0,1];
        occ: optional baked ``ServeOccupancy`` culling grid (traced).
        """
        h = height or cameras.height
        w = width or cameras.width
        out = self.render_image_device(params, cameras, camera_index, w, h,
                                       features, crop_aabb, crop_bg, occ)
        return {k: np.asarray(v) for k, v in out.items()}

    def render_image_device(self, params, cameras: Cameras, camera_index,
                            width: int, height: int,
                            features: Tuple[str, ...] = (),
                            crop_aabb=None, crop_bg=None, occ=None,
                            minimal: bool = False):
        """Device-resident variant (viewer keeps arrays on device).

        minimal=True returns only rgb (+ requested feature grids): the
        depth / accumulation / per-level median-depth outputs and their
        one-hot contractions are dead-code-eliminated from the compiled
        frame — the serve fast path (``SamNerfRenderer.serve_frame_fn``)
        never consumes them."""
        with self._lock:
            fn = self._frame_fn(height, width, tuple(features),
                                crop_aabb is not None, occ is not None,
                                minimal)
            ci = jnp.asarray(camera_index, jnp.int32)
            args = [params, cameras, ci]
            if crop_aabb is not None:
                args.append(jnp.asarray(crop_aabb, jnp.float32))
                args.append(jnp.zeros(3) if crop_bg is None
                            else jnp.asarray(crop_bg, jnp.float32))
            if occ is not None:
                args.append(occ)
            return fn(*args)


def bake_density_grid(model: SAMModel, params, res: int = 0, sub: int = 2,
                      chunk: int = 1 << 17) -> np.ndarray:
    """Evaluate the trained nerf field's density at ``sub^3`` stratified
    points per cell of a ``res^3`` grid in contracted-unit space and
    max-pool per cell.  The expensive half of :func:`bake_occupancy`
    (one full-capacity field sweep); thresholding/packing is cheap, so
    threshold sweeps should reuse this grid."""
    from samnerf_tpu.ops.occupancy import grid_cell_positions

    res = res or model.config.occ_res
    pts = jnp.asarray(grid_cell_positions(res, sub))
    n = pts.shape[0]
    pad = (-n) % chunk
    if pad:
        pts = jnp.concatenate([pts, jnp.full((pad, 3), 0.5, pts.dtype)])
    pts = pts.reshape(-1, chunk, 3)

    @jax.jit
    def dens(params, pts):
        return jax.lax.map(
            lambda p: model.apply(
                params, p,
                method=lambda m, p: m.fields.density_at_unit(p)), pts)

    d = np.asarray(dens(params, pts)).reshape(-1)[:n]
    return d.reshape(res ** 3, sub ** 3).max(axis=1).reshape(res, res, res)


def occupancy_from_cells(cell_d: np.ndarray, threshold: float = 0.01):
    """Threshold + pack a baked density grid into a
    :class:`~samnerf_tpu.ops.occupancy.ServeOccupancy`; returns
    (occ, occupied_fraction)."""
    from samnerf_tpu.ops.occupancy import (cells_from_density,
                                           pack_serve_occupancy)
    cells = np.asarray(cells_from_density(jnp.asarray(cell_d), threshold))
    return pack_serve_occupancy(cells), float(cells.mean())


def bake_occupancy(model: SAMModel, params, res: int = 0,
                   threshold: float = 0.01, sub: int = 2,
                   chunk: int = 1 << 17):
    """Bake a serve-time occupancy grid from a trained model.

    The nerfacc-OccupancyGrid analogue for the samnerf serve path
    (reference keeps proposal-only sampling at view time,
    ``sam_model.py:358-418``; culling is a pure serving optimization):
    evaluate the trained nerf field's density on a ``res^3`` grid
    (:func:`bake_density_grid`), threshold, and pack (with a built-in
    one-cell dilation) into a
    :class:`~samnerf_tpu.ops.occupancy.ServeOccupancy` table the fields
    can cull against.
    """
    cell_d = bake_density_grid(model, params, res=res, sub=sub, chunk=chunk)
    return occupancy_from_cells(cell_d, threshold)


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

    rgb_np, rgb_unflatten = _blocked_coords(h, w, chunk)
    rgb_coords = _pad_to_dev(jnp.asarray(rgb_np))

    want_sam = "sam" in features and cfg.distill_sam
    want_clipseg = ("clipseg" in features and cfg.distill_sam
                    and cfg.use_clipseg_feature)
    fuse = getattr(renderer, "fuse_features", True) and (want_sam
                                                         or want_clipseg)
    k_top = cfg.num_sam_samples
    ps = cfg.patch_size

    def _fused_grid(grid_np, group):
        """Round to integer pixels, map into the rgb stream, pad to a
        multiple of n_dev whole groups, reshape per-device."""
        px = np.rint(grid_np).astype(np.int64)
        idx_of = _stream_index(h, w, chunk)
        idx = idx_of(px[:, 0], px[:, 1]).astype(np.int32)
        pad = (-len(px)) % (n_dev * group)
        if pad:
            px = np.concatenate([px, np.tile(px[-group:], (pad // group, 1))])
            idx = np.concatenate(
                [idx, np.tile(idx[-group:], pad // group)])
        return (jnp.asarray(px.astype(np.float32)), jnp.asarray(idx))

    sam_coords = sam_unflatten = None
    sam_px = sam_idx = None
    cs_px = cs_idx = None
    clipseg_coords = None
    fh = fw = None
    if want_sam:
        fh, fw = get_feature_size(h, w)
        if fuse:
            grid, sam_unflatten = _feature_grid_rays(h, w, fh, fw, ps)
            sam_px, sam_idx = _fused_grid(grid, ps * ps)
        else:
            sam_np, sam_unflatten = _feature_grid_coords(
                h, w, fh, fw, ps, min(chunk, 2048))
            sam_coords = _pad_to_dev(jnp.asarray(sam_np))
    if want_clipseg:
        hi = np.linspace(0, h - 1, 32)
        wi = np.linspace(0, w - 1, 32)
        hh, ww = np.meshgrid(hi, wi, indexing="ij")
        grid = np.stack([hh, ww], -1).reshape(-1, 2)
        if fuse:
            cs_px, cs_idx = _fused_grid(grid, 1)
        else:
            # one 1024/n_dev-ray chunk per device
            clipseg_coords = jnp.asarray(
                grid.astype(np.float32).reshape(n_dev, 1024 // n_dev, 2))

    def local_render(params, cameras, cam_idx, coords, get_features,
                     return_topk=False):
        def body(c):
            rb = generate_rays(
                cameras, jnp.full((c.shape[0],), 0, jnp.int32) + cam_idx, c)
            return renderer.model.apply(params, rb, train=False,
                                        get_features=get_features,
                                        return_topk=return_topk)
        return jax.lax.map(body, coords)

    def smap(get_features, return_topk=False):
        return shard_map(
            functools.partial(local_render, get_features=get_features,
                              return_topk=return_topk),
            mesh=mesh, in_specs=(P(), P(), P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS), check_rep=False)

    def local_feat(params, cameras, cam_idx, w_flat, mid_flat, px, idx,
                   get_features, group):
        m_loc = px.shape[0]
        rpc = min(m_loc, max((min(chunk, 2048) // k_top) // group, 1) * group)
        res = _fused_feature_eval(
            renderer.model, params, cameras, cam_idx, w_flat, mid_flat,
            px, idx, get_features, rpc, k_top, group=group)
        # drop per-device chunk padding so the shard_map concat is exact
        # (one output row per `group` input rays)
        return {k: v[:m_loc // group] for k, v in res.items()}

    def feat_smap(get_features, group):
        return shard_map(
            functools.partial(local_feat, get_features=get_features,
                              group=group),
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS), check_rep=False)

    def render_all(params, cameras, cam_idx):
        out = smap((), return_topk=fuse)(params, cameras, cam_idx,
                                         rgb_coords)
        res = {}
        for k in ("rgb", "depth", "accumulation"):
            if k in out:
                v = out[k]
                res[k] = rgb_unflatten(v.reshape(-1, v.shape[-1]))
        if fuse:
            w_flat = out["topk_w"].reshape(-1, k_top, 1)
            mid_flat = out["topk_mid"].reshape(-1, k_top)
            if want_sam:
                # per-device padding inside local_feat stays, so slice
                # each device's real rows: per-dev ray counts are equal
                # by _fused_grid's padding -> concatenation is exact
                s = feat_smap(("sam",), ps * ps)(
                    params, cameras, cam_idx, w_flat, mid_flat,
                    sam_px, sam_idx)["sam"]
                res["sam"] = sam_unflatten(s.reshape(-1, s.shape[-1]))
            if want_clipseg:
                c = feat_smap(("clipseg",), 1)(
                    params, cameras, cam_idx, w_flat, mid_flat,
                    cs_px, cs_idx)["clipseg"]
                res["clipseg"] = c.reshape(-1, c.shape[-1])[:1024].reshape(
                    32, 32, -1)
            return res
        if sam_coords is not None:
            s = smap(("sam",))(params, cameras, cam_idx, sam_coords)["sam"]
            res["sam"] = sam_unflatten(s.reshape(-1, s.shape[-1]))
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
