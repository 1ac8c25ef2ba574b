"""SAMModel: nerfacto radiance field + proposal sampling + SAM/ClipSeg
feature distillation, as one jittable flax module.

Reference behavior: ``samnerf/sam_model.py`` (SAMModel :179-335, config
:140-161) over ``nerfstudio/models/nerfacto.py`` (NerfactoModel :140-344).
The perception-side eval path (SAM decode, prompt locking) lives in
:mod:`samnerf_tpu.engine.render_pipeline`; this module is the pure
ray->outputs compute graph.

Param tree top level mirrors the reference's optimizer groups
(``samnerf/sam_model.py:330-335``): ``fields``, ``proposal_networks_*``,
``sam_field``, ``conv``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from samnerf_tpu.core.rays import RayBundle
from samnerf_tpu.fields.nerfacto_field import HashMLPDensityField, NerfactoField
from samnerf_tpu.fields.sam_field import ConvHead, SAMField
from samnerf_tpu.ops import losses as loss_ops
from samnerf_tpu.ops import rendering as render_ops
from samnerf_tpu.ops.samplers import proposal_sampling


@dataclasses.dataclass(frozen=True)
class SAMModelConfig:
    """Config values mirror ``samnerf/samconfigs.py:104-164`` (distill preset)
    and ``samnerf/sam_model.py:140-161`` / ``nerfstudio/models/nerfacto.py:68-137``
    defaults."""

    near_plane: float = 0.05
    far_plane: float = 1000.0
    background_color: str = "last_sample"
    # nerfacto field
    hidden_dim: int = 64
    hidden_dim_color: int = 64
    num_levels: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    use_appearance_embedding: bool = False
    # proposal sampling (samconfigs.py:138-141: 1 iter, 64 prop, 32 nerf)
    num_proposal_samples_per_ray: Tuple[int, ...] = (64,)
    num_nerf_samples_per_ray: int = 32
    proposal_update_every: int = 5
    proposal_warmup: int = 5000
    use_proposal_weight_anneal: bool = True
    proposal_weights_anneal_slope: float = 10.0
    proposal_weights_anneal_max_num_iters: int = 1000
    use_single_jitter: bool = True
    # proposal net args (nerfacto.py:103-108)
    proposal_net_args: Tuple[Dict[str, Any], ...] = (
        {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 128},
        {"hidden_dim": 16, "log2_hashmap_size": 17, "num_levels": 5, "max_res": 256},
    )
    # losses (nerfacto.py:112-115, sam_model.py:143-147)
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 0.002
    sam_loss_weight: float = 1.0
    dino_loss_weight: float = 1.0
    clipseg_loss_weight: float = 1.0
    # distillation (sam_model.py:151-161)
    distill_sam: bool = True
    use_dino_feature: bool = False
    use_clipseg_feature: bool = True
    num_sam_samples: int = 16
    sharpening_temperature: float = 10.0
    hidden_layers: int = 1
    hashgrid_layers: Tuple[int, ...] = (12, 12)
    hashgrid_resolutions: Tuple[Tuple[int, int], ...] = ((16, 128), (128, 512))
    hashgrid_sizes: Tuple[int, ...] = (19, 19)
    patch_size: int = 4
    kernel_size: int = 3
    # runtime
    occ_res: int = 96
    """Resolution of the serve-time occupancy-culling grid in contracted
    unit space (baked post-training by ``engine.eval_render.bake_occupancy``
    — the nerfacc OccupancyGrid analogue for the samnerf serve path).
    Culling only activates when an ``occupancy`` grid is passed to
    ``__call__``; training never uses it."""
    hash_q8_serve: bool = False
    """Serve-time int8 hash tables (ParityHashEncoding.quantize_serve):
    ~2x faster table scans at view time; training instances must leave
    this False (gradients to the tables are stopped in q8 mode)."""
    serve_quant_bits: int = 8
    """Quantized-serve table width when ``hash_q8_serve``: 8 (int8) or 4
    (int4 — half the scan row-groups again; costs quantization noise,
    A/B the frame parity: docs/SERVE_AB_r4_fused.json)."""
    serve_quant_bits_props: int = 0
    """Override for the PROPOSAL tables only (0 = same as
    serve_quant_bits).  Proposals just place samples — int4 noise there
    perturbs sample positions, not radiances — so q4-proposals is the
    fallback if full q4 fails frame parity."""
    serve_quant_bits_sam: int = 0
    """Override for the SAM/ClipSeg FEATURE pyramids only (0 = same as
    serve_quant_bits).  The feature pyramids are the largest tables in
    the frame (2 x 12 levels x 8 feats @ 2^19) and their output is
    consumed by the mask decoder, not the eye — int4 there keeps the
    rgb path bit-exact while halving the SAM-field slab scan; qualify
    via MASK parity (decoded-mask IoU vs the q8 frame), not rgb PSNR."""
    serve_fuse_mlp: bool = False
    """Serve-only: run each hash encode + its base MLP as one Pallas
    kernel (``ops.hash_pallas.parity_hash_encode_qmlp``) — the encode
    features stay in VMEM instead of round-tripping HBM through layout
    transposes and separate XLA matmuls.  Requires ``hash_q8_serve``;
    live-masked calls fall back to the unfused kernels."""
    serve_transmittance_eps: float = 0.0
    """Serve-time early ray termination (eval mode only; 0 disables).
    Nerf-field samples whose estimated transmittance — from the last
    proposal level's weights, which the interlevel loss trains to upper-
    bound the nerf weights — has fallen below this epsilon are culled:
    their position becomes a sentinel (so whole hash-kernel tiles behind
    surfaces skip their table scans) and their density is zeroed.  The
    dropped contribution is bounded by eps per ray.  The reference
    evaluates every sample at view time (``samnerf/sam_model.py:358-418``);
    this is the GPU early-termination analogue re-shaped for dense TPU
    batches.  Training is never affected."""
    hash_fn: str = "reference"
    """"reference" or "morton" (locality-preserving hash; coherent eval
    tiles skip untouched table slabs).  Train and serve must agree."""
    sort_points: bool = False
    """Sort hash-encode point streams by a coarse morton key (exact;
    order restored): random TRAINING batches become spatially-coherent
    kernel tiles, so the forward scan skips untouched table slabs and
    the backward scatter visits only touched chunks instead of sweeping
    the whole table per point tile.  Pair with hash_fn="morton"; serve
    instances (``engine.render_pipeline.serve_model``) turn it off —
    their streams are already coherent by construction."""
    num_images: int = 1
    compute_dtype: Any = jnp.float32
    eval_num_rays_per_chunk: int = 1 << 15
    use_remat: bool = True
    """Explicit jax.checkpoint around each field evaluation: activations
    (hash-gather outputs over ~1M samples/step) are recomputed in the
    backward pass instead of stored.  Replaces the reference's AMP memory
    savings (trainer.py:419-423) and keeps XLA's scheduler out of
    pathological auto-remat searches."""

    @property
    def num_proposal_iterations(self) -> int:
        return len(self.num_proposal_samples_per_ray)


class SAMModel(nn.Module):
    """Jittable forward: RayBundle -> outputs dict."""

    config: SAMModelConfig

    def setup(self):
        cfg = self.config
        field_cls = (nn.remat(NerfactoField, static_argnums=(4,))
                     if cfg.use_remat else NerfactoField)
        prop_cls = (nn.remat(HashMLPDensityField) if cfg.use_remat
                    else HashMLPDensityField)
        sam_cls = (nn.remat(SAMField, static_argnums=(2,))
                   if cfg.use_remat else SAMField)
        self.fields = field_cls(
            num_images=cfg.num_images, hidden_dim=cfg.hidden_dim,
            hidden_dim_color=cfg.hidden_dim_color, num_levels=cfg.num_levels,
            max_res=cfg.max_res, log2_hashmap_size=cfg.log2_hashmap_size,
            use_appearance_embedding=cfg.use_appearance_embedding,
            compute_dtype=cfg.compute_dtype, hash_q8=cfg.hash_q8_serve,
            hash_fn=cfg.hash_fn, quant_bits=cfg.serve_quant_bits,
            fuse_mlp=cfg.serve_fuse_mlp, sort_points=cfg.sort_points,
            occ_res=cfg.occ_res, name="fields")
        props = []
        for i in range(cfg.num_proposal_iterations):
            args = cfg.proposal_net_args[min(i, len(cfg.proposal_net_args) - 1)]
            props.append(prop_cls(
                compute_dtype=cfg.compute_dtype, hash_q8=cfg.hash_q8_serve,
                quant_bits=cfg.serve_quant_bits_props or cfg.serve_quant_bits,
                fuse_mlp=cfg.serve_fuse_mlp,
                # proposals stay unsorted: at their small tables (5Lx2f
                # @2^17) the sort machinery costs more than the touched-
                # chunk backward saves (48.9->54.9 ms measured,
                # scripts/bench_sort_bwd.py); sorting only pays at the
                # 2^19 field/SAM pyramids.
                hash_fn=cfg.hash_fn, sort_points=False,
                occ_res=cfg.occ_res,
                name=f"proposal_networks_{i}", **args))
        self.proposal_networks = props
        if cfg.distill_sam:
            self.sam_field = sam_cls(
                grid_layers=cfg.hashgrid_layers, grid_sizes=cfg.hashgrid_sizes,
                grid_resolutions=cfg.hashgrid_resolutions,
                hidden_layers=cfg.hidden_layers,
                use_dino=cfg.use_dino_feature,
                use_clipseg=cfg.use_clipseg_feature,
                compute_dtype=cfg.compute_dtype, hash_q8=cfg.hash_q8_serve,
                hash_fn=cfg.hash_fn,
                quant_bits=cfg.serve_quant_bits_sam or cfg.serve_quant_bits,
                fuse_mlp=cfg.serve_fuse_mlp, sort_points=cfg.sort_points,
                name="sam_field")
            self.conv = ConvHead(kernel_size=cfg.kernel_size,
                                 compute_dtype=cfg.compute_dtype, name="conv")

    def __call__(self, ray_bundle: RayBundle, rng: Optional[jax.Array] = None,
                 train: bool = True, anneal: jax.Array | float = 1.0,
                 proposal_grad: jax.Array | float = 1.0,
                 get_features: Sequence[str] = (),
                 bg_color: Optional[jax.Array] = None,
                 occupancy=None, return_topk: bool = False) -> Dict[str, Any]:
        """Render a flat bundle of rays (reference ``sam_model.py:226-278``).

        Args:
            get_features: subset of ("sam", "dino", "clipseg") to render.
                With "sam" the ray count must be a multiple of patch_size^2
                when patch_size > 1 (rays arrive patch-major from the patch
                pixel sampler, ``pixel_samplers.py:248-296``).
            bg_color: optional [3] rgb in [0,1] overriding the configured
                background (the reference's BACKGROUND_COLOR_OVERRIDE
                context used for viewer crops, ``renderers.py:43-55``).
            occupancy: optional ``ops.occupancy.ServeOccupancy`` culling
                grid (serve only): empty-space samples skip the
                full-capacity table scans and contribute zero density.
            return_topk: also emit per-ray top-``num_sam_samples``
                sharpened weights (``topk_w`` [R, K, 1]) and euclidean
                sample mids (``topk_mid`` [R, K]) so a later feature pass
                can reuse this pass's proposal+nerf work (the fused serve
                path in :mod:`samnerf_tpu.engine.eval_render`).
        """
        cfg = self.config
        if ray_bundle.nears is None or ray_bundle.fars is None:
            # colliders only apply when near/far are unset (the reference
            # SceneCollider.forward guard, ``scene_colliders.py:40-44``) so
            # viewer crop-box rays keep their aabb-intersection bounds
            ray_bundle = ray_bundle.with_near_far(cfg.near_plane,
                                                  cfg.far_plane)

        density_fns = [lambda pos, p=p: p(pos, occupancy)
                       for p in self.proposal_networks]
        ray_samples, weights_list, ray_samples_list = proposal_sampling(
            rng, ray_bundle, density_fns,
            cfg.num_proposal_samples_per_ray, cfg.num_nerf_samples_per_ray,
            stratified=train, single_jitter=cfg.use_single_jitter,
            anneal=anneal, proposal_grad=proposal_grad)

        live_et = None
        if not train and cfg.serve_transmittance_eps > 0.0:
            # Early termination: estimated transmittance at each nerf
            # sample from the last proposal level's weights (w_i = a_i*T_i
            # => T before bin j = 1 - sum_{i<j} w_i).  A proposal bin
            # counts as "passed" when it ends before the sample's mid.
            pw = weights_list[-1][..., 0]                       # [R, P]
            pend = ray_samples_list[-1].ends[..., 0]            # [R, P]
            tmid = (ray_samples.starts + ray_samples.ends)[..., 0] * 0.5
            passed = (pend[:, None, :] <= tmid[:, :, None])     # [R, S, P]
            t_est = 1.0 - jnp.sum(jnp.where(passed, pw[:, None, :], 0.0), -1)
            live_et = (t_est > cfg.serve_transmittance_eps).astype(
                jnp.float32)[..., None]                          # [R, S, 1]

        # positional call: train / get_features are remat static_argnums
        field_out = self.fields(ray_samples.positions(), ray_samples.directions,
                                ray_samples.camera_indices, train, occupancy,
                                live_et)
        weights = ray_samples.get_weights(field_out["density"])
        weights_list = list(weights_list) + [weights]
        ray_samples_list = list(ray_samples_list) + [ray_samples]

        if bg_color is not None:
            rgb = render_ops.render_rgb(field_out["rgb"], weights,
                                        background_color="explicit",
                                        bg_rgb=bg_color, training=train)
        else:
            rgb = render_ops.render_rgb(field_out["rgb"], weights,
                                        background_color=cfg.background_color,
                                        training=train)
        outputs: Dict[str, Any] = {
            "rgb": rgb,
            "accumulation": render_ops.render_accumulation(weights),
            "depth": render_ops.render_depth_median(weights, ray_samples),
        }
        if train:
            outputs["weights_list"] = weights_list
            outputs["ray_samples_list"] = ray_samples_list
        else:
            for i in range(cfg.num_proposal_iterations):
                outputs[f"prop_depth_{i}"] = render_ops.render_depth_median(
                    weights_list[i], ray_samples_list[i])

        if cfg.distill_sam and (len(get_features) > 0 or return_topk):
            # Top-k + sharpen (sam_model.py:244-248); weights detached.
            sam_weights, best_ids = render_ops.topk_sharpened_weights(
                jax.lax.stop_gradient(weights), cfg.num_sam_samples,
                cfg.sharpening_temperature)
            sam_samples = ray_samples.take_topk(best_ids)
            if return_topk:
                outputs["topk_w"] = sam_weights
                outputs["topk_mid"] = (
                    (sam_samples.starts + sam_samples.ends) * 0.5)[..., 0]
            if len(get_features) > 0:
                outputs.update(self.features_from_topk(
                    sam_samples.positions(), sam_weights,
                    tuple(get_features), cull=not train))
        return outputs

    def features_from_topk(self, positions: jax.Array, weights: jax.Array,
                           get_features: Sequence[str],
                           cull: bool = False) -> Dict[str, Any]:
        """Render distilled features at pre-selected top-k samples.

        The second half of the reference's feature render
        (``samnerf/sam_model.py:249-265``): SAM/DINO/ClipSeg field at the
        top-k positions, weighted mean, patch conv for SAM.  Split out so
        the fused serve path (:mod:`samnerf_tpu.engine.eval_render`) can
        feed it top-k samples reused from the rgb pass instead of
        re-running proposals+nerf on a separate feature ray grid.

        Args:
            positions: [R, K, 3] world-space sample positions.
            weights: [R, K, 1] sharpened (already normalized) weights.
            cull: serve-only — samples with exactly zero weight (empty
                space / early-terminated) skip the SAM-field table scans
                via sentinel positions; the weighted mean is unchanged
                (0-weight features contribute nothing either way).
        """
        cfg = self.config
        out: Dict[str, Any] = {}
        live = (weights > 0.0).astype(jnp.float32) if cull else None
        feats = self.sam_field(positions, tuple(get_features), live)
        if "sam" in feats:
            sam_render = render_ops.render_mean(feats["sam"], weights)
            if cfg.patch_size > 1:
                ps = cfg.patch_size
                patches = sam_render.reshape(-1, ps, ps, sam_render.shape[-1])
                out["sam"] = self.conv(patches)  # [N, 256]
            else:
                out["sam"] = sam_render
        if "dino" in feats:
            out["dino"] = render_ops.render_mean(feats["dino"], weights)
        if "clipseg" in feats:
            out["clipseg"] = render_ops.render_mean(feats["clipseg"], weights)
        return out


def get_loss_dict(config: SAMModelConfig, outputs: Dict[str, Any],
                  batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Training losses (``nerfacto.py:324-344`` + ``sam_model.py:316-328``).

    ``batch['image']`` is [R, 3]; when patch_size > 1 the feature targets
    ``batch['sam']`` are per-patch [N, 256] while rgb stays per-ray.
    """
    loss_dict = {
        "rgb_loss": jnp.mean((batch["image"] - outputs["rgb"]) ** 2),
    }
    if "weights_list" in outputs:
        # proposal losses exist only in training mode (the reference's
        # get_loss_dict guards these on self.training, nerfacto.py:324-344)
        loss_dict["interlevel_loss"] = (
            config.interlevel_loss_mult * loss_ops.interlevel_loss(
                outputs["weights_list"], outputs["ray_samples_list"]))
        loss_dict["distortion_loss"] = (
            config.distortion_loss_mult * loss_ops.distortion_loss(
                outputs["weights_list"], outputs["ray_samples_list"]))
    if config.distill_sam and "sam" in outputs:
        loss_dict["sam_loss"] = config.sam_loss_weight * loss_ops.masked_feature_mse(
            outputs["sam"], batch["sam"])
        if config.use_dino_feature and "dino" in outputs:
            loss_dict["dino_loss"] = config.dino_loss_weight * loss_ops.masked_feature_mse(
                outputs["dino"], batch["dino"])
        if config.use_clipseg_feature and "clipseg" in outputs:
            loss_dict["clipseg_loss"] = (config.clipseg_loss_weight *
                                         loss_ops.masked_feature_mse(
                                             outputs["clipseg"], batch["clipseg"]))
    return loss_dict


def proposal_anneal_value(config: SAMModelConfig, step: jax.Array) -> jax.Array:
    """Weight-anneal schedule (``nerfacto.py:250-255``, mipnerf360 eq.18)."""
    n = config.proposal_weights_anneal_max_num_iters
    b = config.proposal_weights_anneal_slope
    train_frac = jnp.clip(step / n, 0.0, 1.0)
    return (b * train_frac) / ((b - 1.0) * train_frac + 1.0)


def proposal_grad_gate(config: SAMModelConfig, step: jax.Array,
                       steps_since_update: jax.Array) -> jax.Array:
    """Update-schedule gate (``nerfacto.py:196-200``,
    ``ray_samplers.py:572``): 1.0 when the proposal nets should receive
    gradients this step, else 0.0."""
    sched = jnp.clip(
        jnp.interp(step.astype(jnp.float32),
                   jnp.array([0.0, float(config.proposal_warmup)]),
                   jnp.array([0.0, float(config.proposal_update_every)])),
        1.0, float(config.proposal_update_every))
    updated = (steps_since_update.astype(jnp.float32) > sched) | (step < 10)
    return updated.astype(jnp.float32)
