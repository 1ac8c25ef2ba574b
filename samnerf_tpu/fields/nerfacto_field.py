"""The nerfacto radiance field and the proposal density field.

Reference: ``nerfstudio/fields/nerfacto_field.py`` (TCNNNerfactoField,
:66-351) and ``nerfstudio/fields/density_fields.py`` (HashMLPDensityField,
:40-128), rebuilt as flax modules over the XLA hash encoding + MLPs.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from samnerf_tpu.core.contraction import contract_to_unit
from samnerf_tpu.fields.hash_encoding import ParityHashEncoding
from samnerf_tpu.fields.mlp import MLP, trunc_exp
from samnerf_tpu.ops.encodings import sh_encoding


import os as _os

SAMPLE_BLOCK = int(_os.environ.get("SAMNERF_SAMPLE_BLOCK", "1024"))
"""Rays per spatial block in the block-major flatten.  With the serve
path's 2D-tiled pixel ordering (``eval_render``), 1024 consecutive rays
are a 32x32 pixel block, so one 8192-point kernel tile is that block at 8
consecutive depths — spatially tight, so it touches very few morton
regions (= table slabs the v4 kernel skips).  Env-overridable for A/B
runs (0 = plain sample-major)."""

_LIVE_TO_KERNEL = _os.environ.get("SAMNERF_LIVE_KERNEL", "0") == "1"
"""Forward the serve-time cull mask into the hash kernels (which routes
them onto the v4 prefetch-gather path with whole-tile skips).  Default
off: culled samples get SENTINEL positions instead, which the default v2
scan kernel's per-tile touched-slab skip already exploits without the
v4 path's touched-slab-id prepass (measured slower at low cull
fractions, commit 5dfcec0).  Env knob for A/B on trained scenes."""


def _flatten_sample_major(p, block=None):
    block = SAMPLE_BLOCK if block is None else block
    """[..., R, S, 3] -> ([R*S, 3] point stream, unflatten fn).

    The hash kernel scans table slabs per point tile and skips slabs a
    tile does not touch, so the stream order controls the scan cost.
    Plain sample-major (all rays at sample s, then s+1, ...) makes tiles
    of adjacent rays at the same depth; block-major refines it: rays are
    grouped into blocks of ``block``, and each block emits all its
    samples depth-major before the next block — a kernel tile is then
    (one ray block) x (a few consecutive depths), which is a compact 3D
    region when the rays are 2D-tiled.  For random training rays both
    orders are coherence-neutral.  MLPs downstream are pointwise, so
    only the final reshape needs undoing; all reorders are pure
    reshape/transpose (no gathers).
    """
    if p.ndim == 2:
        return p, lambda h: h
    r, s = p.shape[-3], p.shape[-2]
    lead = p.shape[:-3]
    if block and r % block == 0 and r > block:
        nb = r // block

        def unflatten(h):
            hh = h.reshape(*lead, nb, s, block, h.shape[-1])
            return jnp.swapaxes(hh, -2, -3).reshape(*lead, r, s,
                                                    h.shape[-1])

        c = p.shape[-1]
        flat = jnp.swapaxes(p.reshape(*lead, nb, block, s, c), -2, -3)
        return flat.reshape(-1, c), unflatten

    def unflatten(h):
        return jnp.swapaxes(h.reshape(*lead, s, r, h.shape[-1]), -2, -3)

    return jnp.swapaxes(p, -2, -3).reshape(-1, p.shape[-1]), unflatten


def _contract_and_select(positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Contraction + in-unit-cube selector (``nerfacto_field.py:242-252``)."""
    p = contract_to_unit(positions)
    selector = ((p > 0.0) & (p < 1.0)).all(axis=-1)
    return p * selector[..., None], selector


def _mlp_is_fusable(mlp) -> bool:
    """The fused serve kernel implements exactly relu(x@W1+b1)@W2+b2 in
    f32 — the tcnn FullyFusedMLP shape every field head here uses."""
    return (mlp.num_hidden_layers == 1 and mlp.output_activation is None
            and mlp.compute_dtype == jnp.float32)


def _fused_encode_mlp(enc_mods, mlp, flat: jax.Array, hash_fn: str,
                      quant_bits: int) -> jax.Array:
    """Serve-time fused quantized hash encode -> 1-hidden-layer MLP.

    ``enc_mods``: bound ParityHashEncoding submodules (their pyramids are
    stacked pyramid-major, matching the unfused ``concat([e(flat)...])``
    channel order); ``mlp``: bound MLP submodule (params read, not
    called).  Replaces ``mlp(concat([e(flat) for e in enc_mods]))`` with
    one Pallas dispatch (``ops.hash_pallas.parity_hash_encode_qmlp``) —
    the encode features stay in VMEM instead of round-tripping HBM
    through the [PL, 2, N] -> [N, C] transpose and the XLA matmuls.
    """
    from samnerf_tpu.ops.encodings import hash_grid_scalings
    from samnerf_tpu.ops.hash_pallas import (LANES, parity_hash_encode_qmlp,
                                             quantize_parity_table)
    mv = mlp.variables["params"]
    w1, b1 = mv["Dense_0"]["kernel"], mv["Dense_0"]["bias"]
    w2, b2 = mv["Dense_1"]["kernel"], mv["Dense_1"]["bias"]
    packed, scales, scalings = [], [], []
    num_steps = enc_mods[0].num_steps
    for e in enc_mods:
        assert e.num_steps == num_steps, "stacked pyramids share table size"
        ep = e.variables["params"]
        if f"qtable{quant_bits}" in ep:      # pre-baked (bake_quantized_tables)
            pk, sc = ep[f"qtable{quant_bits}"], ep[f"qscales{quant_bits}"]
        else:
            pk, sc = quantize_parity_table(
                jax.lax.stop_gradient(ep["table"]), qbits=quant_bits)
        packed.append(pk)
        scales.append(sc)
        scalings.append(tuple(
            hash_grid_scalings(e.num_levels, e.min_res, e.max_res).tolist()))
    n = flat.shape[0]
    pad = (-n) % LANES
    if pad:
        flat = jnp.concatenate([flat, jnp.full((pad, 3), 0.5, flat.dtype)])
    out = parity_hash_encode_qmlp(packed, scales, flat, scalings, num_steps,
                                  w1, b1, w2, b2, hash_fn=hash_fn,
                                  qbits=quant_bits)
    return out[:n] if pad else out


class NerfactoField(nn.Module):
    """Density + view-dependent color field (``nerfacto_field.py:66-351``).

    Defaults match the reference's defaults with the samnerf overrides
    applied by ``samnerf/samconfigs.py`` (use_appearance_embedding=False).
    """

    num_images: int = 1
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_levels: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    appearance_embedding_dim: int = 32
    use_appearance_embedding: bool = False
    use_average_appearance_embedding: bool = True
    compute_dtype: Any = jnp.float32
    hash_q8: bool = False
    hash_fn: str = "reference"
    quant_bits: int = 8
    """Quantized-serve table width (8 or 4); see ParityHashEncoding."""
    fuse_mlp: bool = False
    """Serve-only: run the hash encode and mlp_base as ONE Pallas kernel
    (``_fused_encode_mlp``) — requires ``hash_q8``; falls back to the
    unfused path whenever a live mask must reach the kernel."""
    sort_points: bool = False
    """Sort encode point streams by a coarse morton key (training batches
    become coherent kernel tiles; see ``ParityHashEncoding.sort_points``)."""
    occ_res: int = 0
    """Serve-time occupancy-culling grid resolution (0 = off).  The grid
    itself (``ops.occupancy.ServeOccupancy``) arrives as the ``occ`` call
    argument; culled samples are moved to a sentinel position before the
    encode (so coherent tiles touch almost no table slabs) and their
    density is zeroed."""

    def setup(self):
        self.encoding = ParityHashEncoding(
            num_levels=self.num_levels, min_res=16, max_res=self.max_res,
            log2_hashmap_size=self.log2_hashmap_size, features_per_level=2,
            quantize_serve=self.hash_q8, hash_fn=self.hash_fn,
            quant_bits=self.quant_bits, sort_points=self.sort_points)
        self.mlp_base = MLP(hidden_dim=self.hidden_dim,
                            num_hidden_layers=self.num_layers - 1,
                            out_dim=1 + self.geo_feat_dim,
                            compute_dtype=self.compute_dtype)
        self.mlp_head = MLP(hidden_dim=self.hidden_dim_color,
                            num_hidden_layers=self.num_layers_color - 1,
                            out_dim=3, output_activation=nn.sigmoid,
                            compute_dtype=self.compute_dtype)
        if self.use_appearance_embedding:
            self.embedding_appearance = nn.Embed(
                self.num_images, self.appearance_embedding_dim)

    def get_density(self, positions: jax.Array, occ=None,
                    live_in: Optional[jax.Array] = None
                    ) -> Tuple[jax.Array, jax.Array]:
        """[R, S, 3] -> (density [R, S, 1], geo_feat [R, S, geo]).

        live_in: optional [R, S, 1] 0/1 serve-time cull mask (early ray
        termination, ``SAMModelConfig.serve_transmittance_eps``); ANDed
        with the occupancy lookup.  Culled samples get sentinel positions
        (the v2 kernel's per-tile slab skip then avoids their table
        scans) and exactly zero density.
        """
        p, selector = _contract_and_select(positions)
        flat, unflatten = _flatten_sample_major(p)
        live = None
        if live_in is not None:
            live, _ = _flatten_sample_major(live_in)          # [N, 1]
        if occ is not None and self.occ_res:
            # per-TILE conservative AABB test, not per-point: a per-point
            # lookup is one scalar-core gather per sample (~33M/frame at
            # 512^2), which costs more than the culling saves; the tile
            # test is one 8-corner mip probe per kernel tile and matches
            # the dead-tile granularity the encode kernel skips at.
            from samnerf_tpu.ops.occupancy import tile_live_points
            lo = tile_live_points(occ, flat, self.occ_res)    # [N, 1]
            live = lo if live is None else live * lo
        if live is not None:
            flat = jnp.where(live > 0, flat, 0.5)
        kernel_live = live if _LIVE_TO_KERNEL else None
        if (self.fuse_mlp and self.hash_q8 and kernel_live is None
                and not self.is_initializing()
                and _mlp_is_fusable(self.mlp_base)):
            h = unflatten(_fused_encode_mlp(
                [self.encoding], self.mlp_base, flat, self.hash_fn,
                self.quant_bits))
        else:
            h = unflatten(self.mlp_base(self.encoding(
                flat, live=kernel_live)))
        density_raw, geo = h[..., :1], h[..., 1:]
        density = trunc_exp(density_raw) * selector[..., None]
        if live is not None:
            density = density * unflatten(live)
        return density, geo

    def density_at_unit(self, p_unit: jax.Array) -> jax.Array:
        """[N, 3] contracted-unit coords -> [N, 1] density (no selector):
        the occupancy-bake query (grid points are inside the cube)."""
        h = self.mlp_base(self.encoding(p_unit))
        return trunc_exp(h[..., :1])

    def __call__(self, positions: jax.Array, directions: jax.Array,
                 camera_indices: Optional[jax.Array] = None,
                 train: bool = True, occ=None,
                 live_in: Optional[jax.Array] = None) -> dict:
        """Full field eval.

        Args:
            positions: [R, S, 3]; directions: [R, 3] unit (per ray);
            camera_indices: [R, 1] int32 (appearance embedding only);
            live_in: optional [R, S, 1] serve-time cull mask
                (see :meth:`get_density`).
        """
        density, geo = self.get_density(positions, occ, live_in)
        num_samples = positions.shape[-2]
        d_enc = sh_encoding(directions)  # [R, 16]
        d_enc = jnp.broadcast_to(d_enc[..., None, :],
                                 (*positions.shape[:-1], d_enc.shape[-1]))
        h = [d_enc.reshape(-1, d_enc.shape[-1]), geo.reshape(-1, geo.shape[-1])]
        if self.use_appearance_embedding:
            if train and camera_indices is not None:
                emb = self.embedding_appearance(camera_indices[..., 0])  # [R, A]
            elif self.use_average_appearance_embedding:
                emb = jnp.broadcast_to(
                    jnp.mean(self.embedding_appearance.embedding, axis=0),
                    (positions.shape[0], self.appearance_embedding_dim))
            else:
                emb = jnp.zeros((positions.shape[0], self.appearance_embedding_dim))
            emb = jnp.broadcast_to(emb[..., None, :],
                                   (*positions.shape[:-1], emb.shape[-1]))
            h.append(emb.reshape(-1, emb.shape[-1]))
        rgb = self.mlp_head(jnp.concatenate(h, axis=-1))
        rgb = rgb.reshape(*positions.shape[:-1], 3)
        return {"density": density, "rgb": rgb}


class HashMLPDensityField(nn.Module):
    """Proposal density field (``density_fields.py:40-128``)."""

    num_layers: int = 2
    hidden_dim: int = 16
    num_levels: int = 5
    max_res: int = 128
    base_res: int = 16
    log2_hashmap_size: int = 13
    features_per_level: int = 2
    use_linear: bool = False
    compute_dtype: Any = jnp.float32
    hash_q8: bool = False
    hash_fn: str = "reference"
    quant_bits: int = 8
    fuse_mlp: bool = False
    sort_points: bool = False
    occ_res: int = 0

    @nn.compact
    def __call__(self, positions: jax.Array, occ=None) -> jax.Array:
        """[R, S, 3] -> density [R, S, 1]."""
        p, selector = _contract_and_select(positions)
        flat, unflatten = _flatten_sample_major(p)
        live = None
        if occ is not None and self.occ_res:
            from samnerf_tpu.ops.occupancy import tile_live_points
            live = tile_live_points(occ, flat, self.occ_res)
            flat = jnp.where(live > 0, flat, 0.5)
        encoding = ParityHashEncoding(
            num_levels=self.num_levels, min_res=self.base_res,
            max_res=self.max_res, log2_hashmap_size=self.log2_hashmap_size,
            features_per_level=self.features_per_level,
            quantize_serve=self.hash_q8, hash_fn=self.hash_fn,
            quant_bits=self.quant_bits, sort_points=self.sort_points)
        mlp = None if self.use_linear else MLP(
            hidden_dim=self.hidden_dim,
            num_hidden_layers=self.num_layers - 1, out_dim=1,
            compute_dtype=self.compute_dtype)
        kernel_live = live if _LIVE_TO_KERNEL else None
        if (self.fuse_mlp and self.hash_q8 and kernel_live is None
                and mlp is not None and not self.is_initializing()
                and _mlp_is_fusable(mlp)):
            raw = _fused_encode_mlp([encoding], mlp, flat, self.hash_fn,
                                    self.quant_bits)
        else:
            enc = encoding(flat, live=kernel_live)
            raw = nn.Dense(1)(enc) if self.use_linear else mlp(enc)
        raw = unflatten(raw)
        density = trunc_exp(raw) * selector[..., None]
        if live is not None:
            density = density * unflatten(live)
        return density
