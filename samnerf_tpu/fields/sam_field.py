"""SAM / DINO / ClipSeg feature distillation field.

Reference: ``samnerf/sam_field.py:25-140`` — two hash-grid pyramids
(12 levels x 8 features @ 2^19; resolutions 16->128 and 128->512) feeding
small MLPs that emit 256-d SAM, 384-d DINO and 192-d ClipSeg embeddings at
contracted 3D points.  The ClipSeg head gets its own pair of pyramids
(``sam_field.py:74-94``).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from samnerf_tpu.core.contraction import contract_to_unit
from samnerf_tpu.fields.hash_encoding import ParityHashEncoding
from samnerf_tpu.fields.mlp import MLP


class SAMField(nn.Module):
    grid_layers: Tuple[int, ...] = (12, 12)
    grid_sizes: Tuple[int, ...] = (19, 19)
    grid_resolutions: Tuple[Tuple[int, int], ...] = ((16, 128), (128, 512))
    features_per_level: int = 8
    hidden_layers: int = 1
    hidden_dim: int = 256
    sam_dim: int = 256
    dino_dim: int = 384
    clipseg_dim: int = 192
    use_dino: bool = False
    use_clipseg: bool = True
    compute_dtype: Any = jnp.float32
    hash_q8: bool = False
    hash_fn: str = "reference"
    quant_bits: int = 8
    fuse_mlp: bool = False
    """Serve-only: evaluate a head's two stacked pyramids + its MLP as
    ONE Pallas kernel (``nerfacto_field._fused_encode_mlp``); requires
    ``hash_q8`` and equal grid_sizes."""
    sort_points: bool = False

    def setup(self):
        def make_pyramids(name):
            return [ParityHashEncoding(num_levels=self.grid_layers[i],
                                 min_res=self.grid_resolutions[i][0],
                                 max_res=self.grid_resolutions[i][1],
                                 log2_hashmap_size=self.grid_sizes[i],
                                 features_per_level=self.features_per_level,
                                 quantize_serve=self.hash_q8,
                                 hash_fn=self.hash_fn,
                                 quant_bits=self.quant_bits,
                                 sort_points=self.sort_points,
                                 name=f"{name}_{i}")
                    for i in range(len(self.grid_layers))]

        self.sam_encs = make_pyramids("sam_enc")
        self.sam_net = MLP(hidden_dim=self.hidden_dim,
                           num_hidden_layers=self.hidden_layers,
                           out_dim=self.sam_dim, compute_dtype=self.compute_dtype)
        if self.use_dino:
            self.dino_net = MLP(hidden_dim=self.hidden_dim, num_hidden_layers=1,
                                out_dim=self.dino_dim,
                                compute_dtype=self.compute_dtype)
        if self.use_clipseg:
            self.clipseg_encs = make_pyramids("clipseg_enc")
            self.clipseg_net = MLP(hidden_dim=self.hidden_dim,
                                   num_hidden_layers=1,
                                   out_dim=self.clipseg_dim,
                                   compute_dtype=self.compute_dtype)

    def __call__(self, positions: jax.Array,
                 get_features: Sequence[str] = ("sam", "clipseg"),
                 live: jax.Array | None = None) -> dict:
        """positions [R, K, 3] (world) -> dict of [R, K, C] features.

        Positions are contracted + detached here, exactly as the reference
        detaches them (``sam_field.py:116-118``).

        live: optional [R, K, 1] 0/1 serve-time cull mask (samples whose
        rendering weight is exactly zero): culled samples get sentinel
        positions so the hash kernels' per-tile slab skip avoids their
        table scans.  Outputs at culled samples are unspecified — callers
        multiply by the zero weights, so the weighted feature mean is
        EXACT.
        """
        from samnerf_tpu.fields.nerfacto_field import (_LIVE_TO_KERNEL,
                                                       _flatten_sample_major,
                                                       _fused_encode_mlp,
                                                       _mlp_is_fusable)
        p = contract_to_unit(jax.lax.stop_gradient(positions))
        flat, unflatten = _flatten_sample_major(p)
        live_flat = None
        if live is not None:
            live_flat, _ = _flatten_sample_major(live)
            flat = jnp.where(live_flat > 0, flat, 0.5)
            if not _LIVE_TO_KERNEL:
                live_flat = None

        def fusable(net):
            return (self.fuse_mlp and self.hash_q8 and live_flat is None
                    and not self.is_initializing()
                    and len(set(self.grid_sizes)) == 1
                    and _mlp_is_fusable(net))

        out = {}
        if "sam" in get_features or ("dino" in get_features and self.use_dino):
            wants_dino = "dino" in get_features and self.use_dino
            if fusable(self.sam_net) and not wants_dino:
                out["sam"] = unflatten(_fused_encode_mlp(
                    self.sam_encs, self.sam_net, flat, self.hash_fn,
                    self.quant_bits))
            else:
                x = jnp.concatenate([e(flat, live=live_flat)
                                     for e in self.sam_encs], axis=-1)
                if "sam" in get_features:
                    out["sam"] = unflatten(self.sam_net(x))
                if wants_dino:
                    out["dino"] = unflatten(self.dino_net(x))
        if "clipseg" in get_features and self.use_clipseg:
            if fusable(self.clipseg_net):
                out["clipseg"] = unflatten(_fused_encode_mlp(
                    self.clipseg_encs, self.clipseg_net, flat, self.hash_fn,
                    self.quant_bits))
            else:
                xc = jnp.concatenate([e(flat, live=live_flat)
                                      for e in self.clipseg_encs], axis=-1)
                out["clipseg"] = unflatten(self.clipseg_net(xc))
        return out


class ConvHead(nn.Module):
    """Patch conv head applied to rendered SAM feature patches.

    Reference: ``samnerf/sam_model.py:202-208`` — Conv(256,256,k) + ReLU +
    Conv(256,256,k), then spatial mean (``sam_model.py:260-265``).
    Operates NHWC: [N, ps, ps, 256] -> [N, 256].
    """

    kernel_size: int = 3
    dim: int = 256
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = (self.kernel_size, self.kernel_size)
        x = x.astype(self.compute_dtype)
        x = nn.Conv(self.dim, k, padding="SAME", dtype=self.compute_dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.dim, k, padding="SAME", dtype=self.compute_dtype)(x)
        return jnp.mean(x.astype(jnp.float32), axis=(-3, -2))
