"""Flax wrappers around the hash-grid encoding ops."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from samnerf_tpu.ops.encodings import hash_encode, hash_grid_scalings, init_hash_table
from samnerf_tpu.ops.hash_pallas import (LANES, PARITIES, init_parity_table,
                                         parity_hash_encode,
                                         parity_hash_encode_q8,
                                         parity_hash_encode_serve,
                                         quantize_parity_table)


class HashEncoding(nn.Module):
    """Multi-resolution hash grid (reference config sites:
    ``nerfstudio/fields/nerfacto_field.py:157-167`` (16x2 @ 2^19, 16->2048),
    ``nerfstudio/fields/density_fields.py:73-99`` (5x2 @ 2^17),
    ``samnerf/sam_field.py:96-110`` (12x8 @ 2^19, two pyramids)).
    """

    num_levels: int = 16
    min_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    table_dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @nn.compact
    def __call__(self, positions: jax.Array) -> jax.Array:
        """positions [N, 3] in [0,1] -> [N, F*L] (feature-major channels)."""
        # static tuple: hash_encode's custom-vjp nondiff arg must be hashable
        scalings = tuple(
            hash_grid_scalings(self.num_levels, self.min_res, self.max_res)
            .tolist())
        table = self.param(
            "table",
            lambda key: init_hash_table(
                key, self.num_levels, 1 << self.log2_hashmap_size,
                self.features_per_level, dtype=self.table_dtype))
        return hash_encode(table, positions, scalings, self.log2_hashmap_size)


class ParityHashEncoding(nn.Module):
    """TPU-native multiresolution hash grid (``ops/hash_pallas.py``).

    Same role as :class:`HashEncoding` (tinycudann HashGrid in the
    reference) with the parity-partitioned table layout the Pallas kernel
    scans.  ``features_per_level`` must be even (features are packed in
    bf16 pairs); ``log2_hashmap_size`` >= 10 (one scan step = 1024
    entries).  Output [N, F*L], feature-major channels like HashEncoding.
    """

    num_levels: int = 16
    min_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    quantize_serve: bool = False
    """Serve-time int8 table quantization (parity_hash_encode_q8): halves
    the VPU table-scan cost.  NO gradients flow to the tables in this
    mode — set it only on serving/viewer model instances (the same
    trained f32 checkpoint loads unchanged; quantization is on the fly)."""
    quant_bits: int = 8
    """Quantized-serve table width: 8 (int8 pairs) or 4 (int4 nibbles —
    half the scan row-groups again; A/B frame parity before enabling).
    Only read when ``quantize_serve``; live-masked calls always use 8."""
    hash_fn: str = "reference"
    """"reference" = the primes-XOR spatial hash; "morton" = locality-
    preserving top index bits (coherent tiles skip untouched table slabs
    — different collision structure; train AND serve must agree)."""
    sort_points: bool = False
    """Sort the point stream by a coarse morton key around the kernels
    (exact; order restored): random training batches become coherent
    tiles so the forward skips untouched slabs and the backward scatters
    only touched chunks.  Pair with hash_fn="morton"; TPU-only (no-op on
    other backends).  Ignored on the quantized/live serve paths, whose
    eval streams are already coherent by construction."""

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def num_steps(self) -> int:
        return max(1, (1 << self.log2_hashmap_size) // (PARITIES * LANES))

    @nn.compact
    def __call__(self, positions: jax.Array,
                 live: jax.Array | None = None) -> jax.Array:
        """positions [N, 3] in [0,1] -> [N, F*L] fp32.

        ``live`` [N] or [N, 1] 0/1 (serve-time only, no gradients): hash
        kernel point-tiles that are entirely dead are skipped — their
        outputs are zeros; outputs at dead points inside live tiles are
        normal.  Callers must gate dead points downstream.
        """
        assert self.features_per_level % 2 == 0, "features packed in pairs"
        num_packed = self.features_per_level // 2
        scalings = tuple(
            hash_grid_scalings(self.num_levels, self.min_res, self.max_res)
            .tolist())
        table = self.param(
            "table",
            lambda key: init_parity_table(key, self.num_levels,
                                          self.num_steps, num_packed))
        n = positions.shape[0]
        pad = (-n) % LANES
        if pad:
            positions = jnp.concatenate(
                [positions, jnp.full((pad, 3), 0.5, positions.dtype)])
            if live is not None:
                live = jnp.concatenate(
                    [live.reshape(n), jnp.zeros((pad,), live.dtype)])
        if self.quantize_serve:
            qb = self.quant_bits if live is None else 8
            if (not self.is_initializing()
                    and self.has_variable("params", f"qtable{qb}")):
                # pre-baked packed tables (ops.hash_pallas.
                # bake_quantized_tables): skips the per-frame quantize +
                # pack of the f32 masters and carries the MSE-optimal
                # clip scales the bake searched for
                packed = self.get_variable("params", f"qtable{qb}")
                scales = self.get_variable("params", f"qscales{qb}")
            else:
                packed, scales = quantize_parity_table(
                    jax.lax.stop_gradient(table), qbits=qb)
            out = parity_hash_encode_q8(packed, scales, positions, scalings,
                                        self.num_steps,
                                        hash_fn=self.hash_fn, live=live,
                                        qbits=qb)
        elif live is not None:
            out = parity_hash_encode_serve(table, positions, scalings,
                                           self.num_steps, 0, self.hash_fn,
                                           live=live)
        else:
            out = parity_hash_encode(table, positions, scalings,
                                     self.num_steps, 0, self.hash_fn,
                                     self.sort_points)
        return out[:n] if pad else out
