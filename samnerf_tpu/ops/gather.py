"""TPU-friendly small-depth gathers.

XLA lowers ``take_along_axis`` to a general gather, which on TPU runs on
the scalar core (~150M lookups/s measured on v5e).  For the small
per-row depths used in ray sampling (tens of bins), a one-hot
contraction stays on the VPU/MXU and is two orders of magnitude faster
(the PDF sampler's four gathers alone were 64% of a rendered frame's
device time before this change).

Semantics match ``jnp.take_along_axis`` for in-range indices; both are
differentiable w.r.t. the gathered array (not the indices).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def take_along_last(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """``take_along_axis(arr, idx, axis=-1)`` via one-hot contraction.

    arr [..., B], idx [..., S] int -> [..., S].  Intended for B up to a
    few hundred (cost is O(S*B) vector ops per row).
    """
    b = arr.shape[-1]
    oh = (idx[..., None] == jnp.arange(b, dtype=idx.dtype)).astype(arr.dtype)
    return jnp.einsum("...sb,...b->...s", oh, arr)


def take_rows(x: jax.Array, idx: jax.Array) -> jax.Array:
    """``take_along_axis(x, idx[..., None], axis=-2)`` via one-hot matmul.

    x [..., S, C], idx [..., K] int -> [..., K, C].  The contraction
    rides the MXU; used for the top-k feature-sample gather
    (``samnerf/sam_model.py:251-255``).
    """
    s = x.shape[-2]
    oh = (idx[..., None] == jnp.arange(s, dtype=idx.dtype)).astype(x.dtype)
    return jnp.einsum("...ks,...sc->...kc", oh, x)
