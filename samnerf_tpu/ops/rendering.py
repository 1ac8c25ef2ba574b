"""Volumetric renderers: RGB / accumulation / depth / feature-mean.

Reference: ``nerfstudio/model_components/renderers.py`` (RGBRenderer :58-140,
AccumulationRenderer :197-223, DepthRenderer :226-287) and samnerf's
MeanRenderer (``samnerf/sam_model.py:126-137``).

Only the dense ``[R, S]`` path exists — the reference's packed/nerfacc path
is never used by the samnerf configs (SURVEY.md section 2f item 4), and
dense static shapes are what XLA wants anyway.
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from samnerf_tpu.core.rays import RaySamples
from samnerf_tpu.ops.gather import take_along_last
from samnerf_tpu.ops.samplers import searchsorted_right


def render_rgb(rgb: jax.Array, weights: jax.Array,
               background_color: str = "last_sample",
               bg_rgb: Optional[jax.Array] = None,
               training: bool = True) -> jax.Array:
    """Composite per-sample rgb (``renderers.py:69-140``).

    Args:
        rgb: [R, S, 3]; weights: [R, S, 1].
        background_color: 'last_sample' | 'black' | 'white' | 'explicit'.
    """
    if not training:
        rgb = jnp.nan_to_num(rgb)
    comp_rgb = jnp.sum(weights * rgb, axis=-2)  # [R, 3]
    acc = jnp.sum(weights, axis=-2)  # [R, 1]
    if background_color == "last_sample":
        bg = rgb[..., -1, :]
    elif background_color == "black":
        bg = jnp.zeros_like(comp_rgb)
    elif background_color == "white":
        bg = jnp.ones_like(comp_rgb)
    elif background_color == "explicit":
        assert bg_rgb is not None
        bg = bg_rgb
    else:
        raise ValueError(background_color)
    comp_rgb = comp_rgb + bg * (1.0 - acc)
    if not training:
        comp_rgb = jnp.clip(comp_rgb, 0.0, 1.0)
    return comp_rgb


def render_accumulation(weights: jax.Array) -> jax.Array:
    """[R, S, 1] -> [R, 1]  (``renderers.py:197-223``)."""
    return jnp.sum(weights, axis=-2)


def render_depth_median(weights: jax.Array, ray_samples: RaySamples) -> jax.Array:
    """Median depth: distance where cumulative weight crosses 0.5
    (``renderers.py:260-270``)."""
    steps = (ray_samples.starts + ray_samples.ends) / 2.0  # [R, S, 1]
    cum = jnp.cumsum(weights[..., 0], axis=-1)  # [R, S]
    split = jnp.full((*weights.shape[:-2], 1), 0.5, dtype=cum.dtype)
    # side='left': count of elements strictly less than 0.5
    idx = jnp.sum((cum[..., None, :] < split[..., :, None]).astype(jnp.int32), axis=-1)
    idx = jnp.clip(idx, 0, steps.shape[-2] - 1)  # [R, 1]
    return take_along_last(steps[..., 0], idx)  # [R, 1]


def render_depth_expected(weights: jax.Array, ray_samples: RaySamples,
                          eps: float = 1e-10) -> jax.Array:
    """Expected depth (``renderers.py:271-285``)."""
    steps = (ray_samples.starts + ray_samples.ends) / 2.0
    depth = jnp.sum(weights * steps, axis=-2) / (jnp.sum(weights, axis=-2) + eps)
    return jnp.clip(depth, jnp.min(steps), jnp.max(steps))


def render_mean(embeds: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted sum of per-sample embeddings (``samnerf/sam_model.py:126-137``).

    Args:
        embeds: [R, K, C]; weights: [R, K, 1].
    """
    return jnp.sum(weights * embeds, axis=-2)


def topk_sharpened_weights(weights: jax.Array, k: int,
                           temperature: float) -> tuple[jax.Array, jax.Array]:
    """Top-k weight selection + power sharpening for feature rendering.

    Reference: ``samnerf/sam_model.py:244-248`` — topk over the sample axis,
    ``w**T / sum`` renormalization, weights detached by the caller.

    Args:
        weights: [R, S, 1]; k: num_sam_samples; temperature: sharpening exp.
    Returns:
        (sharpened [R, k, 1], ids [R, k] int32 sample indices).
    """
    w, ids = jax.lax.top_k(weights[..., 0], k)  # [R, k]
    # Re-sort the k winners by sample (depth) index: downstream is a
    # weighted mean (order-invariant), but depth order keeps the gathered
    # positions spatially coherent so the hash kernel's sample-major
    # tiles skip table slabs (weight order interleaves depths).
    order = jnp.argsort(ids, axis=-1)
    ids = jnp.take_along_axis(ids, order, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    w = w.astype(jnp.float32) ** temperature
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-37)
    return w[..., None], ids


def render_semantics(semantics: jax.Array, weights: jax.Array) -> jax.Array:
    """SemanticRenderer (``renderers.py:290-302``): weighted sum of
    per-sample class logits. semantics [R, S, C] -> [R, C]."""
    return jnp.sum(weights * semantics, axis=-2)


def render_uncertainty(betas: jax.Array, weights: jax.Array) -> jax.Array:
    """UncertaintyRenderer (``renderers.py:305-317``). betas [R, S, 1]."""
    return jnp.sum(weights * betas, axis=-2)


def render_normals(normals: jax.Array, weights: jax.Array,
                   normalize: bool = True) -> jax.Array:
    """NormalsRenderer (``renderers.py:320-344``). normals [R, S, 3]."""
    n = jnp.sum(weights * normals, axis=-2)
    if normalize:
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    return n
