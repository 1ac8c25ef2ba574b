"""NeRF losses: interlevel (proposal), distortion, rgb/feature MSE.

Reference: ``nerfstudio/model_components/losses.py`` (outer :46-75,
lossfun_outer :78-95, interlevel_loss :106-120, lossfun_distortion
:124-135, distortion_loss :138-143) and the feature MSE losses in
``samnerf/sam_model.py:316-328``.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from samnerf_tpu.core.rays import RaySamples
from samnerf_tpu.ops.gather import take_along_last
from samnerf_tpu.ops.samplers import searchsorted_right

EPS = 1e-7


def ray_samples_to_sdist(ray_samples: RaySamples) -> jax.Array:
    """Bin edges in normalized s-space [R, S+1] (``losses.py:98-103``)."""
    return jnp.concatenate(
        [ray_samples.spacing_starts[..., 0],
         ray_samples.spacing_ends[..., -1:, 0]], axis=-1)


def outer(t0_starts, t0_ends, t1_starts, t1_ends, y1):
    """Sum of y1 mass inside each (t0_start, t0_end) interval
    (``losses.py:46-75``)."""
    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1)
    idx_lo = searchsorted_right(t1_starts, t0_starts) - 1
    idx_lo = jnp.clip(idx_lo, 0, y1.shape[-1] - 1)
    idx_hi = searchsorted_right(t1_ends, t0_ends)
    idx_hi = jnp.clip(idx_hi, 0, y1.shape[-1] - 1)
    cy1_lo = take_along_last(cy1[..., :-1], idx_lo)
    cy1_hi = take_along_last(cy1[..., 1:], idx_hi)
    return cy1_hi - cy1_lo


def lossfun_outer(t, w, t_env, w_env):
    """Histogram-bound penalty (``losses.py:78-95``)."""
    w_outer = outer(t[..., :-1], t[..., 1:], t_env[..., :-1], t_env[..., 1:], w_env)
    return jnp.clip(w - w_outer, min=0.0) ** 2 / (w + EPS)


def interlevel_loss(weights_list: Sequence[jax.Array],
                    ray_samples_list: Sequence[RaySamples]) -> jax.Array:
    """MipNeRF-360 proposal loss (``losses.py:106-120``): the last level is
    the (detached) target; each proposal level is penalized for
    under-covering it."""
    c = jax.lax.stop_gradient(ray_samples_to_sdist(ray_samples_list[-1]))
    w = jax.lax.stop_gradient(weights_list[-1][..., 0])
    loss = 0.0
    for ray_samples, weights in zip(ray_samples_list[:-1], weights_list[:-1]):
        sdist = ray_samples_to_sdist(ray_samples)
        loss += jnp.mean(lossfun_outer(c, w, sdist, weights[..., 0]))
    return loss


def lossfun_distortion(t: jax.Array, w: jax.Array) -> jax.Array:
    """MipNeRF-360 distortion (``losses.py:124-135``), O(S^2) form; S<=48
    so the pairwise term is tiny on the VPU."""
    ut = (t[..., 1:] + t[..., :-1]) / 2.0
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
    loss_inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
    loss_intra = jnp.sum(w ** 2 * (t[..., 1:] - t[..., :-1]), axis=-1) / 3.0
    return loss_inter + loss_intra


def distortion_loss(weights_list: Sequence[jax.Array],
                    ray_samples_list: Sequence[RaySamples]) -> jax.Array:
    """Applied to the final nerf level only (``losses.py:138-143``)."""
    c = ray_samples_to_sdist(ray_samples_list[-1])
    w = weights_list[-1][..., 0]
    return jnp.mean(lossfun_distortion(c, w))


def masked_feature_mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Feature-distillation MSE with NaN-target masking.

    Reference: ``samnerf/sam_model.py:319-320`` — per-pixel channel-mean MSE
    then ``nanmean`` over pixels (NaNs mark pixels without features).
    """
    valid = jnp.isfinite(target).all(axis=-1)
    target = jnp.nan_to_num(target)
    per_pix = jnp.mean((pred - target) ** 2, axis=-1)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, per_pix, 0.0)) / denom
