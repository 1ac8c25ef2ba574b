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


# --- Normal losses (``losses.py:188-210``) ------------------------------------

def orientation_loss(weights: jax.Array, normals: jax.Array,
                     view_dirs: jax.Array) -> jax.Array:
    """Penalize normals facing away from the camera (Ref-NeRF).

    weights [R, S, 1]; normals [R, S, 3]; view_dirs [R, 3]."""
    n_dot_v = jnp.sum(normals * view_dirs[..., None, :], axis=-1)
    return jnp.sum(weights[..., 0] * jnp.minimum(0.0, n_dot_v) ** 2, axis=-1)


def pred_normal_loss(weights: jax.Array, normals: jax.Array,
                     pred_normals: jax.Array) -> jax.Array:
    """Consistency between density-gradient and predicted normals."""
    return jnp.sum(
        weights[..., 0] * (1.0 - jnp.sum(normals * pred_normals, axis=-1)),
        axis=-1)


# --- Depth losses (``losses.py:212-313``) --------------------------------------

def ds_nerf_depth_loss(weights: jax.Array, termination_depth: jax.Array,
                       steps: jax.Array, lengths: jax.Array,
                       sigma: float) -> jax.Array:
    """DS-NeRF likelihood loss (``losses.py:212-244``).

    weights [R, S, 1], termination_depth [R, 1], steps [R, S, 1] sample
    midpoints, lengths [R, S, 1] interval lengths."""
    depth_mask = (termination_depth > 0).astype(weights.dtype)
    loss = -jnp.log(weights + 1e-5) * jnp.exp(
        -((steps - termination_depth[:, None]) ** 2) / (2 * sigma)) * lengths
    loss = jnp.sum(loss, axis=-2) * depth_mask
    return jnp.mean(loss)


def urban_radiance_field_depth_loss(weights: jax.Array,
                                    termination_depth: jax.Array,
                                    predicted_depth: jax.Array,
                                    steps: jax.Array,
                                    sigma: float) -> jax.Array:
    """URF depth loss (``losses.py:247-313``): expected-depth L2 + line-of-
    sight terms."""
    depth_mask = (termination_depth > 0).astype(weights.dtype)
    expected_depth_loss = (termination_depth - predicted_depth) ** 2
    td = termination_depth[:, None]
    line_of_sight_loss_near_mask = (
        (steps <= td + sigma) & (steps >= td - sigma)).astype(weights.dtype)
    w_target = jnp.exp(-((steps - td) ** 2) / (2 * sigma))
    w_target = w_target / jnp.maximum(
        jnp.sum(w_target, axis=-2, keepdims=True), 1e-6)
    line_of_sight_loss_near = jnp.sum(
        line_of_sight_loss_near_mask * (weights - w_target) ** 2, axis=-2)
    line_of_sight_loss_empty = jnp.sum(
        (steps < td - sigma).astype(weights.dtype) * weights ** 2, axis=-2)
    loss = (expected_depth_loss + line_of_sight_loss_near
            + line_of_sight_loss_empty) * depth_mask
    return jnp.mean(loss)


# --- MiDaS monocular-depth losses (``losses.py:333-527``) ----------------------

def midas_scale_shift(prediction: jax.Array, target: jax.Array,
                      mask: jax.Array):
    """Closed-form per-image scale/shift aligning prediction to target
    (``losses.py:333-367`` compute_scale_and_shift)."""
    a00 = jnp.sum(mask * prediction * prediction, axis=(-2, -1))
    a01 = jnp.sum(mask * prediction, axis=(-2, -1))
    a11 = jnp.sum(mask, axis=(-2, -1))
    b0 = jnp.sum(mask * prediction * target, axis=(-2, -1))
    b1 = jnp.sum(mask * target, axis=(-2, -1))
    det = a00 * a11 - a01 * a01
    valid = det > 0
    scale = jnp.where(valid, (a11 * b0 - a01 * b1) / jnp.where(valid, det, 1.0), 0.0)
    shift = jnp.where(valid, (-a01 * b0 + a00 * b1) / jnp.where(valid, det, 1.0), 0.0)
    return scale, shift


def midas_depth_loss(prediction: jax.Array, target: jax.Array,
                     mask: jax.Array, scales: int = 4) -> jax.Array:
    """Scale-shift-invariant MSE + multi-scale gradient matching
    (``losses.py:370-527`` ScaleAndShiftInvariantLoss, alpha=0.5).

    prediction/target/mask: [B, H, W]."""
    scale, shift = midas_scale_shift(prediction, target, mask)
    pred = scale[:, None, None] * prediction + shift[:, None, None]

    def mse_term(p, t, m):
        res = p - t
        num = jnp.maximum(jnp.sum(m, axis=(-2, -1)), 1.0)
        return jnp.sum(m * res * res, axis=(-2, -1)) / (2.0 * num)

    def grad_term(p, t, m):
        diff = (p - t) * m
        gx = jnp.abs(diff[:, :, 1:] - diff[:, :, :-1]) * m[:, :, 1:] * m[:, :, :-1]
        gy = jnp.abs(diff[:, 1:, :] - diff[:, :-1, :]) * m[:, 1:, :] * m[:, :-1, :]
        num = jnp.maximum(jnp.sum(m, axis=(-2, -1)), 1.0)
        return (jnp.sum(gx, axis=(-2, -1)) + jnp.sum(gy, axis=(-2, -1))) / num

    loss = mse_term(pred, target, mask)
    for s in range(scales):
        step = 2 ** s
        loss = loss + 0.5 * grad_term(pred[:, ::step, ::step],
                                      target[:, ::step, ::step],
                                      mask[:, ::step, ::step])
    return jnp.mean(loss)
