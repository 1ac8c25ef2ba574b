"""Image quality metrics: PSNR / SSIM (+ gated LPIPS).

Reference: the torchmetrics calls in ``nerfstudio/models/nerfacto.py:231-234,
365-371`` (PeakSignalNoiseRatio(data_range=1), structural_similarity_
index_measure, LearnedPerceptualImagePatchSimilarity).  PSNR/SSIM are
implemented in jax; LPIPS requires pretrained VGG weights supplied at
runtime (zero-egress environments have none) and raises otherwise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(pred: jax.Array, target: jax.Array, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jax.Array:
    """Standard gaussian-window SSIM over [H, W, C] images in [0, 1]
    (matches torchmetrics' structural_similarity_index_measure defaults)."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kern = _gaussian_kernel(kernel_size, sigma)[..., None, None]  # [k,k,1,1]

    def filt(x):
        # [H, W, C] -> depthwise valid conv
        x = x.transpose(2, 0, 1)[:, None]  # [C,1,H,W]
        out = jax.lax.conv_general_dilated(
            x, kern.transpose(2, 3, 0, 1), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return out[:, 0].transpose(1, 2, 0)

    mu_p = filt(pred)
    mu_t = filt(target)
    mu_pp = filt(pred * pred) - mu_p ** 2
    mu_tt = filt(target * target) - mu_t ** 2
    mu_pt = filt(pred * target) - mu_p * mu_t
    num = (2 * mu_p * mu_t + c1) * (2 * mu_pt + c2)
    den = (mu_p ** 2 + mu_t ** 2 + c1) * (mu_pp + mu_tt + c2)
    return jnp.mean(num / den)


def lpips(pred, target, weights_path=None):
    """LPIPS needs pretrained backbone weights; supply ``weights_path`` to a
    torch LPIPS state dict, else this raises (documented gap — the
    environment has no model hub access)."""
    raise NotImplementedError(
        "LPIPS requires pretrained VGG/AlexNet weights; none are available "
        "in this environment. Provide them and wire lpips() accordingly.")
