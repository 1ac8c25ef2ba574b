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
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
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
    # E[x^2]-E[x]^2 can go slightly negative in floating point; clamp the
    # variances at 0 and bound the covariance by Cauchy-Schwarz so the
    # per-pixel score stays in [-1, 1] no matter the input scale.
    var_p = jnp.maximum(filt(pred * pred) - mu_p ** 2, 0.0)
    var_t = jnp.maximum(filt(target * target) - mu_t ** 2, 0.0)
    cov = filt(pred * target) - mu_p * mu_t
    bound = jnp.sqrt(var_p * var_t)
    cov = jnp.clip(cov, -bound, bound)
    num = (2 * mu_p * mu_t + c1) * (2 * cov + c2)
    den = (mu_p ** 2 + mu_t ** 2 + c1) * (var_p + var_t + c2)
    return jnp.mean(num / den)


# --- LPIPS (VGG16 variant) ----------------------------------------------------
#
# Full jax implementation of the metric the reference computes through
# torchmetrics' LearnedPerceptualImagePatchSimilarity
# (``nerfacto.py:231-234``): VGG16 features tapped at relu{1_2,2_2,3_3,
# 4_3,5_3}, channel-unit-normalized, squared diffs passed through learned
# non-negative 1x1 "lin" heads, spatially averaged and summed.  Pretrained
# weights cannot ship in this zero-egress environment, so the weights are
# supplied at runtime: torchvision's ``vgg16-397923af.pth`` plus the lpips
# package's ``vgg.pth`` lin heads (see ``convert_lpips_weights``).

_VGG_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512)
_TAPS = (1, 3, 6, 9, 12)            # conv indices of relu1_2..relu5_3
_SHIFT = (-0.030, -0.088, -0.188)   # lpips normalization constants
_SCALE = (0.458, 0.448, 0.450)


def convert_lpips_weights(vgg_state_dict, lin_state_dict) -> dict:
    """torch state dicts -> jax LPIPS params.

    vgg_state_dict: torchvision vgg16 ``features.*`` conv weights.
    lin_state_dict: lpips-package heads (``lin{i}.model.1.weight``).
    Tensors may be torch or numpy."""
    def np_(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                          else t)

    convs = []
    idx = 0
    for c in _VGG_CFG:
        if c == "M":
            idx += 1
            continue
        w = np_(vgg_state_dict[f"features.{idx}.weight"])  # [O, I, k, k]
        b = np_(vgg_state_dict[f"features.{idx}.bias"])
        convs.append((w.transpose(2, 3, 1, 0), b))          # HWIO
        idx += 2  # conv + relu
    lins = []
    for i in range(len(_TAPS)):
        k = (f"lin{i}.model.1.weight" if f"lin{i}.model.1.weight"
             in lin_state_dict else f"lins.{i}.model.1.weight")
        lins.append(np_(lin_state_dict[k])[:, :, 0, 0].T)   # [C, 1]
    return {"convs": convs, "lins": lins}


def lpips(pred: jax.Array, target: jax.Array, params: dict) -> jax.Array:
    """pred/target [H, W, 3] in [0, 1]; params from convert_lpips_weights."""
    def features(img):
        x = (img * 2.0 - 1.0 - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
        x = x[None]                      # NHWC
        feats = []
        ci = 0
        for c in _VGG_CFG:
            if c == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
                continue
            w, b = params["convs"][ci]
            x = jax.lax.conv_general_dilated(
                x, jnp.asarray(w), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + jnp.asarray(b)
            x = jax.nn.relu(x)
            if ci in _TAPS:
                feats.append(x)
            ci += 1
        return feats

    fp = features(pred)
    ft = features(target)
    total = 0.0
    for i, (a, b) in enumerate(zip(fp, ft)):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        d = (a - b) ** 2                         # [1, h, w, C]
        lin = jnp.asarray(params["lins"][i])     # [C, 1]
        total = total + jnp.mean(d @ lin)
    return total


def load_lpips_params(vgg_path=None, lin_path=None):
    """Load and convert LPIPS weights if the files exist, else None.

    Default locations: $LPIPS_VGG_WEIGHTS / $LPIPS_LIN_WEIGHTS, or
    ./checkpoints/vgg16-397923af.pth + ./checkpoints/lpips_vgg.pth."""
    import os
    from pathlib import Path

    vgg_path = vgg_path or os.environ.get(
        "LPIPS_VGG_WEIGHTS", "checkpoints/vgg16-397923af.pth")
    lin_path = lin_path or os.environ.get(
        "LPIPS_LIN_WEIGHTS", "checkpoints/lpips_vgg.pth")
    if not (Path(vgg_path).exists() and Path(lin_path).exists()):
        return None
    import torch
    vgg_sd = torch.load(vgg_path, map_location="cpu", weights_only=True)
    lin_sd = torch.load(lin_path, map_location="cpu", weights_only=True)
    return convert_lpips_weights(vgg_sd, lin_sd)
