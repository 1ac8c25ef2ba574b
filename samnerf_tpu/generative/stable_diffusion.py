"""Score-distillation (SDS) guidance utilities.

Reference: ``nerfstudio/generative/stable_diffusion.py`` (384 LoC,
unused by the samnerf pipelines) — Stable Diffusion wrapped to provide
the SDS gradient for text-guided 3D generation.

The diffusion backbone (`diffusers`) is unavailable in this
environment, so this module provides the *framework half*: the SDS loss
math as a pure function over any injected denoiser, and a loader that
raises with a clear message if no backbone is supplied (the reference
similarly hard-depends on diffusers at import time).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def sds_gradient(denoise_fn: Callable[[jax.Array, jax.Array, jax.Array],
                                      jax.Array],
                 latents: jax.Array, text_embedding: jax.Array,
                 rng: jax.Array,
                 alphas_cumprod: jax.Array,
                 t_range: Tuple[float, float] = (0.02, 0.98),
                 guidance_scale: float = 100.0) -> jax.Array:
    """Score-distillation-sampling gradient (DreamFusion eq. 4;
    reference ``stable_diffusion.py`` sds_loss).

    Args:
        denoise_fn: (noisy_latents, t, text_embedding) -> predicted noise,
            already classifier-free-guidance combined if desired.
        latents: [B, H, W, C] rendered-image latents (differentiable).
        alphas_cumprod: [T] diffusion schedule.
    Returns:
        The gradient to backpropagate into the latents, i.e.
        w(t) * (eps_pred - eps); use via
        ``jax.lax.stop_gradient``-style custom surrogate:
        loss = sum(latents * stop_grad(grad)).
    """
    num_steps = alphas_cumprod.shape[0]
    k_t, k_n = jax.random.split(rng)
    t = jax.random.randint(
        k_t, (), int(t_range[0] * num_steps), int(t_range[1] * num_steps))
    noise = jax.random.normal(k_n, latents.shape)
    a = alphas_cumprod[t]
    noisy = jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise
    eps_pred = denoise_fn(noisy, t, text_embedding)
    w = 1.0 - a
    return w * (eps_pred - noise)


def sds_loss(denoise_fn, latents, text_embedding, rng, alphas_cumprod,
             **kw) -> jax.Array:
    """Surrogate scalar whose gradient w.r.t. latents equals
    :func:`sds_gradient` (the standard SDS trick)."""
    grad = jax.lax.stop_gradient(
        sds_gradient(denoise_fn, latents, text_embedding, rng,
                     alphas_cumprod, **kw))
    return jnp.sum(latents * grad)


def load_stable_diffusion(*args, **kwargs):
    raise ImportError(
        "Stable Diffusion weights require the `diffusers` package, which "
        "is not available in this environment. Inject your own "
        "`denoise_fn` into `sds_loss` / `sds_gradient` instead (any "
        "flax/jax UNet works).")
