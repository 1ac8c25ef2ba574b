"""Score-distillation (SDS) guidance: text-guided 3D generation support.

Reference: ``nerfstudio/generative/stable_diffusion.py`` (384 LoC, unused
by the samnerf pipelines) — Stable Diffusion wrapped to provide (a) CFG
text embeddings, (b) the SDS gradient for text-guided 3D optimization,
(c) a latent denoising loop + VAE round trip for ``prompt_to_img``.

TPU-native redesign: the diffusion backbone is *injected* rather than
imported (the `diffusers` package and SD weights are unavailable in
zero-egress environments; the reference hard-depends on them at import
time).  Everything that is math — the scaled-linear schedule, the DDIM
update, classifier-free guidance, the SDS surrogate loss, the
latent<->image scaling — is implemented here as pure jittable JAX, so
any flax/jax UNet + VAE + text encoder drop in.  A tiny analytic
backbone in ``tests/test_export_and_batching.py`` drives the full loop.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

# reference ``stable_diffusion.py:50`` — SD VAE latent scaling.
CONST_SCALE = 0.18215


def scaled_linear_alphas_cumprod(num_train_timesteps: int = 1000,
                                 beta_start: float = 0.00085,
                                 beta_end: float = 0.012) -> jax.Array:
    """Stable Diffusion's ``scaled_linear`` beta schedule -> alpha-bar.

    Matches diffusers' ``PNDMScheduler(beta_schedule="scaled_linear")``
    constants used at reference ``stable_diffusion.py:102-106``.
    """
    betas = jnp.linspace(beta_start ** 0.5, beta_end ** 0.5,
                         num_train_timesteps) ** 2
    return jnp.cumprod(1.0 - betas)


def sds_gradient(denoise_fn: Callable[[jax.Array, jax.Array, jax.Array],
                                      jax.Array],
                 latents: jax.Array, text_embedding: jax.Array,
                 rng: jax.Array,
                 alphas_cumprod: jax.Array,
                 t_range: Tuple[float, float] = (0.02, 0.98),
                 guidance_scale: float = 100.0) -> jax.Array:
    """Score-distillation-sampling gradient (DreamFusion eq. 4; reference
    ``stable_diffusion.py:186-229`` ``sds_loss``).

    Args:
        denoise_fn: (noisy_latents, t, text_embedding) -> predicted noise,
            already classifier-free-guidance combined if desired.
        latents: [B, H, W, C] rendered-image latents (differentiable).
        alphas_cumprod: [T] diffusion schedule.
    Returns:
        w(t) * (eps_pred - eps); backpropagate via :func:`sds_loss`.
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
    :func:`sds_gradient` (the ``_SDSGradient`` autograd trick at
    reference ``stable_diffusion.py:65-82``)."""
    grad = jax.lax.stop_gradient(
        sds_gradient(denoise_fn, latents, text_embedding, rng,
                     alphas_cumprod, **kw))
    return jnp.sum(latents * grad)


@dataclasses.dataclass
class StableDiffusionGuidance:
    """The reference ``StableDiffusion`` module with an injected backbone.

    Components (all optional; methods raise clearly when their component
    is missing):
        unet_fn: (latents [B,H,W,C], t (), text_emb [B,S,D]) -> noise pred.
        vae_encode_fn: images [B,H,W,3] in [0,1] -> latent mean (the
            reference samples the posterior, ``:296-306``; deterministic
            mean is the jit-friendly default).
        vae_decode_fn: latents -> images in [0,1].
        text_embed_fn: list[str] -> [B, S, D] encoder states.
    """
    unet_fn: Optional[Callable] = None
    vae_encode_fn: Optional[Callable] = None
    vae_decode_fn: Optional[Callable] = None
    text_embed_fn: Optional[Callable] = None
    num_train_timesteps: int = 1000
    guidance_scale: float = 100.0

    def __post_init__(self):
        self.alphas_cumprod = scaled_linear_alphas_cumprod(
            self.num_train_timesteps)
        # reference ``:98-99``
        self.min_step = int(self.num_train_timesteps * 0.02)
        self.max_step = int(self.num_train_timesteps * 0.98)

    def _need(self, name):
        fn = getattr(self, name)
        if fn is None:
            raise ImportError(
                f"StableDiffusionGuidance.{name} was not injected. The "
                "`diffusers` backbone is unavailable in this environment; "
                "supply your own jax/flax component (any UNet/VAE/text "
                "encoder with the documented signature works).")
        return fn

    # -- text conditioning (reference ``get_text_embeds``, :150-184) ------
    def get_text_embeds(self, prompt, negative_prompt="") -> jax.Array:
        """[2B, S, D]: negative (uncond) embeddings stacked before the
        prompt embeddings, the CFG layout ``produce_latents`` expects."""
        embed = self._need("text_embed_fn")
        if isinstance(prompt, str):
            prompt, negative_prompt = [prompt], [negative_prompt]
        return jnp.concatenate([embed(negative_prompt), embed(prompt)], 0)

    def _cfg_eps(self, latents, t, text_embeddings):
        """Classifier-free guidance: eps_u + s * (eps_c - eps_u)."""
        unet = self._need("unet_fn")
        both = jnp.concatenate([latents, latents], 0)
        eps = unet(both, t, text_embeddings)
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        return eps_u + self.guidance_scale * (eps_c - eps_u)

    # -- SDS (reference ``sds_loss``, :186-229) ---------------------------
    def sds(self, text_embeddings, images, rng) -> jax.Array:
        """Full-pipeline SDS surrogate loss on [B,H,W,3] images."""
        latents = self.imgs_to_latent(images)
        return sds_loss(
            lambda z, t, emb: self._cfg_eps(z, t, emb),
            latents, text_embeddings, rng, self.alphas_cumprod,
            t_range=(self.min_step / self.num_train_timesteps,
                     self.max_step / self.num_train_timesteps),
            guidance_scale=self.guidance_scale)

    # -- generation loop (reference ``produce_latents``, :231-277) --------
    def produce_latents(self, text_embeddings, height=512, width=512,
                        num_inference_steps=50, rng=None,
                        latents=None) -> jax.Array:
        """DDIM (eta=0) denoising from noise, CFG at every step."""
        b = text_embeddings.shape[0] // 2
        if latents is None:
            latents = jax.random.normal(
                rng, (b, height // 8, width // 8, 4))
        ts = jnp.linspace(self.num_train_timesteps - 1, 0,
                          num_inference_steps).round().astype(jnp.int32)
        a_bar = self.alphas_cumprod

        def step(i, z):
            t = ts[i]
            a_t = a_bar[t]
            a_prev = jnp.where(i + 1 < num_inference_steps,
                               a_bar[ts[jnp.minimum(
                                   i + 1, num_inference_steps - 1)]],
                               1.0)
            eps = self._cfg_eps(z, t, text_embeddings)
            x0 = (z - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
            return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps

        return jax.lax.fori_loop(0, num_inference_steps, step, latents)

    # -- VAE round trip (reference :279-308) ------------------------------
    def latents_to_img(self, latents) -> jax.Array:
        return self._need("vae_decode_fn")(latents / CONST_SCALE)

    def imgs_to_latent(self, imgs) -> jax.Array:
        return self._need("vae_encode_fn")(imgs) * CONST_SCALE

    # -- reference ``prompt_to_img`` (:310-345) ---------------------------
    def prompt_to_img(self, prompts, negative_prompts="", height=512,
                      width=512, num_inference_steps=50,
                      rng=None) -> jax.Array:
        emb = self.get_text_embeds(prompts, negative_prompts)
        lat = self.produce_latents(emb, height, width, num_inference_steps,
                                   rng=rng)
        return self.latents_to_img(lat)


def load_stable_diffusion(*args, **kwargs):
    raise ImportError(
        "Stable Diffusion weights require the `diffusers` package, which "
        "is not available in this environment. Construct a "
        "`StableDiffusionGuidance` with your own injected jax components "
        "(unet_fn / vae_encode_fn / vae_decode_fn / text_embed_fn).")
