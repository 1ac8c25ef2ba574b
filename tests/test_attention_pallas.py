"""Flash-attention kernel vs reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from samnerf_tpu.ops import attention_pallas as ap


def test_flash_matches_reference_interpret(monkeypatch):
    # interpret mode lets the kernel run on CPU
    import functools
    from jax.experimental import pallas as pl

    orig_call = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig_call, interpret=True))

    rng = np.random.RandomState(0)
    B, H_grid, W_grid, D = 2, 16, 32, 16  # N=512, kw=32, block covers rows
    N = H_grid * W_grid
    q = rng.randn(B, N, D).astype(np.float32)
    k = rng.randn(B, N, D).astype(np.float32)
    v = rng.randn(B, N, D).astype(np.float32)
    rel_h = rng.randn(B, N, H_grid).astype(np.float32) * 0.1
    rel_w = rng.randn(B, N, W_grid).astype(np.float32) * 0.1
    scale = D ** -0.5

    ref = ap.reference_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(rel_h), jnp.asarray(rel_w), scale)
    out = ap.flash_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(rel_h), jnp.asarray(rel_w), scale,
        block_q=256, block_k=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_flash_attention_is_differentiable(monkeypatch):
    import functools
    from jax.experimental import pallas as pl
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    rng = np.random.RandomState(1)
    B, Hg, Wg, D = 1, 8, 16, 8   # N=128
    N = Hg * Wg
    q = jnp.asarray(rng.randn(B, N, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, N, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, N, D), jnp.float32)
    rel_h = jnp.asarray(rng.randn(B, N, Hg) * 0.1, jnp.float32)
    rel_w = jnp.asarray(rng.randn(B, N, Wg) * 0.1, jnp.float32)
    scale = D ** -0.5

    g_flash = jax.grad(lambda qq: ap.flash_attention_relpos(
        qq, k, v, rel_h, rel_w, scale, 128, 128).sum())(q)
    g_ref = jax.grad(lambda qq: ap.reference_attention_relpos(
        qq, k, v, rel_h, rel_w, scale).sum())(q)
    np.testing.assert_allclose(np.asarray(g_flash), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
