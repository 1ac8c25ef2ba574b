"""Honest (chained-scan, fetch-forced) timings for the perception stack:
SAM ViT encoders + flash-attention layer vs XLA attention.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")


from _bench_util import measure as _measure


def measure(fn, x, *rest, iters=10, runs=3):
    return _measure(fn, x, *rest, iters=iters, runs=runs)


def bench_encoder(model_type):
    from samnerf_tpu.perception.sam.build_sam import build_sam
    from samnerf_tpu.perception.sam.sam import Sam

    sam, _ = build_sam(model_type, compute_dtype=jnp.bfloat16)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 1024, 1024, 3)) * 255
    xin = sam.preprocess(x)
    params = jax.jit(lambda x: sam.init(jax.random.PRNGKey(1), x,
                                        method=Sam.encode_image))(xin)
    f = lambda x, p: sam.apply(p, x, method=Sam.encode_image)
    dt = measure(f, xin, params, iters=5)
    print(f"SAM {model_type} image encoder (1024^2, bf16): {dt*1e3:.0f} ms")


def bench_flash():
    """SAM ViT-H global layer shape: 4096 tokens, 16 heads, 80 head dim,
    with the decomposed rel-pos bias."""
    from samnerf_tpu.ops.attention_pallas import flash_attention_relpos

    bh, n, d = 16, 4096, 80
    kh = kw = 64
    q = jax.random.normal(jax.random.PRNGKey(0), (bh, n, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, n, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (bh, n, d), jnp.float32)
    rel_h = jax.random.normal(jax.random.PRNGKey(3), (bh, n, kh)) * 0.02
    rel_w = jax.random.normal(jax.random.PRNGKey(4), (bh, n, kw)) * 0.02
    scale = 1.0 / np.sqrt(d)

    dt = measure(lambda q, k, v: flash_attention_relpos(
        q, k, v, rel_h, rel_w, scale), q, k, v, iters=20)
    print(f"flash attn+relpos 4096tok x16h x80d: {dt*1e3:.2f} ms")

    def xla_attn(q, k, v):
        s = (q @ jnp.swapaxes(k, -1, -2)) * scale
        bias = (rel_h[:, :, :, None] + rel_w[:, :, None, :]).reshape(
            bh, n, n)
        return jax.nn.softmax(s + bias, axis=-1) @ v

    dt = measure(xla_attn, q, k, v, iters=20)
    print(f"XLA attention same shape:            {dt*1e3:.2f} ms")


def main():
    print(f"backend: {jax.default_backend()}")
    bench_flash()
    bench_encoder("vit_b")
    bench_encoder("vit_h")


if __name__ == "__main__":
    main()
