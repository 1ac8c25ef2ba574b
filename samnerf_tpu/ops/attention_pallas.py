"""Pallas flash attention with SAM's decomposed relative-position bias.

Reference semantics: ``segment_anything/modeling/image_encoder.py:224-240``
(attention) + ``:325-361`` (add_decomposed_rel_pos): softmax over
``q k^T * scale + rel_h[q, kh] + rel_w[q, kw]`` where the key token index
factors as k = kh * Kw + kw on the token grid.

The torch reference materializes the full [B, N, N] attention matrix
(1 GB fp32 for the 64x64-token global layers of ViT-H).  This kernel is an
online-softmax (flash) tiling: the logits tile lives in VMEM only, and the
decomposed bias is reconstructed per (q-tile, k-tile) from the compact
``rel_h [B, N, Kh]`` / ``rel_w [B, N, Kw]`` operands, so HBM traffic is
O(N * D) instead of O(N^2).

Used for the ViT global-attention layers (window layers have 196-token
windows where plain XLA attention is already optimal).
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, rel_h_ref, rel_w_ref, o_ref,
                 *, scale: float, block_k: int, kw_size: int):
    """Grid: (batch*heads, num_q_blocks).  Block shapes:
    q [1, bq, d], k/v [1, N, d], rel_h [1, bq, Kh], rel_w [1, bq, Kw],
    o [1, bq, d].

    The decomposed bias for a key tile is reconstructed as two one-hot
    matmuls (``rel @ E``): Mosaic forbids dynamic lane-dim slices that are
    not 128-aligned, and selection matmuls ride the MXU for free.
    """
    q = q_ref[0].astype(jnp.float32) * scale  # [bq, d]
    n = k_ref.shape[1]
    bq, d = q.shape
    num_kb = n // block_k
    rel_h = rel_h_ref[0].astype(jnp.float32)  # [bq, Kh]
    rel_w = rel_w_ref[0].astype(jnp.float32)  # [bq, Kw]
    kh_size = rel_h.shape[-1]

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [bq, block_k]

        # key j (global) -> (kh, kw) = (j // Kw, j % Kw); bias[q, j] =
        # rel_h[q, kh(j)] + rel_w[q, kw(j)], realized as one-hot selections
        jj = (jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
              + kb * block_k)
        e_h = (jax.lax.broadcasted_iota(jnp.int32, (kh_size, block_k), 0)
               == jj // kw_size).astype(jnp.float32)  # [Kh, block_k]
        e_w = (jax.lax.broadcasted_iota(jnp.int32, (kw_size, block_k), 0)
               == jj % kw_size).astype(jnp.float32)   # [Kw, block_k]
        bias = (jax.lax.dot_general(rel_h, e_h, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(rel_w, e_w, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32))
        logits = logits + bias

        m_cur = jnp.max(logits, axis=-1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)  # [bq, block_k]
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention_relpos(q: jax.Array, k: jax.Array, v: jax.Array,
                           rel_h: jax.Array, rel_w: jax.Array,
                           scale: float,
                           block_q: int = 512,
                           block_k: int = 512) -> jax.Array:
    """Args:
        q, k, v: [B, N, D] (B = batch * heads; D = head dim).
        rel_h: [B, N, Kh]; rel_w: [B, N, Kw] with Kh * Kw == N
            (q-dependent decomposed bias, already contracted with q).
        scale: softmax scale applied to q.
    Returns:
        [B, N, D].

    Differentiable: the backward pass recomputes through the plain-XLA
    reference (the encoder is frozen in every samnerf pipeline, so the
    bwd is only exercised by fine-tuning workloads; a fused bwd kernel
    is not worth its VMEM budget for that).
    """
    return _flash_fwd_impl(q, k, v, rel_h, rel_w, scale, block_q, block_k)


def _flash_fwd_impl(q, k, v, rel_h, rel_w, scale, block_q, block_k):
    b, n, d = q.shape
    kh = rel_h.shape[-1]
    kw = rel_w.shape[-1]
    assert kh * kw == n, (kh, kw, n)
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    assert n % block_q == 0 and n % block_k == 0
    assert block_k % kw == 0, "key tile must cover whole kh rows"

    grid = (b, n // block_q)
    kernel = functools.partial(_attn_kernel, scale=scale, block_k=block_k,
                               kw_size=kw)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, kh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_q, kw), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v, rel_h, rel_w)


def _flash_fwd_rule(q, k, v, rel_h, rel_w, scale, block_q, block_k):
    out = _flash_fwd_impl(q, k, v, rel_h, rel_w, scale, block_q, block_k)
    return out, (q, k, v, rel_h, rel_w)


def _flash_bwd_rule(scale, block_q, block_k, res, g):
    q, k, v, rel_h, rel_w = res
    _, vjp = jax.vjp(
        lambda *a: reference_attention_relpos(*a, scale), q, k, v, rel_h,
        rel_w)
    return vjp(g)


flash_attention_relpos.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def reference_attention_relpos(q, k, v, rel_h, rel_w, scale):
    """Plain-XLA equivalent (used for small windows and as the golden
    reference for the kernel)."""
    logits = jnp.einsum("bnd,bmd->bnm", q * scale, k)
    b, n, _ = q.shape
    kh = rel_h.shape[-1]
    kw = rel_w.shape[-1]
    bias = (rel_h[:, :, :, None] + rel_w[:, :, None, :]).reshape(b, n, n)
    attn = jax.nn.softmax((logits + bias).astype(jnp.float32), axis=-1)
    return jnp.einsum("bnm,bmd->bnd", attn.astype(q.dtype), v)
