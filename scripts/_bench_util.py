"""Shared tunnel-proof timing harness for the bench scripts.

The axon tunnel's ``block_until_ready`` does NOT wait for remote
execution, and identical-input dispatches are content-cached.  Every
measurement therefore (a) repeats the op inside ONE jit via ``lax.scan``
with a data dependency between iterations (total work >> tunnel RTT),
(b) folds the full output into the carry so XLA cannot dead-code-
eliminate the op, (c) forces completion with a tiny fetch, and (d)
byte-varies the input per run so the cache cannot replay.
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def measure(fn, x, *rest, iters=20, runs=3, perturb=1e-4,
            return_compile_s=False):
    """Min seconds per ``fn(x, *rest)`` call (chained-scan method).

    ``fn``'s output may be any pytree; its first leaf is folded into the
    carry.  ``x`` must be a float array (it carries the chain).
    """

    @jax.jit
    def run(x, *rest):
        def step(c, _):
            out = fn(c, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            eps = (jnp.sum(leaf.astype(jnp.float32)) * 1e-12).astype(c.dtype)
            return c + eps, None
        c, _ = lax.scan(step, x, None, length=iters)
        return c.ravel()[:1]

    t0 = time.perf_counter()
    np.asarray(run(x, *rest))          # compile + warm
    compile_s = time.perf_counter() - t0
    ts = []
    for i in range(runs):
        t0 = time.perf_counter()
        np.asarray(run(x + (i + 1) * perturb, *rest))
        ts.append(time.perf_counter() - t0)
    per_call = min(ts) / iters
    if return_compile_s:
        return per_call, compile_s
    return per_call
