"""Probe the remote TPU execution semantics: is per-call wall timing real?

1. host loop, chained matmuls (c = c @ b each step)
2. one jit containing lax.scan of K chained matmuls
3. single matmul, timed via jax profiler-free wall clock with fresh data

v5e bf16 peak ~197 TFLOPs -> 8192^3 matmul ~5.6 ms.
"""
import time

import jax
import jax.numpy as jnp

N = 4096
FL = 2 * N ** 3
K = 10

a = jax.random.normal(jax.random.PRNGKey(0), (N, N), jnp.bfloat16)
b = jax.random.normal(jax.random.PRNGKey(1), (N, N), jnp.bfloat16) / N

mm = jax.jit(lambda x, y: x @ y)

# 1. host loop chained
c = mm(a, b)
c.block_until_ready()
t0 = time.perf_counter()
c2 = c
for _ in range(K):
    c2 = mm(c2, b)
c2.block_until_ready()
dt = (time.perf_counter() - t0) / K
print(f"host-loop chained: {dt*1e3:.3f} ms/matmul = {FL/dt/1e12:.1f} TFLOPs")

# 2. in-jit scan chained
def scanned(x, y):
    def step(c, _):
        return c @ y, ()
    out, _ = jax.lax.scan(step, x, None, length=K)
    return out

sj = jax.jit(scanned)
sj(a, b).block_until_ready()
t0 = time.perf_counter()
sj(c, b).block_until_ready()
dt = (time.perf_counter() - t0) / K
print(f"in-jit scan chained: {dt*1e3:.3f} ms/matmul = {FL/dt/1e12:.1f} TFLOPs")

t0 = time.perf_counter()
sj(c2, b).block_until_ready()
dt = (time.perf_counter() - t0) / K
print(f"in-jit scan chained (2nd, new input): {dt*1e3:.3f} ms/matmul = {FL/dt/1e12:.1f} TFLOPs")

# 3. repeat same-input call (cache suspicion)
t0 = time.perf_counter()
sj(c, b).block_until_ready()
dt = (time.perf_counter() - t0) / K
print(f"in-jit scan chained (repeat same input): {dt*1e3:.3f} ms/matmul = {FL/dt/1e12:.1f} TFLOPs")
