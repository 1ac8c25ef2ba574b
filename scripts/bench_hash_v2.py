"""v2 streaming hash kernel: real-TPU timings at reference capacity.

Shapes mirror the samnerf_distill hot path:
  nerf field   16 levels x 1 pack @ 2^19  (nerfacto.py:89)
  SAM field    12 levels x 4 packs @ 2^19 (sam_field.py:97-110)
  proposal      5 levels x 1 pack @ 2^17  (nerfacto.py:105-106)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")
from samnerf_tpu.ops import hash_pallas as hp
from samnerf_tpu.ops.encodings import hash_grid_scalings


from _bench_util import measure as _measure


def measure(fn, x, *rest, iters=20, runs=3):
    return _measure(fn, x, *rest, iters=iters, runs=runs, perturb=1e-5,
                    return_compile_s=True)


def bench(name, L, P, log2_size, n, min_res=16, max_res=2048, grad=False):
    steps = (2 ** log2_size) // 1024
    scalings = tuple(hash_grid_scalings(L, min_res, max_res).tolist())
    table = hp.init_parity_table(jax.random.PRNGKey(0), L, steps, P)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))

    if grad:
        def f(p, t):
            def loss(t):
                return jnp.sum(hp.parity_hash_encode(t, p, scalings, steps))
            return jax.grad(loss)(t)
    else:
        f = lambda p, t: hp.parity_hash_encode(t, p, scalings, steps)

    dt, cs = measure(f, pos, table, iters=10 if grad else 20)
    lk = n * L * P * 8
    print(f"{name:34s} {dt*1e3:8.2f} ms  {lk/dt/1e9:6.2f}G lookups/s  "
          f"(compile {cs:.0f}s)")
    return dt


def main():
    print(f"backend: {jax.default_backend()}")
    n = 2 ** 17
    bench("nerf 16L 2^19 fwd", 16, 1, 19, n)
    bench("nerf 16L 2^19 fwd+bwd", 16, 1, 19, n, grad=True)
    bench("sam 12L x4P 2^19 fwd", 12, 4, 19, n // 2, min_res=16, max_res=512)
    bench("sam 12L x4P 2^19 fwd+bwd", 12, 4, 19, n // 2,
          min_res=16, max_res=512, grad=True)
    bench("proposal 5L 2^17 fwd", 5, 1, 17, n, max_res=256)
    bench("proposal 5L 2^17 fwd+bwd", 5, 1, 17, n, max_res=256, grad=True)
    # small-table regression check (should route to v1)
    bench("v1 12L 2^15 fwd", 12, 1, 15, n, max_res=512)


if __name__ == "__main__":
    main()
