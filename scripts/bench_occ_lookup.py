"""Occupancy-liveness lookup cost: q8-kernel path vs plain XLA gather.

The serve-time culling win is bounded by how cheap the liveness lookup
is; this measures the current ``occupancy_live`` (8-corner q8 hash
kernel) against a nearest-cell ``jnp.take`` gather at serve shapes.

Run: python scripts/bench_occ_lookup.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from samnerf_tpu.ops.occupancy import (occupancy_live,
                                           pack_serve_occupancy)
    sys.path.insert(0, "scripts")
    from bench_frame_v4 import analytic_cells
    from _bench_util import measure

    res = 96
    cells = analytic_cells(res)
    occ = pack_serve_occupancy(cells)
    grid_flat = jnp.asarray(cells.reshape(-1))

    n = 1 << 21
    rng = np.random.RandomState(0)
    # coherent serve-like stream: 2D blocks of nearby positions
    base = rng.rand(n // 1024, 3).astype(np.float32)
    jit_delta = (rng.rand(n // 1024, 1024, 3).astype(np.float32) - 0.5) * 0.02
    pts = np.clip(base[:, None] + jit_delta, 0.001, 0.999).reshape(n, 3)
    p = jnp.asarray(pts)

    def via_kernel(x):
        return occupancy_live(occ, x, res)

    def via_take(x):
        i = jnp.clip((x * res).astype(jnp.int32), 0, res - 1)
        flat = (i[:, 0] * res + i[:, 1]) * res + i[:, 2]
        return jnp.take(grid_flat, flat, axis=0)[:, None]

    for name, fn in (("q8-kernel", via_kernel), ("xla-take", via_take)):
        s = measure(lambda x, fn=fn: fn(x), p, iters=20)
        print(f"  {name:10s}: {s*1e3:7.2f} ms for 2^21 points", flush=True)

    a = np.asarray(via_kernel(p)).reshape(-1)
    b = np.asarray(via_take(p)).reshape(-1)
    agree = (a == b).mean()
    print(f"  agreement kernel vs take: {agree:.4f} "
          "(kernel has baked 1-cell dilation; take is exact-cell)")


if __name__ == "__main__":
    main()
