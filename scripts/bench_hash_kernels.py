"""Kernel-level timing of the v2 hash-encode kernels, tunnel-proof.

The axon tunnel's block_until_ready is async and fetches dominate wall
time, so each measurement runs K chained encodes inside ONE jit (the
next call's positions depend on the previous output, defeating both
caching and overlap) and fetches a single scalar.

Run: python scripts/bench_hash_kernels.py
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from samnerf_tpu.ops import hash_pallas as hp

    rng = np.random.default_rng(0)
    L, steps, P, n = 16, 512, 1, 262144
    scalings = tuple(float(s) for s in np.geomspace(16, 2048, L))
    table = hp.init_parity_table(jax.random.PRNGKey(1), L, steps, P,
                                 scale=0.5)
    packed = jax.jit(hp.pack_table)(table)
    q8_packed, q8_scales = jax.jit(hp.quantize_parity_table)(table)
    plan = hp._level_plan(scalings, steps)
    meta, scale = hp._plan_meta(plan, steps, P)
    scale2 = jnp.concatenate([scale, jnp.zeros_like(scale)], axis=1)

    pts_r = rng.uniform(0.05, 0.95, size=(n, 3)).astype(np.float32)
    t = np.linspace(0, 1, n).astype(np.float32)
    pts_c = np.stack([0.3 + 0.4 * t, 0.3 + 0.3 * np.sin(6 * t),
                      0.3 + 0.4 * t * t], -1).astype(np.float32)

    from _bench_util import measure

    def bench(call, tab, base, label):
        pos_t = jnp.zeros((8, n), jnp.float32).at[:3].set(
            jnp.asarray(base).T)
        sec = measure(lambda p: call(tab, p), pos_t, iters=8, perturb=3e-4)
        ms = sec * 1e3
        glps = n * L * 8 / sec / 1e9
        print(f"  {label:28s} {ms:8.2f} ms/call  ({glps:5.1f} G lookups/s)")

    for hf in ("reference", "morton"):
        print(f"hash_fn={hf}", flush=True)
        v2 = functools.partial(hp._fwd_call_v2, num_steps=steps, tile=2048,
                               hash_fn=hf)
        bench(lambda tab, p: v2(tab, p, meta, scale), packed, pts_r,
              "v2 f32 random")
        bench(lambda tab, p: v2(tab, p, meta, scale), packed, pts_c,
              "v2 f32 coherent")

        def q8call(tab, p, hf=hf):
            return hp.parity_hash_encode_q8(tab, q8_scales, p, scalings,
                                            steps, hash_fn=hf)
        # q8 public API takes [N, 3] positions
        bench(lambda tab, p: q8call(tab, p.T[:, :3]), q8_packed, pts_r,
              "q8 random")
        bench(lambda tab, p: q8call(tab, p.T[:, :3]), q8_packed, pts_c,
              "q8 coherent")


if __name__ == "__main__":
    main()
