"""v2 (stream-all-slabs) vs v4 (prefetch-gather touched slabs) at
reference capacity, on random / coherent / frame-like point sets.

Run on the real chip: python scripts/bench_hash_v4.py
"""
import functools
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def frame_like_points(n, samples=32, side=128, seed=0):
    """Positions shaped like a real serve batch: a camera at the origin
    sweeping a pixel grid, samples along each ray (lindisp-ish), then
    sample-major flattened — the exact coherence structure eval tiles
    see (adjacent rays at the same depth)."""
    rays = n // samples
    g = int(np.sqrt(rays))
    ii, jj = np.meshgrid(np.linspace(-0.3, 0.3, g),
                         np.linspace(-0.3, 0.3, g), indexing="ij")
    d = np.stack([ii, jj, -np.ones_like(ii)], -1).reshape(-1, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = 1.0 / np.linspace(1.0 / 0.1, 1.0 / 3.0, samples)
    pts = (d[:, None, :] * t[None, :, None])           # [rays, S, 3]
    pts = np.swapaxes(pts, 0, 1).reshape(-1, 3)        # sample-major
    # contract to unit cube like the fields do
    mag = np.maximum(np.abs(pts).max(-1, keepdims=True), 1e-12)
    pts = np.where(mag < 1, pts, (2 - 1 / mag) * pts / mag)
    pts = (pts + 2.0) / 4.0
    reps = -(-n // pts.shape[0])
    return np.tile(pts, (reps, 1))[:n].astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from samnerf_tpu.ops import hash_pallas as hp
    from _bench_util import measure

    rng = np.random.default_rng(0)
    L, steps, P, n = 16, 512, 1, 262144
    scalings = tuple(float(s) for s in np.geomspace(16, 2048, L))
    table = hp.init_parity_table(jax.random.PRNGKey(1), L, steps, P,
                                 scale=0.5)
    packed = jax.jit(hp.pack_table)(table)
    q8_packed, q8_scales = jax.jit(hp.quantize_parity_table)(table)
    plan = hp._level_plan(scalings, steps)
    meta, scale = hp._plan_meta(plan, steps, P)

    pts_r = rng.uniform(0.05, 0.95, size=(n, 3)).astype(np.float32)
    pts_f = frame_like_points(n)

    def bench(call, base, label):
        pos_t = jnp.zeros((8, n), jnp.float32).at[:3].set(
            jnp.asarray(base).T)
        sec = measure(lambda p: call(p), pos_t, iters=8, perturb=3e-5)
        ms = sec * 1e3
        glps = n * L * 8 / sec / 1e9
        print(f"  {label:30s} {ms:8.2f} ms/call  ({glps:5.1f} G lookups/s)",
              flush=True)

    for hf in ("reference", "morton"):
        print(f"hash_fn={hf}", flush=True)
        v2 = functools.partial(hp._fwd_call_v2, num_steps=steps, tile=8192,
                               hash_fn=hf)
        slab = min(hp.V2_SLAB, steps)

        def v4(p, hf=hf):
            ids = hp._touched_slab_ids(p, plan, steps, 8192, slab, hf)
            return hp._fwd_call_v4(packed, p, meta, scale, ids,
                                   num_steps=steps, num_levels=L, tile=8192,
                                   hash_fn=hf)

        def q8v4(p, hf=hf):
            return hp.parity_hash_encode_q8(q8_packed, q8_scales,
                                            p.T[:, :3], scalings,
                                            steps, hash_fn=hf)

        for pts, tag in ((pts_r, "random"), (pts_f, "frame-like")):
            bench(lambda p: v2(packed, p, meta, scale), pts, f"v2 f32 {tag}")
            bench(v4, pts, f"v4 f32 {tag}")
            bench(q8v4, pts, f"v4 q8  {tag}")


if __name__ == "__main__":
    main()
