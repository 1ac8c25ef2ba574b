"""A/B the coherent-sort training encode (sort_points + bwd v4).

Measures, at reference-capacity training shapes on the real chip:
  1. raw encode+vjp wall time, sorted vs unsorted, per field config
     (nerf 16x2@2^19, SAM pyramid 12x8@2^19, proposal 5x2@2^17);
  2. the sort machinery's own cost (argsort + row-gathers) in isolation;
  3. end-to-end train-step throughput via scripts/bench_train_throughput
     is run separately (this script is the kernel-level view).

Tunnel-proof: byte-varying inputs per rep, scalar fetch per rep
(``_bench_util.measure`` pattern).

Run: python scripts/bench_sort_bwd.py [--n 524288] [--reps 8]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _time(fn, inputs, reps):
    """Median wall time over reps with byte-varying inputs; fn must
    return a scalar (fetched, so the tunnel cannot pipeline/cache)."""
    out = fn(*inputs[0])          # compile
    float(out)
    ts = []
    for r in range(reps):
        t0 = time.time()
        float(fn(*inputs[r % len(inputs)]))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=524288)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--hash-fn", default="morton")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from samnerf_tpu.ops import hash_pallas as hp
    from samnerf_tpu.ops.encodings import hash_grid_scalings

    n = args.n
    rng = np.random.RandomState(0)
    pos_sets = [jnp.asarray(rng.rand(n, 3).astype(np.float32) * 0.996
                            + 0.002) for _ in range(4)]

    # the sort machinery alone
    def sort_cost(p):
        perm, inv = hp.coherent_perm(p)
        ps = jnp.take(p, perm, axis=0)
        return jnp.sum(ps[:, 0]) + jnp.sum(inv % 7)

    t_sort = _time(jax.jit(sort_cost), [(p,) for p in pos_sets], args.reps)
    x32 = jnp.asarray(rng.randn(n, 32).astype(np.float32))
    perm0 = jnp.asarray(rng.permutation(n).astype(np.int32))

    def gather_cost(x, perm):
        return jnp.sum(jnp.take(x, perm, axis=0)[:, 0])

    t_gather = _time(jax.jit(gather_cost),
                     [(x32 + r, perm0) for r in range(4)], args.reps)
    print(f"sort+inv+pos-gather: {t_sort*1e3:.2f} ms   "
          f"row-gather [n,32]: {t_gather*1e3:.2f} ms")

    configs = [
        ("nerf 16L x2f @2^19", 16, 1, 19, 16, 2048),
        ("sam  12L x8f @2^19", 12, 4, 19, 16, 512),
        ("prop  5L x2f @2^17", 5, 1, 17, 16, 256),
    ]
    for name, L, P, log2, min_res, max_res in configs:
        steps = (1 << log2) // (hp.PARITIES * hp.LANES)
        scalings = tuple(hash_grid_scalings(L, min_res, max_res).tolist())
        table = hp.init_parity_table(jax.random.PRNGKey(0), L, steps, P,
                                     scale=0.1)

        def encode_vjp(tab, p, sort):
            def f(t):
                o = hp.parity_hash_encode(t, p, scalings, steps, 0,
                                          args.hash_fn, sort)
                return jnp.sum(o * jnp.sin(o))
            l, g = jax.value_and_grad(f)(tab)
            return l + jnp.sum(g[0, :8, 0, 0])

        for sort in (False, True):
            fn = jax.jit(lambda t, p, s=sort: encode_vjp(t, p, s))
            t_med = _time(fn, [(table, p) for p in pos_sets], args.reps)
            print(f"{name} sort={int(sort)}: {t_med*1e3:7.2f} ms "
                  f"({n/t_med/1e6:.1f} M pts/s)", flush=True)


if __name__ == "__main__":
    main()
