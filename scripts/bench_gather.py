"""Measure hash-table gather strategies on the real TPU.

Decides the design for reference-capacity (2^19) hash tables
(reference: nerfacto.py:89 log2_hashmap_size=19, sam_field.py:97-110).

Measurement notes: the axon tunnel's block_until_ready does NOT wait for
remote execution, and identical-input calls appear to be content-cached.
So every measurement here (a) repeats the op inside ONE jit via lax.scan
with a data dependency between iterations, and (b) forces completion by
fetching a small slice to the host; the tunnel round-trip is measured
separately and subtracted.

Run: python scripts/bench_gather.py
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from samnerf_tpu.ops import hash_pallas as hp

from _bench_util import measure as _measure


def measure(fn, x, *rest, iters=30, runs=3):
    return _measure(fn, x, *rest, iters=iters, runs=runs)


def calibrate():
    a = jax.random.normal(jax.random.PRNGKey(0), (4096, 4096), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (4096, 4096),
                          jnp.bfloat16) / 64
    dt = measure(lambda x, y: x @ y, a, b, iters=100)
    fl = 2 * 4096 ** 3
    print(f"calibration matmul 4096^3 bf16: {dt*1e3:.3f} ms = "
          f"{fl/dt/1e12:.0f} TFLOPs (v5e peak ~197, measured ~139)")


def bench_xla_take(n_idx, table_log2, feat):
    t = jax.random.normal(jax.random.PRNGKey(0), (2 ** table_log2, feat))
    idx = jax.random.randint(jax.random.PRNGKey(1), (n_idx,), 0,
                             2 ** table_log2)
    dt = measure(lambda t, i: jnp.take(t, i, axis=0).sum(axis=-1), t, idx,
                 iters=30)
    return dt, n_idx / dt


def _scan_pallas(n_points, table_log2, unroll):
    """fori_loop scan kernel, table [steps, 8, 128] (one level)."""
    num_steps = (2 ** table_log2) // (hp.PARITIES * hp.LANES)

    def kern(pos_ref, tab_ref, out_ref):
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        s0, s1, s2 = s_iota & 1, (s_iota >> 1) & 1, (s_iota >> 2) & 1
        x = pos_ref[0:1, :]
        y = pos_ref[1:2, :]
        z = pos_ref[2:3, :]
        lo, hi, w = hp._corner_index_math(
            x, y, z, 512.0, False, 0, num_steps, s0, s1, s2)

        if unroll == 0:    # fully unrolled python loop
            acc = jnp.zeros((8, 128), jnp.float32)
            for t in range(num_steps):
                g = jnp.take_along_axis(tab_ref[t], lo, axis=1)
                acc = jnp.where(hi == t, g, acc)
        else:
            def body(b, acc):
                for u in range(unroll):
                    t = b * unroll + u
                    g = jnp.take_along_axis(tab_ref[t], lo, axis=1)
                    acc = jnp.where(hi == t, g, acc)
                return acc
            acc = jax.lax.fori_loop(0, num_steps // unroll, body,
                                    jnp.zeros((8, 128), jnp.float32))
        out_ref[:] = jnp.sum(acc * w, axis=0, keepdims=True)

    def call(pos, tab):
        return pl.pallas_call(
            kern,
            grid=(n_points // 128,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (0, i)),
                pl.BlockSpec((num_steps, 8, 128), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 128), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((1, n_points), jnp.float32),
        )(pos, tab)

    tab = jax.random.normal(jax.random.PRNGKey(0), (num_steps, 8, 128))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (8, n_points))
    return call, pos, tab


def bench_scan(n_points, table_log2, unroll):
    call, pos, tab = _scan_pallas(n_points, table_log2, unroll)
    t0 = time.perf_counter()
    dt = measure(call, pos, tab, iters=30)
    return dt, n_points * 8 / dt, time.perf_counter() - t0


def bench_current(n_points, table_log2, num_levels):
    num_steps = (2 ** table_log2) // (hp.PARITIES * hp.LANES)
    scalings = tuple(float(512 * (l + 1)) for l in range(num_levels))
    table = hp.init_parity_table(jax.random.PRNGKey(0), num_levels, num_steps)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (n_points, 3))
    f = lambda p, t: hp.parity_hash_encode(t, p, scalings, num_steps)
    t0 = time.perf_counter()
    dt = measure(f, pos, table, iters=30)
    wall = time.perf_counter() - t0
    return dt, n_points * num_levels * 8 / dt, wall


def main():
    print(f"backend: {jax.default_backend()}, {jax.devices()}")
    calibrate()
    n = 2 ** 17

    print("\n-- XLA jnp.take rows [T, F], 1M rows --")
    for lg, feat in ((19, 2), (19, 8), (19, 16)):
        dt, rate = bench_xla_take(2 ** 20, lg, feat)
        print(f"  T=2^{lg} F={feat}: {dt*1e3:.2f} ms -> {rate/1e6:.0f}M rows/s")

    print(f"\n-- pallas scan (1 level, n={n}) --")
    for lg in (15, 17, 19):
        for unroll in (1, 8):
            dt, rate, wall = bench_scan(n, lg, unroll)
            print(f"  T=2^{lg} unroll={unroll}: {dt*1e3:.2f} ms, "
                  f"{rate/1e9:.2f}G lookups/s (wall {wall:.0f}s)")

    print(f"\n-- current parity-scan kernel (12 levels, n={n}) --")
    for lg in (15, 17):
        dt, rate, wall = bench_current(n, lg, 12)
        print(f"  T=2^{lg}: {dt*1e3:.2f} ms, {rate/1e9:.2f}G lookups/s "
              f"(wall {wall:.0f}s)")


if __name__ == "__main__":
    main()
