"""TPU-native multiresolution hash encoding (Pallas kernel).

Replaces tinycudann's HashGrid (reference: imported at
``nerfstudio/fields/nerfacto_field.py:51-55``, configured at
``:157-167``; torch fallback semantics at
``nerfstudio/field_components/encodings.py:289-349``) with a design built
around what the TPU can actually vectorize.

Why not a straight port: XLA's TPU gather is scalar-unit bound
(~150M lookups/s measured on v5e) — a 512^2 frame needs ~4G table
lookups, i.e. ~25 s of pure gathering.  The only *vectorized* random
access Mosaic exposes is ``take_along_axis`` along the lane dimension of
a (sublanes, 128) register: 128-entry tables, per-sublane-row indices,
one op per 1024 lookups.

The kernel therefore re-derives the encoding around that primitive:

**Parity partitioning.**  Every lattice point p has a parity
s(p) = (x&1) | (y&1)<<1 | (z&1)<<2.  The 8 corners of ANY grid cell
carry all 8 distinct parities (corner parities = base_parity XOR
{0,1}^3), and a lattice point's parity does not depend on which cell is
interpolating it, so partitioning the table into 8 parity classes keeps
the field continuous.  Corner-with-parity-s is assigned to sublane s;
table rows are stored parity-interleaved (row 8t+s belongs to class s).
One scan step then loads table rows [8t, 8t+8) as a (8, 128) register —
a *contiguous* VMEM load — and a single lane-gather + compare + select
resolves one candidate row for all 8 corners of 128 points at once:
~3 vector ops per 1024 entries scanned per 128 points.

**In-kernel index math.**  Positions (12 B/point) stream in; scaled
coords, corner assignment, spatial hash (reference primes
{1, 2654435761, 805459861} with XOR, ``encodings.py:289-306``), and
trilinear weights are all computed in registers — streaming precomputed
indices/weights would cost ~2 KB/point of HBM traffic.

**Packed features.**  Each f32 table lane packs 2 bfloat16 features
(high/low 16 bits), so one gather fetches both features of an entry.
Master parameters stay fp32 [..., 2]; packing happens outside the
kernel (cost: one pass over the table per step).

**Dense coarse levels.**  Levels where a parity class fits the class
capacity use exact linear indexing (no collisions), like tcnn's
``res^3 < hashmap_size`` rule.

Measured on v5e: ~13-15G lookups/s even with indices streamed from HBM
at T=2^14; the fused kernel removes the streaming term entirely.

The backward pass is a second Pallas kernel: per scan step, cotangents
are masked per corner and scattered to lanes with a one-hot matmul on
the MXU (grad_row[s, m] = sum_j [lo==m] * v[s, j]); the accumulator
lives in VMEM across the sequential grid.  Position gradients are not
propagated (the reference never trains through sample positions;
``samnerf/sam_field.py:116`` detaches them).
"""
from __future__ import annotations

import functools
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PRIMES = (1, 2654435761, 805459861)

LANES = 128
PARITIES = 8


def _kernel_version() -> str:
    """Hash-kernel selector (SAMNERF_HASH_KERNEL env, A/B-able).

    v2 (default): stream every table slab through each tile with the
    per-tile slab-membership skip — measured FASTER end-to-end (bench.py
    1.98 vs 1.37 FPS at 512^2 full capacity) because the scan is
    VPU-bound and Mosaic already pipelines the slab DMA under it, while
    v4's touched-slab ids duplicate the corner hashing in XLA.
    v4: prefetch-gather only touched slabs; required (and always used)
    for the dead-tile skip when a ``live`` mask is passed; on random
    training batches it ties v2 (7.6k vs 7.4k rays/s)."""
    import os
    return os.environ.get("SAMNERF_HASH_KERNEL", "v2")


def level_is_dense(res: int, num_steps: int) -> bool:
    """A parity class holds ceil((res+2)/2)^3 lattice points when indexed
    densely; dense iff that fits the class capacity (num_steps * 128)."""
    half = res // 2 + 2
    return half ** 3 <= num_steps * LANES


def _level_plan(scalings: Sequence[float], num_steps: int):
    """Static per-level plan: (resolution scale, dense?, half grid size)."""
    plan = []
    for s in scalings:
        res = int(np.floor(float(s)))
        plan.append((float(s), level_is_dense(res, num_steps), res // 2 + 2))
    return tuple(plan)


def _corner_index_math(x, y, z, scale, dense, half, num_steps, s0, s1, s2,
                       hash_fn: str = "reference"):
    """Shared fwd/bwd index math on (1, nt) vectors -> lo/hi/w [8, nt].

    The corner handled by sublane s is the one of floor/floor+1 along
    each axis whose lattice parity bit equals s_k:
    coord_k = floor_k + ((floor_k & 1) XOR s_k).
    """
    sx = x * scale
    sy = y * scale
    sz = z * scale
    fx = jnp.floor(sx)
    fy = jnp.floor(sy)
    fz = jnp.floor(sz)
    ox = sx - fx
    oy = sy - fy
    oz = sz - fz
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)
    iz = fz.astype(jnp.int32)
    ex = (ix & 1) ^ s0          # [8, nt] corner offset bits
    ey = (iy & 1) ^ s1
    ez = (iz & 1) ^ s2
    cx = ix + ex
    cy = iy + ey
    cz = iz + ez
    w = (jnp.where(ex == 1, ox, 1.0 - ox)
         * jnp.where(ey == 1, oy, 1.0 - oy)
         * jnp.where(ez == 1, oz, 1.0 - oz))
    if dense:
        idx = ((cx >> 1).astype(jnp.uint32)
               + jnp.uint32(half) * ((cy >> 1).astype(jnp.uint32)
               + jnp.uint32(half) * (cz >> 1).astype(jnp.uint32)))
    else:
        idx = ((cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0]))
               ^ (cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
               ^ (cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])))
        if hash_fn.startswith("morton"):
            idx = _morton_mix(idx, cx, cy, cz, scale, num_steps,
                              morton_key_width(hash_fn))
    lo = (idx & jnp.uint32(LANES - 1)).astype(jnp.int32)
    hi = ((idx >> 7) & jnp.uint32(num_steps - 1)).astype(jnp.int32)
    return lo, hi, w


def morton_key_width(hash_fn: str) -> int:
    """Spatial key width of a "morton[N]" hash_fn string (default 4)."""
    if hash_fn.startswith("morton") and hash_fn[6:]:
        return int(hash_fn[6:])
    return 4


def _morton_mix(idx_hash, cx, cy, cz, scale, num_steps,
                key_bits: int = 4):
    """Locality-preserving remix: top ``key_bits`` index bits = coarse
    spatial key (interleaved half-space bits of x/y/z, then the next
    octave: x2, y2, z2, x4, ...); the scrambling hash keeps the rest.
    Collisions stay within coarse regions, so coherent point tiles touch
    few table slabs (skipped via the kernels' membership masks).

    Wider keys give the slab skip finer spatial resolution (key_bits=6 ->
    64 regions instead of 8 octants) at the cost of hash adaptivity: each
    region owns a FIXED 2^-key_bits slice of the table, so scenes whose
    content concentrates in few regions lose effective capacity.  Quality
    must be re-measured when raising it (train and serve must agree)."""
    bits = int(np.log2(num_steps * LANES))
    inv = 1.0 / jnp.maximum(jnp.float32(scale), 1.0)
    ux = cx.astype(jnp.float32) * inv
    uy = cy.astype(jnp.float32) * inv
    uz = cz.astype(jnp.float32) * inv
    key = jnp.zeros_like(idx_hash)
    axes = (ux, uy, uz)
    for b in range(key_bits):
        octave = b // 3            # 0 = half-space, 1 = quarter, ...
        v = axes[b % 3] * float(1 << octave)
        bit = ((v - jnp.floor(v)) >= 0.5).astype(jnp.uint32)
        key = (key << 1) | bit
    return (key << (bits - key_bits)) | (
        idx_hash & jnp.uint32((1 << (bits - key_bits)) - 1))


def _corner_index_math_dyn(x, y, z, scale, dense, half, num_steps,
                           s0, s1, s2, hash_fn: str = "reference"):
    """_corner_index_math with TRACED per-level scale/dense/half (the v2
    streaming kernel reads them from SMEM per grid step): both the dense
    linear index and the spatial hash are computed and selected."""
    sx = x * scale
    sy = y * scale
    sz = z * scale
    fx = jnp.floor(sx)
    fy = jnp.floor(sy)
    fz = jnp.floor(sz)
    ox = sx - fx
    oy = sy - fy
    oz = sz - fz
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)
    iz = fz.astype(jnp.int32)
    ex = (ix & 1) ^ s0
    ey = (iy & 1) ^ s1
    ez = (iz & 1) ^ s2
    cx = ix + ex
    cy = iy + ey
    cz = iz + ez
    w = (jnp.where(ex == 1, ox, 1.0 - ox)
         * jnp.where(ey == 1, oy, 1.0 - oy)
         * jnp.where(ez == 1, oz, 1.0 - oz))
    uhalf = half.astype(jnp.uint32)
    idx_dense = ((cx >> 1).astype(jnp.uint32)
                 + uhalf * ((cy >> 1).astype(jnp.uint32)
                 + uhalf * (cz >> 1).astype(jnp.uint32)))
    idx_hash = ((cx.astype(jnp.uint32) * jnp.uint32(_PRIMES[0]))
                ^ (cy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
                ^ (cz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])))
    if hash_fn.startswith("morton"):
        idx_hash = _morton_mix(idx_hash, cx, cy, cz, scale, num_steps,
                               morton_key_width(hash_fn))
    idx = jnp.where(dense != 0, idx_dense, idx_hash)
    lo = (idx & jnp.uint32(LANES - 1)).astype(jnp.int32)
    hi = ((idx >> 7) & jnp.uint32(num_steps - 1)).astype(jnp.int32)
    return lo, hi, w


def _corner_index_math_q8(x, y, z, scale, dense, half, num_steps,
                          s0, s1, s2, hash_fn: str = "reference"):
    """Index math for the int8-packed layout: the SAME class entry
    e = idx mod (num_steps*128) as the f32 path, re-addressed as
    (row-group e>>8, lane (e>>1)&127, byte-half e&1).  Returns
    (lo8 | half<<8, hi8, w)."""
    lo, hi, w = _corner_index_math_dyn(x, y, z, scale, dense, half,
                                       num_steps, s0, s1, s2, hash_fn)
    e = (hi << 7) | lo                      # class entry index
    lo8 = ((e >> 1) & (LANES - 1)) | ((e & 1) << 8)
    hi8 = e >> 8
    return lo8, hi8, w


def _corner_index_math_q4(x, y, z, scale, dense, half, num_steps,
                          s0, s1, s2, hash_fn: str = "reference"):
    """Index math for the int4-packed layout: class entry e re-addressed
    as (row-group e>>9, lane (e>>2)&127, byte-quarter e&3).  Returns
    (lo4 | quarter<<8, hi4, w)."""
    lo, hi, w = _corner_index_math_dyn(x, y, z, scale, dense, half,
                                       num_steps, s0, s1, s2, hash_fn)
    e = (hi << 7) | lo
    lo4 = ((e >> 2) & (LANES - 1)) | ((e & 3) << 8)
    hi4 = e >> 9
    return lo4, hi4, w


def _corner_index_math_q(qbits: int):
    return _corner_index_math_q8 if qbits == 8 else _corner_index_math_q4


def _dequant_selected(acc, sel, qscale, qbits: int):
    """Gathered u32 lanes ``acc`` [8, 128] + per-corner sub-lane selector
    ``sel`` (byte half for q8, byte quarter for q4) -> dequantized
    (f0, f1) feature pairs."""
    bits = pltpu.bitcast(acc, jnp.uint32)
    if qbits == 8:
        v16 = (bits >> (sel.astype(jnp.uint32) * 16)) & jnp.uint32(0xFFFF)
        f0 = (((v16 & 0xFF) ^ 0x80).astype(jnp.int32) - 0x80)
        f1 = ((((v16 >> 8) & 0xFF) ^ 0x80).astype(jnp.int32) - 0x80)
    else:
        v8 = (bits >> (sel.astype(jnp.uint32) * 8)) & jnp.uint32(0xFF)
        f0 = (((v8 & 0xF) ^ 0x8).astype(jnp.int32) - 0x8)
        f1 = ((((v8 >> 4) & 0xF) ^ 0x8).astype(jnp.int32) - 0x8)
    return f0.astype(jnp.float32) * qscale, f1.astype(jnp.float32) * qscale


# --- forward kernel -----------------------------------------------------------


def _fwd_kernel(pos_ref, table_ref, out_ref, *, plan, num_steps: int,
                num_packed: int, num_levels: int, tile: int):
    """Blocks: pos [8, tile] (rows 0..2 = x,y,z in [0,1]),
    table [P*L, num_steps*8, 128] packed f32, out [P*2*L, tile] f32.

    The tile is processed in 128-lane sub-tiles by an inner loop so the
    table block (whose index map is constant) is DMA'd once per `tile`
    points rather than once per 128.

    Output channel layout: c = (p * 2 + f) * L + l  (feature-major within
    a packed pair, level minor — matches ``hash_encode``'s [N, F*L]).
    """
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (PARITIES, LANES), 0)
    s0 = s_iota & 1
    s1 = (s_iota >> 1) & 1
    s2 = (s_iota >> 2) & 1

    for j in range(tile // LANES):
        cols = slice(j * LANES, (j + 1) * LANES)
        x = pos_ref[0:1, cols]
        y = pos_ref[1:2, cols]
        z = pos_ref[2:3, cols]
        for l, (scale, dense, half) in enumerate(plan):
            lo, hi, w = _corner_index_math(x, y, z, scale, dense, half,
                                           num_steps, s0, s1, s2)
            for p in range(num_packed):
                li = p * num_levels + l
                # python-unrolled scan: Mosaic pipelines the static slices
                # well; a fori_loop with dynamic slices measured ~90x slower
                acc = jnp.zeros((PARITIES, LANES), jnp.float32)
                for t in range(num_steps):
                    src = table_ref[li, t * PARITIES:(t + 1) * PARITIES, :]
                    g = jnp.take_along_axis(src, lo, axis=1)
                    acc = jnp.where(hi == t, g, acc)
                # unpack 2 bf16 per f32 lane; weighted sum over corners
                bits = pltpu.bitcast(acc, jnp.uint32)
                f0 = pltpu.bitcast(bits & jnp.uint32(0xFFFF0000), jnp.float32)
                f1 = pltpu.bitcast(bits << 16, jnp.float32)
                c = (p * 2) * num_levels + l
                out_ref[c:c + 1, cols] = jnp.sum(f0 * w, axis=0,
                                                 keepdims=True)
                c = (p * 2 + 1) * num_levels + l
                out_ref[c:c + 1, cols] = jnp.sum(f1 * w, axis=0,
                                                 keepdims=True)


def pack_table(table_f32: jax.Array) -> jax.Array:
    """[..., 2] fp32 master params -> packed f32 (hi bf16 = feature 0)."""
    b0 = table_f32[..., 0].astype(jnp.bfloat16)
    b1 = table_f32[..., 1].astype(jnp.bfloat16)
    u0 = jax.lax.bitcast_convert_type(b0, jnp.uint16).astype(jnp.uint32) << 16
    u1 = jax.lax.bitcast_convert_type(b1, jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(u0 | u1, jnp.float32)


def _fwd_call(packed_table, positions_t, *, plan, num_steps, num_packed,
              num_levels, tile):
    n = positions_t.shape[1]
    kern = functools.partial(_fwd_kernel, plan=plan, num_steps=num_steps,
                             num_packed=num_packed, num_levels=num_levels,
                             tile=tile)
    c_out = num_packed * 2 * num_levels
    return pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i)),
            pl.BlockSpec((num_packed * num_levels, num_steps * PARITIES,
                          LANES), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((c_out, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((c_out, n), jnp.float32),
    )(positions_t, packed_table)


# --- backward kernel ----------------------------------------------------------


def _bwd_kernel(pos_ref, g_ref, gtab_ref, *, plan, num_steps: int,
                num_packed: int, num_levels: int, tile: int):
    """Blocks: pos [8, nt], cotangent g [P*2*L, nt],
    gtab [2, P*L, 8, steps, 128] f32 (parity-major so each class's grad is
    one contiguous [steps, 128] write), accumulated across the sequential
    grid.

    Per (level, parity, feature) the whole scatter is ONE MXU matmul:
    grad_class[t, m] = sum_j ((hi==t) * u)[t, j] * (lo==m)[m, j],
    i.e. [steps, nt] x [nt, 128] with both one-hot factors built by
    iota-compares on the VPU.
    """
    @pl.when(pl.program_id(0) == 0)
    def _init():
        gtab_ref[...] = jnp.zeros_like(gtab_ref)

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (PARITIES, LANES), 0)
    s0 = s_iota & 1
    s1 = (s_iota >> 1) & 1
    s2 = (s_iota >> 2) & 1
    lane_iota_t = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    step_iota = jax.lax.broadcasted_iota(jnp.int32, (num_steps, LANES), 0)

    for j in range(tile // LANES):
        cols = slice(j * LANES, (j + 1) * LANES)
        x = pos_ref[0:1, cols]
        y = pos_ref[1:2, cols]
        z = pos_ref[2:3, cols]
        for l, (scale, dense, half) in enumerate(plan):
            lo, hi, w = _corner_index_math(x, y, z, scale, dense, half,
                                           num_steps, s0, s1, s2)
            for s in range(PARITIES):
                # [128 m-rows, nt]: oh_lo[m, j] = (lo[s, j] == m)
                oh_lo = (lane_iota_t == lo[s:s + 1, :]).astype(jnp.float32)
                # [steps t-rows, nt]: oh_hi[t, j] = (hi[s, j] == t)
                oh_hi = (step_iota == hi[s:s + 1, :]).astype(jnp.float32)
                ws = w[s:s + 1, :]
                for p in range(num_packed):
                    li = p * num_levels + l
                    for f in range(2):
                        gch = g_ref[(p * 2 + f) * num_levels + l:
                                    (p * 2 + f) * num_levels + l + 1, cols]
                        u = oh_hi * (gch * ws)            # [steps, nt]
                        grad = jax.lax.dot_general(
                            u, oh_lo, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        gtab_ref[f, li, s, :, :] += grad


def _bwd_call(positions_t, g, *, plan, num_steps, num_packed, num_levels,
              tile):
    n = positions_t.shape[1]
    kern = functools.partial(_bwd_kernel, plan=plan, num_steps=num_steps,
                             num_packed=num_packed, num_levels=num_levels,
                             tile=tile)
    c_out = num_packed * 2 * num_levels
    gl = num_packed * num_levels
    return pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i)),
            pl.BlockSpec((c_out, tile), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec(
            (2, gl, PARITIES, num_steps, LANES), lambda i: (0, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (2, gl, PARITIES, num_steps, LANES), jnp.float32),
    )(positions_t, g)


# --- v2: streaming kernels for reference-capacity tables ----------------------
#
# The v1 kernels above hold the WHOLE multi-level table in VMEM and
# python-unroll the scan — ideal up to ~2^15 entries/level, impossible at
# the reference's 2^19 (``nerfacto.py:89``, ``sam_field.py:97-110``): 24+ MB
# of tables and a 512-step unrolled program.  v2 streams instead:
#
# - grid = (packs*levels, point_tiles): ONE level's packed table (2 MB at
#   2^19) is VMEM-resident per grid step, pipelined by Mosaic across the
#   level sweep;
# - the scan is a fori_loop with a PER-LEVEL dynamic bound read from SMEM
#   metadata (program size is O(unroll), not O(table)); dense coarse
#   levels scan only ceil(half^3/128) row-groups instead of the full
#   hashed capacity;
# - backward accumulates per-level gradient blocks in VMEM across the
#   point-tile sweep, with the scatter expressed as chunked one-hot
#   matmuls on the MXU (batched over the 8 parity classes).

V2_SLAB = 32           # fwd scan steps per grid slab (static slices inside)
V2_SLAB_SERVE = 16     # q8 (serve-only) slab: finer slabs give the
#   per-tile touched-slab skip better resolution on coherent serve
#   tiles; +14% static-frame FPS vs 32 (docs/SERVE_AB_r4.json), while
#   random training batches were never measured to benefit.
V2_BWD_CHUNK = 64      # bwd one-hot matmul rows per chunk


def _plan_meta(plan, num_steps: int, num_packed: int):
    """Per-(pack, level) kernel metadata.

    meta int32 [PL, 4]: (dense, half, fwd_chunks, bwd_chunks);
    scale f32 [PL, 1].
    """
    num_levels = len(plan)
    slab = min(V2_SLAB, num_steps)
    bwd_chunk = min(V2_BWD_CHUNK, num_steps)
    meta = np.zeros((num_packed * num_levels, 4), np.int32)
    scale = np.zeros((num_packed * num_levels, 1), np.float32)
    for p in range(num_packed):
        for l, (s, dense, half) in enumerate(plan):
            steps_l = num_steps
            if dense:
                steps_l = min(num_steps, -(-(half ** 3) // LANES))
            row = p * num_levels + l
            meta[row] = (1 if dense else 0, half,
                         -(-steps_l // slab), -(-steps_l // bwd_chunk))
            scale[row, 0] = s
    return jnp.asarray(meta), jnp.asarray(scale)


def _group_skip_enabled(n_slabs: int, tile: int,
                        has_live: bool = False) -> bool:
    """Per-128-point-group slab skipping (see _fwd_kernel_v2): the group
    bitmask needs one int32 per group, so it requires n_slabs <= 32, and
    only helps when a tile holds more than one group.

    Default: ON only for live-masked calls (dead groups skip their slab
    scans entirely — the win that motivated it; measured on TPU).  On
    dense all-live tiles the s==0 mask build + per-group ``pl.when``
    dispatch measured ~35% SLOWER than the plain tile-level skip
    (1.90 ms vs 1.40 ms at serve shapes, /tmp/r4/verify_gs.log), so
    dense calls need the env opt-in SAMNERF_GROUP_SKIP=1 (A/B hook);
    SAMNERF_GROUP_SKIP=0 force-disables everywhere."""
    import os
    env = os.environ.get("SAMNERF_GROUP_SKIP", "")
    if env == "0":
        return False
    if not (1 < n_slabs <= 32 and tile > LANES):
        return False
    return has_live or env == "1"


def _group_mask_words(sl_of, dead, n_slabs: int, tile: int):
    """Per-128-lane-group touched-slab bitmasks.

    sl_of [8, tile] int32 slab ids; dead [1, tile] (>0 marks a dead
    point whose slabs are excluded) or None.  Returns a list of
    tile//LANES scalar int32 words, bit sl set iff some live point's
    corner in the group resolves to slab sl.  Bit 31 wraps to the int32
    sign bit; (word >> sl) & 1 still extracts it exactly."""
    words = []
    for g in range(tile // LANES):
        cols = slice(g * LANES, (g + 1) * LANES)
        slg = sl_of[:, cols]
        alive = None if dead is None else (dead[:, cols] <= 0.0)
        word = None
        for sl in range(n_slabs):
            t = (slg == sl) if alive is None else ((slg == sl) & alive)
            bit = jnp.max(t.astype(jnp.int32)) << sl
            word = bit if word is None else word | bit
        words.append(word)
    return words


def _fwd_kernel_v2(meta_ref, scale_ref, pos_ref, table_ref, out_ref,
                   lo_s, hi_s, w_s, mask_s, gmask_s, *, num_steps: int,
                   tile: int, slab: int, hash_fn: str = "reference",
                   group_skip: bool = False, has_live: bool = False):
    """grid (PL, tiles, slabs).  Blocks: meta [PL, 4] / scale [PL, 1]
    (SMEM, full), pos [8, tile] (constant in s; row 3 carries optional
    dead-point flags, >0 = dead), table [1, slab*8, 128] (the s-th slab
    of (pack, level) l — STATIC in-slab slices so Mosaic
    register-allocates the scan), out [1, 2, tile] accumulated in VMEM
    across the slab sweep.  Scratch lo/hi/w [8, tile] cache the corner
    index math, computed once per (l, i) at s == 0; ``mask_s`` [slabs]
    (SMEM) records which slabs the tile touches at all — untouched slabs
    skip their scan entirely (spatially coherent tiles under a
    locality-preserving hash, and every out-of-range slab of dense
    coarse levels).

    ``group_skip``: additionally keep a per-128-point-group slab
    bitmask (``gmask_s`` [tile//128] int32, SMEM) — a group only scans
    the slabs its own corners resolve to.  Serve tiles are 1024-ray
    pixel blocks x 8 depths; one group is ~a 32x4-pixel patch at ONE
    depth, so its morton-region (= slab) footprint is much smaller than
    the tile's.  With ``has_live``, dead points contribute no mask bits:
    fully-dead groups scan nothing and output zeros (outputs at dead
    points are unspecified — callers gate on liveness downstream).

    A (point, corner) matches exactly one row-group in the whole table,
    so per-slab contributions are disjoint and the weighted partial sums
    accumulate exactly."""
    n_slabs = num_steps // slab
    slab_shift = slab.bit_length() - 1
    pid = pl.program_id(0)
    s_id = pl.program_id(2)
    dense = meta_ref[pid, 0]
    half = meta_ref[pid, 1]
    n_slabs_l = meta_ref[pid, 2]
    scale = scale_ref[pid, 0]

    @pl.when(s_id == 0)
    def _index_math():
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (PARITIES, tile), 0)
        s0, s1, s2 = s_iota & 1, (s_iota >> 1) & 1, (s_iota >> 2) & 1
        x = pos_ref[0:1, :]
        y = pos_ref[1:2, :]
        z = pos_ref[2:3, :]
        lo, hi, w = _corner_index_math_dyn(x, y, z, scale, dense, half,
                                           num_steps, s0, s1, s2, hash_fn)
        lo_s[...] = lo
        hi_s[...] = hi
        w_s[...] = w
        out_ref[...] = jnp.zeros_like(out_ref)
        sl_of = hi >> slab_shift
        dead = pos_ref[3:4, :] if has_live else None
        if group_skip:
            words = _group_mask_words(sl_of, dead, n_slabs, tile)
            tile_word = words[0]
            for g, word in enumerate(words):
                gmask_s[g] = word
                if g:
                    tile_word = tile_word | word
            for sl in range(n_slabs):
                mask_s[sl] = (tile_word >> sl) & 1
        else:
            for sl in range(n_slabs):
                mask_s[sl] = jnp.max((sl_of == sl).astype(jnp.int32))

    @pl.when((s_id < n_slabs_l) & (mask_s[s_id] > 0))
    def _scan_slab():
        base = s_id * slab

        def scan_group(j):
            cols = slice(j * LANES, (j + 1) * LANES)
            lo = lo_s[:, cols]
            hi = hi_s[:, cols] - base     # in-slab step index
            w = w_s[:, cols]
            acc = jnp.zeros((PARITIES, LANES), jnp.float32)
            for u in range(slab):
                src = table_ref[0, u * PARITIES:(u + 1) * PARITIES, :]
                g = jnp.take_along_axis(src, lo, axis=1)
                acc = jnp.where(hi == u, g, acc)
            bits = pltpu.bitcast(acc, jnp.uint32)
            f0 = pltpu.bitcast(bits & jnp.uint32(0xFFFF0000), jnp.float32)
            f1 = pltpu.bitcast(bits << 16, jnp.float32)
            out_ref[0, 0:1, cols] += jnp.sum(f0 * w, axis=0, keepdims=True)
            out_ref[0, 1:2, cols] += jnp.sum(f1 * w, axis=0, keepdims=True)

        for j in range(tile // LANES):
            if group_skip:
                pl.when(((gmask_s[j] >> s_id) & 1) > 0)(
                    functools.partial(scan_group, j))
            else:
                scan_group(j)


def _fwd_call_v2(packed_table, positions_t, meta, scale, *, num_steps, tile,
                 hash_fn="reference", has_live: bool = False):
    pl_rows = packed_table.shape[0]
    n = positions_t.shape[1]
    slab = min(V2_SLAB, num_steps)
    n_slabs = max(num_steps // slab, 1)
    group_skip = _group_skip_enabled(n_slabs, tile, has_live)
    kern = functools.partial(_fwd_kernel_v2, num_steps=num_steps, tile=tile,
                             slab=slab, hash_fn=hash_fn,
                             group_skip=group_skip, has_live=has_live)
    return pl.pallas_call(
        kern,
        grid=(pl_rows, n // tile, num_steps // slab),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tile), lambda l, i, s: (0, i)),
            pl.BlockSpec((1, slab * PARITIES, LANES),
                         lambda l, i, s: (l, s, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, tile), lambda l, i, s: (l, 0, i)),
        out_shape=jax.ShapeDtypeStruct((pl_rows, 2, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((PARITIES, tile), jnp.int32),
            pltpu.VMEM((PARITIES, tile), jnp.int32),
            pltpu.VMEM((PARITIES, tile), jnp.float32),
            pltpu.SMEM((n_slabs,), jnp.int32),
            pltpu.SMEM((max(tile // LANES, 1),), jnp.int32),
        ],
    )(meta, scale, positions_t, packed_table)


def _bwd_kernel_v2(meta_ref, scale_ref, pos_ref, g_ref, gtab_ref, *,
                   num_steps: int, tile: int, hash_fn: str = "reference"):
    """Blocks: pos [8, tile], g [1, 2, tile] (internal [PL, 2, N]), gtab
    [1, 2, 8, num_steps, 128] f32 accumulated across the point-tile sweep.

    Scatter = chunked one-hot matmul: per step-chunk c and parity s,
    grad[t, m] = sum_j (hi==t) * (g*w) * (lo==m) — a [2F*CHUNK, nt] x
    [nt, 128] MXU contraction batched over the 8 parities.
    """
    chunk_rows = min(V2_BWD_CHUNK, num_steps)
    pid = pl.program_id(0)
    dense = meta_ref[pid, 0]
    half = meta_ref[pid, 1]
    n_chunks = meta_ref[pid, 3]
    scale = scale_ref[pid, 0]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        gtab_ref[...] = jnp.zeros_like(gtab_ref)

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (PARITIES, LANES), 0)
    s0, s1, s2 = s_iota & 1, (s_iota >> 1) & 1, (s_iota >> 2) & 1
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES, LANES), 2)
    chunk_iota = jax.lax.broadcasted_iota(
        jnp.int32, (1, chunk_rows, LANES), 1)

    n_sub = tile // LANES
    per_sub = []
    for j in range(n_sub):
        cols = slice(j * LANES, (j + 1) * LANES)
        x = pos_ref[0:1, cols]
        y = pos_ref[1:2, cols]
        z = pos_ref[2:3, cols]
        lo, hi, w = _corner_index_math_dyn(x, y, z, scale, dense, half,
                                           num_steps, s0, s1, s2, hash_fn)
        g0 = g_ref[0, 0:1, cols] * w   # [8, 128] cotangent * trilinear w
        g1 = g_ref[0, 1:2, cols] * w
        # oh_lo^T [8, nt, 128]: (lo == m) for the batched contraction.
        # bf16 one-hots are exact; the MXU runs them 2x faster than f32
        # (grads accumulate in f32 via preferred_element_type, and the
        # cotangent side matches tcnn's own fp16 gradient precision)
        oh_lo_t = (lo[:, :, None] == lane_iota).astype(jnp.bfloat16)
        per_sub.append((hi, g0.astype(jnp.bfloat16),
                        g1.astype(jnp.bfloat16), oh_lo_t))

    def chunk(b, _):
        base = b * chunk_rows
        acc = jnp.zeros((PARITIES, 2 * chunk_rows, LANES), jnp.float32)
        for hi, g0, g1, oh_lo_t in per_sub:
            # oh_hi [8, CHUNK, nt]
            oh_hi = (chunk_iota + base == hi[:, None, :]).astype(jnp.bfloat16)
            u = jnp.concatenate([oh_hi * g0[:, None, :],
                                 oh_hi * g1[:, None, :]], axis=1)
            acc = acc + jax.lax.dot_general(
                u, oh_lo_t, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        for s in range(PARITIES):
            for f in range(2):
                rows = acc[s, f * chunk_rows:(f + 1) * chunk_rows, :]
                cur = gtab_ref[0, f, s, pl.ds(base, chunk_rows), :]
                gtab_ref[0, f, s, pl.ds(base, chunk_rows), :] = cur + rows
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk, 0)


def _bwd_kernel_v4(ids_ref, meta_ref, scale_ref, pos_ref, g_ref, gtab_ref,
                   lo_s, hi_s, w_s, *, num_steps: int, num_levels: int,
                   n_tiles: int, n_slots: int, tile: int, chunk_rows: int,
                   hash_fn: str = "reference"):
    """_bwd_kernel_v2 with the chunk sweep indirected through prefetched
    touched-chunk ids (``_touched_slab_ids`` at ``chunk_rows``
    granularity): a point tile only pays the one-hot MXU scatter for
    chunks some corner of some point actually resolves to.  v2 sweeps
    EVERY chunk of every level past every tile — at 2^19 that is
    steps*points MACs, mostly multiplying zeros; with spatially-coherent
    tiles (``sort_points``) + the morton hash, a tile touches only its
    coarse region's chunks.  Random tiles degrade to exactly v2's cost.

    Grid (PL, tiles, n_slots); the k-th step scatters chunk
    ids[l, i, k], skipping padded repeats (same id as k-1).  gtab
    [1, 2, 8, steps, 128] is VMEM-resident per level row, accumulated
    across the (tiles, slots) sweep.
    """
    pid = pl.program_id(0)
    i_id = pl.program_id(1)
    k_id = pl.program_id(2)
    dense = meta_ref[pid, 0]
    half = meta_ref[pid, 1]
    scale = scale_ref[pid, 0]
    row = (pid % num_levels) * n_tiles + i_id
    sid = ids_ref[row * n_slots + k_id]

    @pl.when((i_id == 0) & (k_id == 0))
    def _init():
        gtab_ref[...] = jnp.zeros_like(gtab_ref)

    @pl.when((k_id == 0) & (sid >= 0))
    def _index_math():
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (PARITIES, tile), 0)
        s0, s1, s2 = s_iota & 1, (s_iota >> 1) & 1, (s_iota >> 2) & 1
        x = pos_ref[0:1, :]
        y = pos_ref[1:2, :]
        z = pos_ref[2:3, :]
        lo, hi, w = _corner_index_math_dyn(x, y, z, scale, dense, half,
                                           num_steps, s0, s1, s2, hash_fn)
        lo_s[...] = lo
        hi_s[...] = hi
        w_s[...] = w

    prev = ids_ref[row * n_slots + jnp.maximum(k_id - 1, 0)]

    @pl.when((sid >= 0) & ((k_id == 0) | (sid != prev)))
    def _scatter_chunk():
        base = sid * chunk_rows
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES, LANES), 2)
        chunk_iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, chunk_rows, LANES), 1)
        acc = jnp.zeros((PARITIES, 2 * chunk_rows, LANES), jnp.float32)
        for j in range(tile // LANES):
            cols = slice(j * LANES, (j + 1) * LANES)
            lo = lo_s[:, cols]
            hi = hi_s[:, cols]
            w = w_s[:, cols]
            g0 = (g_ref[0, 0:1, cols] * w).astype(jnp.bfloat16)
            g1 = (g_ref[0, 1:2, cols] * w).astype(jnp.bfloat16)
            oh_lo_t = (lo[:, :, None] == lane_iota).astype(jnp.bfloat16)
            oh_hi = (chunk_iota + base == hi[:, None, :]).astype(jnp.bfloat16)
            u = jnp.concatenate([oh_hi * g0[:, None, :],
                                 oh_hi * g1[:, None, :]], axis=1)
            acc = acc + jax.lax.dot_general(
                u, oh_lo_t, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        for s in range(PARITIES):
            for f in range(2):
                rows = acc[s, f * chunk_rows:(f + 1) * chunk_rows, :]
                cur = gtab_ref[0, f, s, pl.ds(base, chunk_rows), :]
                gtab_ref[0, f, s, pl.ds(base, chunk_rows), :] = cur + rows


def _bwd_call_v4(positions_t, g_internal, meta, scale, ids, *, pl_rows,
                 num_steps, num_levels, tile, hash_fn="reference"):
    """``ids`` from :func:`_touched_slab_ids` with slab=chunk granularity
    (min(V2_BWD_CHUNK, num_steps))."""
    n = positions_t.shape[1]
    chunk_rows = min(V2_BWD_CHUNK, num_steps)
    n_slots = max(num_steps // chunk_rows, 1)
    n_tiles = n // tile
    kern = functools.partial(_bwd_kernel_v4, num_steps=num_steps,
                             num_levels=num_levels, n_tiles=n_tiles,
                             n_slots=n_slots, tile=tile,
                             chunk_rows=chunk_rows, hash_fn=hash_fn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl_rows, n_tiles, n_slots),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tile), lambda l, i, k, ids: (0, i)),
            pl.BlockSpec((1, 2, tile), lambda l, i, k, ids: (l, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, 2, PARITIES, num_steps, LANES),
                               lambda l, i, k, ids: (l, 0, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((PARITIES, tile), jnp.int32),
            pltpu.VMEM((PARITIES, tile), jnp.int32),
            pltpu.VMEM((PARITIES, tile), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (pl_rows, 2, PARITIES, num_steps, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(ids, meta, scale, positions_t, g_internal)


def _bwd_call_v2(positions_t, g_internal, meta, scale, *, pl_rows, num_steps,
                 tile, hash_fn="reference"):
    n = positions_t.shape[1]
    kern = functools.partial(_bwd_kernel_v2, num_steps=num_steps, tile=tile,
                             hash_fn=hash_fn)
    return pl.pallas_call(
        kern,
        grid=(pl_rows, n // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tile), lambda l, i: (0, i)),
            pl.BlockSpec((1, 2, tile), lambda l, i: (l, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, 2, PARITIES, num_steps, LANES),
                               lambda l, i: (l, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (pl_rows, 2, PARITIES, num_steps, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(meta, scale, positions_t, g_internal)


def _internal_to_public(out_internal, num_packed, num_levels, n):
    """[PL, 2, N] kernel layout -> [N, (p*2+f)*L+l] public layout."""
    o = out_internal.reshape(num_packed, num_levels, 2, n)
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(num_packed * 2 * num_levels, n)
    return o.T


def _public_to_internal(g, num_packed, num_levels):
    """[N, (p*2+f)*L+l] cotangent -> [PL, 2, N]."""
    n = g.shape[0]
    o = g.T.reshape(num_packed, 2, num_levels, n)
    return jnp.transpose(o, (0, 2, 1, 3)).reshape(
        num_packed * num_levels, 2, n)


# --- v4: prefetch-gather kernels (touched slabs only) -------------------------
#
# v2 streams EVERY slab of every level past every point tile: the Mosaic
# pipeline prefetches the table block of each grid step whether or not the
# in-kernel mask skips its scan, so a coherent tile still pays the full
# table's DMA (at 2^19: 2 MB x levels x tiles).  v4 turns the slab axis of
# the grid into an indirection: the per-(level, tile) list of slabs the
# tile actually touches is computed OUTSIDE the kernel (cheap vectorized
# index math + per-tile reductions), sorted, padded by repeating the last
# touched id, and passed as a scalar-prefetch operand that the table
# BlockSpec's index map reads.  Untouched slabs are never fetched; padded
# steps repeat the previous block index, which the pipeline recognizes and
# skips, so they cost neither DMA nor VPU.  Random point sets degrade
# gracefully to exactly v2's behavior (every slab touched).


def _touched_slab_ids(pos_t, plan, num_steps: int, tile: int, slab: int,
                      hash_fn: str, q8: bool = False, live=None):
    """Per-(level, point-tile) sorted touched-slab lists.

    pos_t [8, N] (rows 0-2 = xyz in [0,1]) -> flat int32
    [(level*n_tiles + tile)*n_slabs + k], each row the ascending slab ids
    whose row-groups any corner of any point in the tile resolves to,
    padded to n_slabs by repeating the last touched id.  Must use the
    SAME index math as the kernel (bit-identical fp32 ops) so no touched
    slab is missed.  q8=True addresses the int8-packed layout (half
    row-groups).  ``live`` [N] (optional, 0/1): tiles with no live point
    get all-(-1) rows — the kernel skips them entirely (zeroed output,
    no index math, no scan); the block index map clamps -1 to 0.
    """
    n = pos_t.shape[1]
    n_tiles = n // tile
    steps_total = max(num_steps // 2, 1) if q8 else num_steps
    n_slabs = max(steps_total // slab, 1)
    shift = slab.bit_length() - 1
    x = pos_t[0:1, :]
    y = pos_t[1:2, :]
    z = pos_t[2:3, :]
    s_ids = jnp.arange(PARITIES, dtype=jnp.int32)[:, None]
    s0, s1, s2 = s_ids & 1, (s_ids >> 1) & 1, (s_ids >> 2) & 1
    iota = jnp.arange(n_slabs, dtype=jnp.int32)
    per_level = []
    with jax.named_scope("slab_ids"):
        for scale, dense, half in plan:
            if q8:
                _, hi, _ = _corner_index_math_q8(
                    x, y, z, jnp.float32(scale),
                    jnp.int32(1 if dense else 0),
                    jnp.int32(half), num_steps, s0, s1, s2, hash_fn)
            else:
                _, hi, _ = _corner_index_math(x, y, z, scale, dense, half,
                                              num_steps, s0, s1, s2, hash_fn)
            sl = (hi >> shift).reshape(PARITIES, n_tiles, tile)
            n_words = -(-n_slabs // 32)
            if n_words <= 8:
                # n_words passes: per-tile OR of one-hot slab bits,
                # 32 slab ids per uint32 word
                slu = sl.astype(jnp.uint32)
                words = []
                for wd in range(n_words):
                    bits = jnp.where((slu >> 5) == wd,
                                     jnp.uint32(1) << (slu & 31),
                                     jnp.uint32(0))
                    words.append(jax.lax.reduce(bits, jnp.uint32(0),
                                                jax.lax.bitwise_or, (0, 2)))
                word = jnp.stack(words, -1)        # [n_tiles, n_words]
                mask = ((word[:, iota // 32]
                         >> (iota % 32).astype(jnp.uint32)[None, :])
                        & 1).astype(bool)
            else:
                mask = jnp.stack(
                    [jnp.any(sl == s, axis=(0, 2))
                     for s in range(n_slabs)], -1)
            ids = jnp.sort(jnp.where(mask, iota[None], n_slabs), axis=-1)
            cnt = jnp.sum(mask, axis=-1).astype(jnp.int32)   # >= 1 always
            last = jnp.take_along_axis(ids,
                                       jnp.maximum(cnt - 1, 0)[:, None],
                                       axis=-1)
            per_level.append(
                jnp.where(iota[None, :] < cnt[:, None], ids, last))
        out = jnp.stack(per_level, 0).astype(jnp.int32)
        if live is not None:
            alive = jnp.max(live.reshape(n_tiles, tile), axis=1) > 0
            out = jnp.where(alive[None, :, None], out, -1)
    # FLAT [(level*n_tiles + tile)*n_slabs + k]: SMEM pads the minor dim
    # of multi-dim scalar-prefetch arrays to 128 lanes (a [L, T, K] i32
    # blows the 1 MB SMEM budget 16x); 1-D arrays stay unpadded
    return out.reshape(-1)


def _fwd_kernel_v4(ids_ref, meta_ref, scale_ref, pos_ref, table_ref, out_ref,
                   lo_s, hi_s, w_s, *, num_steps: int, num_levels: int,
                   n_tiles: int, n_slabs: int, tile: int, slab: int,
                   hash_fn: str = "reference"):
    """v2 with the slab grid axis indirected through ``ids_ref``
    (flat [(level*n_tiles + tile)*n_slabs + k], scalar prefetch; also
    consumed by the table BlockSpec index map).  Grid (PL, tiles,
    n_slabs); k-th step scans slab ids[l, i, k], skipping padded steps
    (same id as k-1)."""
    pid = pl.program_id(0)
    i_id = pl.program_id(1)
    k_id = pl.program_id(2)
    dense = meta_ref[pid, 0]
    half = meta_ref[pid, 1]
    scale = scale_ref[pid, 0]
    row = (pid % num_levels) * n_tiles + i_id
    sid = ids_ref[row * n_slabs + k_id]

    @pl.when(k_id == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    # sid == -1 marks a dead tile (no live point, see _touched_slab_ids):
    # skip index math AND every scan — the zeroed output is the contract.
    @pl.when((k_id == 0) & (sid >= 0))
    def _index_math():
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (PARITIES, tile), 0)
        s0, s1, s2 = s_iota & 1, (s_iota >> 1) & 1, (s_iota >> 2) & 1
        x = pos_ref[0:1, :]
        y = pos_ref[1:2, :]
        z = pos_ref[2:3, :]
        lo, hi, w = _corner_index_math_dyn(x, y, z, scale, dense, half,
                                           num_steps, s0, s1, s2, hash_fn)
        lo_s[...] = lo
        hi_s[...] = hi
        w_s[...] = w

    prev = ids_ref[row * n_slabs + jnp.maximum(k_id - 1, 0)]

    @pl.when((sid >= 0) & ((k_id == 0) | (sid != prev)))
    def _scan_slab():
        base = sid * slab
        for j in range(tile // LANES):
            cols = slice(j * LANES, (j + 1) * LANES)
            lo = lo_s[:, cols]
            hi = hi_s[:, cols] - base
            w = w_s[:, cols]
            acc = jnp.zeros((PARITIES, LANES), jnp.float32)
            for u in range(slab):
                src = table_ref[0, u * PARITIES:(u + 1) * PARITIES, :]
                g = jnp.take_along_axis(src, lo, axis=1)
                acc = jnp.where(hi == u, g, acc)
            bits = pltpu.bitcast(acc, jnp.uint32)
            f0 = pltpu.bitcast(bits & jnp.uint32(0xFFFF0000), jnp.float32)
            f1 = pltpu.bitcast(bits << 16, jnp.float32)
            out_ref[0, 0:1, cols] += jnp.sum(f0 * w, axis=0, keepdims=True)
            out_ref[0, 1:2, cols] += jnp.sum(f1 * w, axis=0, keepdims=True)


def _fwd_call_v4(packed_table, positions_t, meta, scale, ids, *, num_steps,
                 num_levels, tile, hash_fn="reference", slab: int = 0):
    """``ids`` must come from :func:`_touched_slab_ids` with the SAME
    ``slab`` granularity (0 = the default min(V2_SLAB, num_steps))."""
    pl_rows = packed_table.shape[0]
    n = positions_t.shape[1]
    slab = slab or min(V2_SLAB, num_steps)
    n_slabs = max(num_steps // slab, 1)
    n_tiles = n // tile
    kern = functools.partial(_fwd_kernel_v4, num_steps=num_steps,
                             num_levels=num_levels, n_tiles=n_tiles,
                             n_slabs=n_slabs, tile=tile, slab=slab,
                             hash_fn=hash_fn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl_rows, n_tiles, n_slabs),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tile), lambda l, i, k, ids: (0, i)),
            pl.BlockSpec(
                (1, slab * PARITIES, LANES),
                # max(id, 0): dead tiles carry -1 (kernel skips the scan,
                # but the pipeline still needs an in-bounds block index)
                lambda l, i, k, ids: (
                    l,
                    jnp.maximum(
                        ids[((l % num_levels) * n_tiles + i) * n_slabs + k],
                        0),
                    0)),
        ],
        out_specs=pl.BlockSpec((1, 2, tile), lambda l, i, k, ids: (l, 0, i)),
        scratch_shapes=[
            pltpu.VMEM((PARITIES, tile), jnp.int32),
            pltpu.VMEM((PARITIES, tile), jnp.int32),
            pltpu.VMEM((PARITIES, tile), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pl_rows, 2, n), jnp.float32),
    )(ids, meta, scale, positions_t, packed_table)


# --- int8 serving mode ----------------------------------------------------------
#
# Serve-time quantization: each (pack, level) table is symmetric-int8
# quantized with one scale, packed 2 entries x 2 features per f32 lane —
# HALF the scan row-groups of the bf16-pair layout, so the VPU-bound
# table scan (the serving bottleneck at 2^19) runs ~2x faster.  Training
# always uses the f32/bf16 path; q8 dequantizes on the fly from the same
# master parameter tables, so trained checkpoints serve unchanged.


def optimal_quant_scales(table: jax.Array, qbits: int = 8,
                         num_candidates: int = 12) -> jax.Array:
    """MSE-optimal symmetric quantization scale per (pack, level) row.

    The default max|.|/qmax scale is outlier-dominated: one large entry
    in a 2^19 table forces a coarse step for every other entry, which is
    where most of int4's frame-parity loss comes from.  This searches
    ``num_candidates`` clip fractions of the max scale and returns, per
    PL row, the one minimizing total quantization MSE (entries beyond
    the clip saturate).  Bake-time only (sequential over candidates, so
    peak memory stays one table copy); pass the result to
    :func:`quantize_parity_table` via ``scales=``."""
    qmax = 127 if qbits == 8 else 7
    base = jnp.maximum(jnp.max(jnp.abs(table), axis=(1, 2, 3)), 1e-12) / qmax
    fracs = jnp.linspace(1.0 / num_candidates, 1.0, num_candidates)

    def err(frac):
        s = (base * frac)[:, None, None, None]
        q = jnp.clip(jnp.round(table / s), -qmax, qmax)
        return jnp.sum((q * s - table) ** 2, axis=(1, 2, 3))

    errs = jax.lax.map(err, fracs)                    # [K, PL]
    return base * fracs[jnp.argmin(errs, axis=0)]


def quantize_parity_table(table: jax.Array, qbits: int = 8, scales=None):
    """[PL, steps*8, 128, 2] f32 master -> (packed [PL, ceil(steps/E)*8,
    128] f32-bitcast, scales [PL] f32) with E = 32 // (2 * qbits) entries
    per u32 lane.

    qbits=8: byte layout per u32 lane (half0.f0, half0.f1, half1.f0,
    half1.f1) — 2 entries/lane.  qbits=4: byte q of the u32 holds entry
    quarter q as (f0 in the low nibble, f1 in the high nibble) — 4
    entries/lane, HALF the q8 row-groups, so the VPU-bound slab scan runs
    ~2x faster again at a quantization-noise cost (A/B the frame parity
    before enabling).  ``scales``: per-PL-row scale override (e.g. from
    :func:`optimal_quant_scales`); default symmetric max|.|/qmax."""
    assert qbits in (8, 4)
    pl_rows, rows, _, _ = table.shape
    steps = rows // PARITIES
    epl = 2 if qbits == 8 else 4             # entries per u32 lane
    steps_q = max(-(-steps // epl), 1)
    qmax = 127 if qbits == 8 else 7
    if scales is None:
        scales = jnp.maximum(
            jnp.max(jnp.abs(table), axis=(1, 2, 3)), 1e-12) / qmax
    q = jnp.clip(jnp.round(table / scales[:, None, None, None]),
                 -qmax, qmax).astype(jnp.int32)
    # rows (8t+s) -> class-entry order e = t*128 + lane
    q = q.reshape(pl_rows, steps, PARITIES, LANES, 2)
    q = jnp.transpose(q, (0, 2, 1, 3, 4))            # [PL, 8, steps, 128, 2]
    q = q.reshape(pl_rows, PARITIES, steps * LANES, 2)
    pad = steps_q * epl * LANES - steps * LANES
    if pad:     # pad non-multiple step counts with zero entry blocks
        q = jnp.concatenate(
            [q, jnp.zeros((pl_rows, PARITIES, pad, 2), q.dtype)], axis=2)
    if qbits == 8:
        # [PL, 8, tq, lane, half, f]; e = tq*256 + lane*2 + half
        q = q.reshape(pl_rows, PARITIES, steps_q, LANES, 2, 2)
        b = (q & 0xFF).astype(jnp.uint32)
        u32 = (b[..., 0, 0] | (b[..., 0, 1] << 8)
               | (b[..., 1, 0] << 16) | (b[..., 1, 1] << 24))
    else:
        # [PL, 8, tq, lane, quarter, f]; e = tq*512 + lane*4 + quarter
        q = q.reshape(pl_rows, PARITIES, steps_q, LANES, 4, 2)
        nib = (q & 0xF).astype(jnp.uint32)
        byte = nib[..., 0] | (nib[..., 1] << 4)      # [.., lane, quarter]
        u32 = (byte[..., 0] | (byte[..., 1] << 8)
               | (byte[..., 2] << 16) | (byte[..., 3] << 24))
    u32 = jnp.transpose(u32, (0, 2, 1, 3))          # [PL, tq, 8, 128]
    u32 = u32.reshape(pl_rows, steps_q * PARITIES, LANES)
    return jax.lax.bitcast_convert_type(u32, jnp.float32), scales


def is_parity_table(leaf) -> bool:
    """True for a ParityHashEncoding master table leaf
    ([PL, steps*8, 128, 2] f32; see :func:`init_parity_table`)."""
    return (hasattr(leaf, "ndim") and leaf.ndim == 4
            and leaf.shape[-1] == 2 and leaf.shape[-2] == LANES
            and leaf.shape[-3] % PARITIES == 0)


def bake_quantized_tables(params, qbits=(8, 4), optimize: int = 12):
    """Pre-quantize every parity hash table in a params pytree (ONCE,
    at serve setup) instead of re-quantizing inside every jitted frame.

    For each dict containing a master ``table`` leaf (identified by the
    parity layout, :func:`is_parity_table`), adds sibling leaves
    ``qtable{b}`` / ``qscales{b}`` for each b in ``qbits`` —
    ``ParityHashEncoding`` and the fused serve kernels pick these up
    when present and skip the in-frame quantize + pack.  ``optimize``:
    number of clip-fraction candidates for the MSE-optimal scale search
    (:func:`optimal_quant_scales`; 0 = plain max-scale, which matches
    the in-frame quantization bit-for-bit).  Returns a new pytree;
    master tables are kept (training/live-mask fallbacks still work).
    """
    def walk(node):
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items()}
            t = node.get("table")
            if t is not None and is_parity_table(t):
                for b in qbits:
                    sc = (optimal_quant_scales(t, qbits=b,
                                               num_candidates=optimize)
                          if optimize else None)
                    pk, sc = quantize_parity_table(t, qbits=b, scales=sc)
                    out[f"qtable{b}"] = pk
                    out[f"qscales{b}"] = sc
            return out
        return node
    import flax
    was_frozen = isinstance(params, flax.core.FrozenDict)
    tree = flax.core.unfreeze(params) if was_frozen else params
    baked = walk(tree)
    return flax.core.freeze(baked) if was_frozen else baked


def _fwd_kernel_q8(meta_ref, scale_ref, pos_ref, table_ref, out_ref,
                   lo_s, hi_s, w_s, mask_s, gmask_s, *, num_steps: int,
                   tile: int, slab: int, n_slabs: int,
                   hash_fn: str = "reference", group_skip: bool = False,
                   has_live: bool = False, qbits: int = 8):
    """Quantized variant of _fwd_kernel_v2: same slab grid (incl. the
    per-tile and optional per-group slab-membership skips and dead-point
    flags in pos row 3), 1/2 (qbits=8) or 1/4 (qbits=4) the row-groups;
    the scan selects packed u32 lanes, the selected lane's byte (pair) is
    sign-extended and dequantized per slab."""
    slab_shift = slab.bit_length() - 1
    pid = pl.program_id(0)
    s_id = pl.program_id(2)
    dense = meta_ref[pid, 0]
    half = meta_ref[pid, 1]
    n_slabs_l = meta_ref[pid, 2]
    scale = scale_ref[pid, 0]
    qscale = scale_ref[pid, 1]

    @pl.when(s_id == 0)
    def _index_math():
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (PARITIES, tile), 0)
        s0, s1, s2 = s_iota & 1, (s_iota >> 1) & 1, (s_iota >> 2) & 1
        x = pos_ref[0:1, :]
        y = pos_ref[1:2, :]
        z = pos_ref[2:3, :]
        lo8, hi8, w = _corner_index_math_q(qbits)(
            x, y, z, scale, dense, half, num_steps, s0, s1, s2, hash_fn)
        lo_s[...] = lo8
        hi_s[...] = hi8
        w_s[...] = w
        out_ref[...] = jnp.zeros_like(out_ref)
        sl_of = hi8 >> slab_shift
        dead = pos_ref[3:4, :] if has_live else None
        if group_skip:
            words = _group_mask_words(sl_of, dead, n_slabs, tile)
            tile_word = words[0]
            for g, word in enumerate(words):
                gmask_s[g] = word
                if g:
                    tile_word = tile_word | word
            for sl in range(n_slabs):
                mask_s[sl] = (tile_word >> sl) & 1
        else:
            for sl in range(n_slabs):
                mask_s[sl] = jnp.max((sl_of == sl).astype(jnp.int32))

    @pl.when((s_id < n_slabs_l) & (mask_s[s_id] > 0))
    def _scan_slab():
        base = s_id * slab

        def scan_group(j):
            cols = slice(j * LANES, (j + 1) * LANES)
            lo = lo_s[:, cols] & (LANES - 1)
            sel = lo_s[:, cols] >> 8
            hi = hi_s[:, cols] - base
            w = w_s[:, cols]
            acc = jnp.zeros((PARITIES, LANES), jnp.float32)
            for u in range(slab):
                src = table_ref[0, u * PARITIES:(u + 1) * PARITIES, :]
                g = jnp.take_along_axis(src, lo, axis=1)
                acc = jnp.where(hi == u, g, acc)
            f0, f1 = _dequant_selected(acc, sel, qscale, qbits)
            out_ref[0, 0:1, cols] += jnp.sum(f0 * w, axis=0, keepdims=True)
            out_ref[0, 1:2, cols] += jnp.sum(f1 * w, axis=0, keepdims=True)

        for j in range(tile // LANES):
            if group_skip:
                pl.when(((gmask_s[j] >> s_id) & 1) > 0)(
                    functools.partial(scan_group, j))
            else:
                scan_group(j)


def _fwd_kernel_q8v4(ids_ref, meta_ref, scale_ref, pos_ref, table_ref,
                     out_ref, lo_s, hi_s, w_s, *, num_steps: int,
                     num_levels: int, n_tiles: int, n_slabs: int, tile: int,
                     slab: int, hash_fn: str = "reference"):
    """q8 variant of :func:`_fwd_kernel_v4`: prefetched touched-slab ids
    over the int8-packed layout (half the row-groups)."""
    pid = pl.program_id(0)
    i_id = pl.program_id(1)
    k_id = pl.program_id(2)
    dense = meta_ref[pid, 0]
    half = meta_ref[pid, 1]
    scale = scale_ref[pid, 0]
    qscale = scale_ref[pid, 1]
    row = (pid % num_levels) * n_tiles + i_id
    sid = ids_ref[row * n_slabs + k_id]

    @pl.when(k_id == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when((k_id == 0) & (sid >= 0))
    def _index_math():
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (PARITIES, tile), 0)
        s0, s1, s2 = s_iota & 1, (s_iota >> 1) & 1, (s_iota >> 2) & 1
        x = pos_ref[0:1, :]
        y = pos_ref[1:2, :]
        z = pos_ref[2:3, :]
        lo8, hi8, w = _corner_index_math_q8(x, y, z, scale, dense, half,
                                            num_steps, s0, s1, s2, hash_fn)
        lo_s[...] = lo8
        hi_s[...] = hi8
        w_s[...] = w

    prev = ids_ref[row * n_slabs + jnp.maximum(k_id - 1, 0)]

    @pl.when((sid >= 0) & ((k_id == 0) | (sid != prev)))
    def _scan_slab():
        base = sid * slab
        for j in range(tile // LANES):
            cols = slice(j * LANES, (j + 1) * LANES)
            lo = lo_s[:, cols] & (LANES - 1)
            halfbit = lo_s[:, cols] >> 8
            hi = hi_s[:, cols] - base
            w = w_s[:, cols]
            acc = jnp.zeros((PARITIES, LANES), jnp.float32)
            for u in range(slab):
                src = table_ref[0, u * PARITIES:(u + 1) * PARITIES, :]
                g = jnp.take_along_axis(src, lo, axis=1)
                acc = jnp.where(hi == u, g, acc)
            bits = pltpu.bitcast(acc, jnp.uint32)
            v16 = (bits >> (halfbit.astype(jnp.uint32) * 16)) \
                & jnp.uint32(0xFFFF)
            f0 = (((v16 & 0xFF) ^ 0x80).astype(jnp.int32) - 0x80) \
                .astype(jnp.float32) * qscale
            f1 = ((((v16 >> 8) & 0xFF) ^ 0x80).astype(jnp.int32) - 0x80) \
                .astype(jnp.float32) * qscale
            out_ref[0, 0:1, cols] += jnp.sum(f0 * w, axis=0, keepdims=True)
            out_ref[0, 1:2, cols] += jnp.sum(f1 * w, axis=0, keepdims=True)


def _plan_meta_q8(plan, num_steps: int, num_packed: int, scales,
                  qbits: int = 8):
    """Per-(pack, level) metadata for the quantized kernels: row-group
    counts on the (2048 entries at q8 / 4096 at q4)-per-group layout;
    scale_ref carries (level scale, quantization scale) pairs."""
    num_levels = len(plan)
    epl = 2 if qbits == 8 else 4
    steps_q = max(-(-num_steps // epl), 1)
    slab = min(min(V2_SLAB_SERVE, V2_SLAB), steps_q)
    meta = np.zeros((num_packed * num_levels, 4), np.int32)
    sc = np.zeros((num_packed * num_levels, 2), np.float32)
    for p in range(num_packed):
        for l, (s, dense, half) in enumerate(plan):
            entries = num_steps * LANES
            if dense:
                entries = min(entries, half ** 3)
            steps_lq = min(steps_q, -(-entries // (epl * LANES)))
            row = p * num_levels + l
            meta[row] = (1 if dense else 0, half, -(-steps_lq // slab), 0)
            sc[row, 0] = s
    meta_j = jnp.asarray(meta)
    sc_j = jnp.asarray(sc).at[:, 1].set(scales)
    return meta_j, sc_j, steps_q, slab


def parity_hash_encode_q8(packed_q8: jax.Array, scales: jax.Array,
                          positions: jax.Array, scalings,
                          num_steps: int,
                          hash_fn: str = "reference",
                          live=None, tile: int = 0,
                          qbits: int = 8) -> jax.Array:
    """Serve-time quantized hash encoding (no gradients).

    packed_q8/scales from :func:`quantize_parity_table` (``qbits`` must
    match its packing: 8 = int8 pairs, 4 = int4 nibbles);
    positions [N, 3] (N multiple of 128) -> [N, P*2*L] f32, same channel
    layout as :func:`parity_hash_encode`.  ``live`` [N] or [N, 1] 0/1
    (optional, qbits=8 only): kernel point-tiles whose points are ALL
    dead skip index math, table DMA and scanning entirely and output
    zeros; outputs at dead points are unspecified (callers gate on
    liveness downstream).
    """
    assert qbits == 8 or live is None, "live masks: q8 path only"
    plan = _level_plan(scalings, num_steps)
    num_levels = len(plan)
    pl_rows = packed_q8.shape[0]
    num_packed = pl_rows // num_levels
    n = positions.shape[0]
    meta, sc, steps8, slab = _plan_meta_q8(plan, num_steps, num_packed,
                                           jax.lax.stop_gradient(scales),
                                           qbits=qbits)
    if jax.default_backend() != "tpu":
        return _parity_hash_encode_q8_ref(packed_q8, scales, positions,
                                          scalings, num_steps, hash_fn,
                                          qbits=qbits)
    pos_t = jnp.zeros((8, n), jnp.float32).at[:3].set(positions.T)
    tile = tile or _pick_tile(n, 8192)
    n_slabs = max(steps8 // slab, 1)
    if live is not None:
        live = live.reshape(n)
    group_skip = _group_skip_enabled(n_slabs, tile, live is not None)
    if qbits == 4 or (_kernel_version() == "v2"
                      and (live is None or group_skip)):
        has_live = live is not None
        if has_live:
            # dead flags ride pos row 3 (>0 = dead); dead points
            # contribute no group-mask bits, so fully-dead groups skip
            # index math's slabs entirely and output zeros
            pos_t = pos_t.at[3].set(1.0 - live.astype(jnp.float32))
        kern = functools.partial(_fwd_kernel_q8, num_steps=num_steps,
                                 tile=tile, slab=slab, n_slabs=n_slabs,
                                 hash_fn=hash_fn, group_skip=group_skip,
                                 has_live=has_live, qbits=qbits)
        out = pl.pallas_call(
            kern,
            grid=(pl_rows, n // tile, n_slabs),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((8, tile), lambda l, i, s: (0, i)),
                pl.BlockSpec((1, slab * PARITIES, LANES),
                             lambda l, i, s: (l, s, 0)),
            ],
            out_specs=pl.BlockSpec((1, 2, tile), lambda l, i, s: (l, 0, i)),
            out_shape=jax.ShapeDtypeStruct((pl_rows, 2, n), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((PARITIES, tile), jnp.int32),
                pltpu.VMEM((PARITIES, tile), jnp.int32),
                pltpu.VMEM((PARITIES, tile), jnp.float32),
                pltpu.SMEM((n_slabs,), jnp.int32),
                pltpu.SMEM((max(tile // LANES, 1),), jnp.int32),
            ],
        )(meta, sc, pos_t, jax.lax.stop_gradient(packed_q8))
        return _internal_to_public(out, num_packed, num_levels, n)
    ids = _touched_slab_ids(pos_t, plan, num_steps, tile, slab, hash_fn,
                            q8=True, live=live)
    n_tiles = n // tile
    kern = functools.partial(_fwd_kernel_q8v4, num_steps=num_steps,
                             num_levels=num_levels, n_tiles=n_tiles,
                             n_slabs=n_slabs, tile=tile, slab=slab,
                             hash_fn=hash_fn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl_rows, n_tiles, n_slabs),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tile), lambda l, i, k, ids: (0, i)),
            pl.BlockSpec(
                (1, slab * PARITIES, LANES),
                lambda l, i, k, ids: (
                    l,
                    jnp.maximum(
                        ids[((l % num_levels) * n_tiles + i) * n_slabs + k],
                        0),
                    0)),
        ],
        out_specs=pl.BlockSpec((1, 2, tile), lambda l, i, k, ids: (l, 0, i)),
        scratch_shapes=[
            pltpu.VMEM((PARITIES, tile), jnp.int32),
            pltpu.VMEM((PARITIES, tile), jnp.int32),
            pltpu.VMEM((PARITIES, tile), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pl_rows, 2, n), jnp.float32),
    )(ids, meta, sc, pos_t, jax.lax.stop_gradient(packed_q8))
    return _internal_to_public(out, num_packed, num_levels, n)


def _parity_hash_encode_q8_ref(packed_q8, scales, positions, scalings,
                               num_steps, hash_fn="reference",
                               qbits: int = 8):
    """jnp reference for the quantized kernels (any backend): unpack
    bytes/nibbles, dequantize, same corner math."""
    plan = _level_plan(scalings, num_steps)
    num_levels = len(plan)
    pl_rows = packed_q8.shape[0]
    num_packed = pl_rows // num_levels
    u32 = jax.lax.bitcast_convert_type(packed_q8, jnp.uint32)
    x, y, z = positions[:, 0], positions[:, 1], positions[:, 2]
    s_ids = jnp.arange(PARITIES, dtype=jnp.int32)[:, None]
    s0, s1, s2 = s_ids & 1, (s_ids >> 1) & 1, (s_ids >> 2) & 1
    outs = []
    for p in range(num_packed):
        for f in range(2):
            for l, (scale, dense, half) in enumerate(plan):
                loq, hiq, w = _corner_index_math_q(qbits)(
                    x[None], y[None], z[None], jnp.float32(scale),
                    jnp.int32(1 if dense else 0), jnp.int32(half),
                    num_steps, s0, s1, s2, hash_fn)
                lane = loq & (LANES - 1)
                sel = (loq >> 8).astype(jnp.uint32)
                row = hiq * PARITIES + s_ids
                bits = u32[p * num_levels + l, row, lane]
                if qbits == 8:
                    v = (bits >> (sel * 16 + jnp.uint32(8 * f))) \
                        & jnp.uint32(0xFF)
                    val = ((v ^ 0x80).astype(jnp.int32) - 0x80)
                else:
                    v = (bits >> (sel * 8 + jnp.uint32(4 * f))) \
                        & jnp.uint32(0xF)
                    val = ((v ^ 0x8).astype(jnp.int32) - 0x8)
                val = val.astype(jnp.float32) * scales[p * num_levels + l]
                outs.append(jnp.sum(val * w, axis=0))
    return jnp.stack(outs, axis=-1)


# --- fused encode + MLP serving kernel ----------------------------------------
#
# At view time every hash encode feeds a 1-hidden-layer MLP
# (tinycudann's HashGrid -> FullyFusedMLP pairing, reference config at
# ``nerfstudio/fields/nerfacto_field.py:157-240`` / ``samnerf/sam_field.py:51-94``).
# Running the MLP as a separate XLA op costs the full [N, C] feature
# round-trip through HBM plus the [PL, 2, N] -> [N, C] layout transpose —
# pure bandwidth with zero FLOP value.  This kernel reorders the serve
# grid to (point tiles, levels, slabs) so one tile's COMPLETE feature
# vector accumulates in a VMEM scratch across the level sweep, then fires
# the MLP as an MXU epilogue on the last (level, slab) step and writes
# only the [O, tile] MLP output.  The encode features never touch HBM.
# Multiple pyramids with a shared table geometry (the SAM field's two
# concatenated grids, ``samnerf/sam_field.py:96-110``) stack along the
# level-row axis and fuse into the same epilogue.


def _fwd_kernel_qmlp(meta_ref, scale_ref, pos_ref, table_ref, w1_ref,
                     b1_ref, w2_ref, b2_ref, out_ref, lo_s, hi_s, w_s,
                     acc_s, acc2_s, mask_s, *, num_steps: int, pl_rows: int,
                     tile: int, slab: int, n_slabs: int, gcol: int,
                     hash_fn: str = "reference", qbits: int = 8):
    """Grid (tiles, PL, slabs) — the tile is the OUTER dimension so
    ``acc_s`` [C_pad, tile] holds the tile's full encode when the last
    grid step runs the MLP epilogue.  Blocks: meta [PL, 4] / scale
    [PL, 2] (SMEM), pos [8, tile], table [1, slab*8, 128] (the s-th slab
    of stacked level row l), w1 [H, C_pad] / b1 [H, 1] / w2 [O_pad, H] /
    b2 [O_pad, 1] (VMEM, constant), out [O_pad, tile] written only by the
    epilogue.  w1's columns are pre-permuted to the accumulator's row
    order (acc row 2*l + f for stacked level row l); C_pad/O_pad pad rows
    are zeroed/ignored.  Same per-tile touched-slab skip as
    :func:`_fwd_kernel_q8`."""
    slab_shift = slab.bit_length() - 1
    pid = pl.program_id(1)
    s_id = pl.program_id(2)
    dense = meta_ref[pid, 0]
    half = meta_ref[pid, 1]
    n_slabs_l = meta_ref[pid, 2]
    scale = scale_ref[pid, 0]
    qscale = scale_ref[pid, 1]

    @pl.when((pid == 0) & (s_id == 0))
    def _zero_acc():
        acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(s_id == 0)
    def _index_math():
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (PARITIES, tile), 0)
        s0, s1, s2 = s_iota & 1, (s_iota >> 1) & 1, (s_iota >> 2) & 1
        x = pos_ref[0:1, :]
        y = pos_ref[1:2, :]
        z = pos_ref[2:3, :]
        loq, hiq, w = _corner_index_math_q(qbits)(
            x, y, z, scale, dense, half, num_steps, s0, s1, s2, hash_fn)
        lo_s[...] = loq
        hi_s[...] = hiq
        w_s[...] = w
        acc2_s[...] = jnp.zeros_like(acc2_s)
        sl_of = hiq >> slab_shift
        for sl in range(n_slabs):
            mask_s[sl] = jnp.max((sl_of == sl).astype(jnp.int32))

    @pl.when((s_id < n_slabs_l) & (mask_s[s_id] > 0))
    def _scan_slab():
        base = s_id * slab

        def scan_group(j):
            cols = slice(j * LANES, (j + 1) * LANES)
            lo = lo_s[:, cols] & (LANES - 1)
            sel = lo_s[:, cols] >> 8
            hi = hi_s[:, cols] - base
            w = w_s[:, cols]
            acc = jnp.zeros((PARITIES, LANES), jnp.float32)
            for u in range(slab):
                src = table_ref[0, u * PARITIES:(u + 1) * PARITIES, :]
                g = jnp.take_along_axis(src, lo, axis=1)
                acc = jnp.where(hi == u, g, acc)
            f0, f1 = _dequant_selected(acc, sel, qscale, qbits)
            acc2_s[0:1, cols] += jnp.sum(f0 * w, axis=0, keepdims=True)
            acc2_s[1:2, cols] += jnp.sum(f1 * w, axis=0, keepdims=True)

        for j in range(tile // LANES):
            scan_group(j)

    @pl.when(s_id == n_slabs - 1)
    def _merge_rows():
        # Mosaic cannot vector-store at a dynamic sublane offset (row =
        # 2*pid is not provably 8-aligned), so the per-pid 2-row merge
        # into the [C_pad, tile] accumulator is a full-height masked add
        # — but only ONCE per (tile, pid), not per touched slab x group
        # like the pre-r4 kernel (the per-slab variant's masked adds
        # dominated and made fused serving slower than unfused).
        row = pid * 2
        c_pad = acc_s.shape[0]
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (c_pad, tile), 0)
        acc_s[...] += jnp.where(
            r_iota == row, acc2_s[0:1, :],
            jnp.where(r_iota == row + 1, acc2_s[1:2, :], 0.0))

    @pl.when((pid == pl_rows - 1) & (s_id == n_slabs - 1))
    def _mlp_epilogue():
        w1 = w1_ref[...]
        b1 = b1_ref[...]
        w2 = w2_ref[...]
        b2 = b2_ref[...]
        for g in range(tile // gcol):
            cols = slice(g * gcol, (g + 1) * gcol)
            h = jax.lax.dot_general(
                w1, acc_s[:, cols], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h = jnp.maximum(h + b1, 0.0)
            o = jax.lax.dot_general(
                w2, h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[:, cols] = o + b2


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def parity_hash_encode_qmlp(packed_list, scales_list, positions,
                            scalings_list, num_steps: int,
                            w1: jax.Array, b1: jax.Array,
                            w2: jax.Array, b2: jax.Array,
                            hash_fn: str = "reference", tile: int = 0,
                            qbits: int = 8) -> jax.Array:
    """Fused serve-time quantized hash encode + 1-hidden-layer MLP.

    Computes ``relu(enc @ w1 + b1) @ w2 + b2`` where ``enc`` [N, C] is
    the concatenation (pyramid-major) of the public-layout encodings of
    each (packed, scales, scalings) pyramid — all sharing ``num_steps``
    (same log2_hashmap_size).  w1 [C, H], b1 [H], w2 [H, O], b2 [O];
    returns [N, O] f32.  No gradients (serve only).
    """
    assert len(packed_list) == len(scales_list) == len(scalings_list)
    plans = [_level_plan(s, num_steps) for s in scalings_list]
    if jax.default_backend() != "tpu":
        enc = jnp.concatenate(
            [_parity_hash_encode_q8_ref(pk, sc, positions, s, num_steps,
                                        hash_fn, qbits=qbits)
             for pk, sc, s in zip(packed_list, scales_list, scalings_list)],
            axis=-1)
        return jnp.maximum(enc @ w1 + b1, 0.0) @ w2 + b2

    n = positions.shape[0]
    num_levels_i = [len(p) for p in plans]
    num_packed_i = [pk.shape[0] // L
                    for pk, L in zip(packed_list, num_levels_i)]
    pl_rows = sum(pk.shape[0] for pk in packed_list)

    # stacked per-row metadata (one _plan_meta_q8 per pyramid)
    metas, scs, slab = [], [], None
    for pk, sc_i, plan_i, P_i in zip(packed_list, scales_list, plans,
                                     num_packed_i):
        m, s, steps_q, slab = _plan_meta_q8(
            plan_i, num_steps, P_i, jax.lax.stop_gradient(sc_i),
            qbits=qbits)
        metas.append(m)
        scs.append(s)
    meta = jnp.concatenate(metas, axis=0)
    sc = jnp.concatenate(scs, axis=0)
    stacked = jnp.concatenate(
        [jax.lax.stop_gradient(pk) for pk in packed_list], axis=0)

    # public channel c of pyramid i = (p*2 + f)*L_i + l  ->  acc row
    # 2*(row_off_i + p*L_i + l) + f
    perm = []
    row_off = 0
    for L_i, P_i in zip(num_levels_i, num_packed_i):
        for p in range(P_i):
            for f in range(2):
                for l in range(L_i):
                    perm.append(2 * (row_off + p * L_i + l) + f)
        row_off += P_i * L_i
    c_tot = 2 * pl_rows
    h_dim = w1.shape[1]
    o_dim = w2.shape[1]
    c_pad = _round_up(c_tot, 8)
    o_pad = _round_up(o_dim, 8)
    w1k = jnp.zeros((h_dim, c_pad), jnp.float32).at[
        :, jnp.asarray(perm, jnp.int32)].set(w1.T.astype(jnp.float32))
    b1k = b1.reshape(h_dim, 1).astype(jnp.float32)
    w2k = jnp.zeros((o_pad, h_dim), jnp.float32).at[:o_dim].set(
        w2.T.astype(jnp.float32))
    b2k = jnp.zeros((o_pad, 1), jnp.float32).at[:o_dim].set(
        b2.reshape(o_dim, 1).astype(jnp.float32))

    pos_t = jnp.zeros((8, n), jnp.float32).at[:3].set(positions.T)
    tile = tile or _pick_tile(n, 8192)
    n_slabs = max(steps_q // slab, 1)
    gcol = min(tile, 2048)
    kern = functools.partial(
        _fwd_kernel_qmlp, num_steps=num_steps, pl_rows=pl_rows, tile=tile,
        slab=slab, n_slabs=n_slabs, gcol=gcol, hash_fn=hash_fn, qbits=qbits)
    out = pl.pallas_call(
        kern,
        grid=(n // tile, pl_rows, n_slabs),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tile), lambda i, l, s: (0, i)),
            pl.BlockSpec((1, slab * PARITIES, LANES),
                         lambda i, l, s: (l, s, 0)),
            pl.BlockSpec((h_dim, c_pad), lambda i, l, s: (0, 0)),
            pl.BlockSpec((h_dim, 1), lambda i, l, s: (0, 0)),
            pl.BlockSpec((o_pad, h_dim), lambda i, l, s: (0, 0)),
            pl.BlockSpec((o_pad, 1), lambda i, l, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((o_pad, tile), lambda i, l, s: (0, i)),
        out_shape=jax.ShapeDtypeStruct((o_pad, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((PARITIES, tile), jnp.int32),
            pltpu.VMEM((PARITIES, tile), jnp.int32),
            pltpu.VMEM((PARITIES, tile), jnp.float32),
            pltpu.VMEM((c_pad, tile), jnp.float32),
            pltpu.VMEM((PARITIES, tile), jnp.float32),  # acc2: rows 0/1 used
            pltpu.SMEM((n_slabs,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(meta, sc, pos_t, stacked, w1k, b1k, w2k, b2k)
    return out[:o_dim].T


# --- reference (pure jnp; identical semantics, any backend) -------------------


def parity_hash_encode_ref(table: jax.Array, positions: jax.Array,
                           scalings, num_steps: int,
                           hash_fn: str = "reference") -> jax.Array:
    """Pure-XLA reference. table [P*L, steps*8, 128, 2] fp32 (used at bf16
    precision, like the kernel), positions [N, 3] in [0,1] -> [N, P*2*L]."""
    plan = _level_plan(scalings, num_steps)
    num_levels = len(plan)
    num_packed = table.shape[0] // num_levels
    tq = table.astype(jnp.bfloat16).astype(jnp.float32)
    x, y, z = positions[:, 0], positions[:, 1], positions[:, 2]
    s_ids = jnp.arange(PARITIES, dtype=jnp.int32)[:, None]
    s0, s1, s2 = s_ids & 1, (s_ids >> 1) & 1, (s_ids >> 2) & 1
    per_level = []
    for scale, dense, half in plan:
        lo, hi, w = _corner_index_math(x[None], y[None], z[None], scale,
                                       dense, half, num_steps, s0, s1, s2,
                                       hash_fn)
        per_level.append((hi * PARITIES + s_ids, lo, w))
    outs = []
    for p in range(num_packed):
        for f in range(2):
            for l in range(num_levels):
                row, lo, w = per_level[l]
                vals = tq[p * num_levels + l, row, lo, f]   # [8, N]
                outs.append(jnp.sum(vals * w, axis=0))
    return jnp.stack(outs, axis=-1)


# --- public custom-vjp op -----------------------------------------------------


def _pick_tile(n: int, cap: int = 256) -> int:
    """Largest power-of-two tile <= cap dividing n (n is a multiple of 128).

    The table block has a trivial window (constant index map), so Mosaic
    keeps it VMEM-resident across grid steps — bigger tiles only grow the
    unrolled program (compile time), they don't save table DMA."""
    t = cap
    while t > LANES and n % t:
        t //= 2
    return t


def _use_v2(num_steps: int, pl_rows: int) -> bool:
    """v1 (whole table VMEM-resident, unrolled scan) up to 2^15-entry
    levels that fit VMEM together; the v2 streaming kernel beyond."""
    table_bytes = pl_rows * num_steps * PARITIES * LANES * 4
    return num_steps > 32 or table_bytes > 6 * 1024 * 1024


def _coherent_key(positions: jax.Array, bits: int = 8) -> jax.Array:
    """Morton (z-order) key of [N, 3] positions in [0,1]: bit order
    (x_hi, y_hi, z_hi, x, y, z, ...), matching ``_morton_mix``'s coarse
    region key so a key-sorted point stream places same-region points
    (= same table slabs under hash_fn="morton") contiguously."""
    def spread3(v):      # 8 significant bits -> every 3rd bit
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v
    q = jnp.clip(positions * float(1 << bits), 0.0,
                 float((1 << bits) - 1)).astype(jnp.uint32)
    key = ((spread3(q[:, 0]) << 2) | (spread3(q[:, 1]) << 1)
           | spread3(q[:, 2]))
    return key.astype(jnp.int32)


def coherent_perm(positions: jax.Array):
    """(perm, inv_perm) sorting positions by the coarse morton key."""
    n = positions.shape[0]
    perm = jnp.argsort(_coherent_key(positions))
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    return perm, inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def parity_hash_encode(table: jax.Array, positions: jax.Array,
                       scalings, num_steps: int,
                       tile: int = 0,
                       hash_fn: str = "reference",
                       sort_points: bool = False) -> jax.Array:
    """TPU hash encoding. table [P*L, steps*8, 128, 2] fp32,
    positions [N, 3] (N multiple of 128) -> [N, P*2*L] fp32.

    Channel c = (p*2+f)*L + l: feature-major within each packed pair.
    Uses the Pallas kernel on TPU, the jnp reference elsewhere.
    tile=0 auto-selects the grid tile.  hash_fn: "reference" (the primes
    XOR hash, ``encodings.py:289-306``) or "morton" (locality-preserving
    top bits: coherent tiles touch few table slabs and the kernel skips
    the rest; different collision structure — opt-in).

    sort_points=True (TPU only; exact, order-restored) sorts the point
    stream by the coarse morton key before the kernels: random training
    batches become spatially-coherent tiles, so the forward scan skips
    untouched slabs and the backward scatter (``_bwd_kernel_v4``) visits
    only touched chunks instead of sweeping the full table per tile.
    Pays one sort + two row-gathers per call; a win when num_steps is
    large (2^19 tables) and points are uniformly scattered.  Pair with
    hash_fn="morton" — under the reference hash, indices have no
    locality for the sort to expose.
    """
    if sort_points and jax.default_backend() == "tpu":
        out, _ = _sorted_fwd(table, positions, scalings, num_steps, tile,
                             hash_fn)
        return out
    return _fwd(table, positions, scalings, num_steps, tile, hash_fn)


def _sorted_fwd(table, positions, scalings, num_steps, tile, hash_fn):
    """Sort-encode-unsort; returns (out, (sorted positions, perm))."""
    perm, inv = coherent_perm(positions)
    pos_s = jnp.take(positions, perm, axis=0)
    out_s = _fwd(table, pos_s, scalings, num_steps, tile, hash_fn)
    return jnp.take(out_s, inv, axis=0), (pos_s, perm)


def _fwd(table, positions, scalings, num_steps, tile, hash_fn="reference",
         live=None):
    if jax.default_backend() != "tpu":
        return parity_hash_encode_ref(table, positions, scalings, num_steps,
                                      hash_fn)
    plan = _level_plan(scalings, num_steps)
    num_levels = len(plan)
    num_packed = table.shape[0] // num_levels
    n = positions.shape[0]
    pos_t = jnp.zeros((8, n), jnp.float32).at[:3].set(positions.T)
    if _use_v2(num_steps, table.shape[0]) or hash_fn != "reference":
        meta, scale = _plan_meta(plan, num_steps, num_packed)
        t = tile or _pick_tile(n, 8192)
        slab = min(V2_SLAB, num_steps)
        group_skip = _group_skip_enabled(max(num_steps // slab, 1), t,
                                         live is not None)
        if _kernel_version() == "v2" and (live is None or group_skip):
            has_live = live is not None
            if has_live:
                pos_t = pos_t.at[3].set(
                    1.0 - live.reshape(n).astype(jnp.float32))
            out = _fwd_call_v2(pack_table(table), pos_t, meta, scale,
                               num_steps=num_steps, tile=t, hash_fn=hash_fn,
                               has_live=has_live)
            return _internal_to_public(out, num_packed, num_levels, n)
        if live is not None:
            live = live.reshape(n)
        ids = _touched_slab_ids(pos_t, plan, num_steps, t, slab, hash_fn,
                                live=live)
        out = _fwd_call_v4(pack_table(table), pos_t, meta, scale, ids,
                           num_steps=num_steps, num_levels=num_levels,
                           tile=t, hash_fn=hash_fn)
        return _internal_to_public(out, num_packed, num_levels, n)
    out = _fwd_call(pack_table(table), pos_t, plan=plan, num_steps=num_steps,
                    num_packed=num_packed, num_levels=num_levels,
                    tile=tile or _pick_tile(n))
    return out.T


def parity_hash_encode_serve(table: jax.Array, positions: jax.Array,
                             scalings, num_steps: int, tile: int = 0,
                             hash_fn: str = "reference",
                             live=None) -> jax.Array:
    """f32 serve-path encode with dead-tile skipping (no gradients).

    Same results as :func:`parity_hash_encode` at live points; kernel
    tiles whose points are all dead (``live`` 0/1, [N] or [N, 1]) are
    skipped outright and output zeros.  Use for occupancy-culled
    serving when int8 quantization is off.
    """
    return _fwd(jax.lax.stop_gradient(table), positions, scalings,
                num_steps, tile, hash_fn, live=live)


def _fwd_rule(table, positions, scalings, num_steps, tile,
              hash_fn="reference", sort_points=False):
    if sort_points and jax.default_backend() == "tpu":
        out, res = _sorted_fwd(table, positions, scalings, num_steps, tile,
                               hash_fn)
        return out, res
    return _fwd(table, positions, scalings, num_steps, tile,
                hash_fn), (positions, None)


def _bwd_rule(scalings, num_steps, tile, hash_fn, sort_points, res, g):
    positions, perm = res
    plan = _level_plan(scalings, num_steps)
    num_levels = len(plan)
    num_packed = g.shape[-1] // (2 * num_levels)
    n = positions.shape[0]
    gl = num_packed * num_levels
    if jax.default_backend() != "tpu":
        shape = (gl, num_steps * PARITIES, LANES, 2)
        _, vjp = jax.vjp(
            lambda t: parity_hash_encode_ref(t, positions, scalings,
                                             num_steps, hash_fn),
            jnp.zeros(shape, jnp.float32))
        return vjp(g)[0], jnp.zeros_like(positions)
    if perm is not None:
        # positions are the SORTED stream; align the cotangent with it.
        # The table gradient is point-order-invariant, so no unsort.
        g = jnp.take(g, perm, axis=0)
    pos_t = jnp.zeros((8, n), jnp.float32).at[:3].set(positions.T)
    if _use_v2(num_steps, gl) or hash_fn != "reference":
        meta, scale = _plan_meta(plan, num_steps, num_packed)
        g_int = _public_to_internal(g, num_packed, num_levels)
        t = tile or _pick_tile(n, 8192)
        if perm is not None:
            # coherent tiles: scatter only the touched chunks (bwd v4)
            chunk = min(V2_BWD_CHUNK, num_steps)
            ids = _touched_slab_ids(pos_t, plan, num_steps, t, chunk,
                                    hash_fn)
            gtab = _bwd_call_v4(pos_t, g_int, meta, scale, ids, pl_rows=gl,
                                num_steps=num_steps, num_levels=num_levels,
                                tile=t, hash_fn=hash_fn)
        else:
            gtab = _bwd_call_v2(pos_t, g_int, meta, scale, pl_rows=gl,
                                num_steps=num_steps, tile=t,
                                hash_fn=hash_fn)
        # [gl, 2, 8, steps, 128] parity-major -> [gl, steps*8, 128, 2]
        gtab = jnp.moveaxis(gtab, 1, -1)      # [gl, 8, steps, 128, 2]
        gtab = jnp.swapaxes(gtab, 1, 2)       # [gl, steps, 8, 128, 2]
        gtab = gtab.reshape(gl, num_steps * PARITIES, LANES, 2)
        return gtab, jnp.zeros_like(positions)
    gtab = _bwd_call(pos_t, g.T, plan=plan, num_steps=num_steps,
                     num_packed=num_packed, num_levels=num_levels,
                     tile=tile or _pick_tile(n))
    # [2, gl, 8, steps, 128] parity-major -> table layout
    # [gl, steps*8, 128, 2] (row 8t+s belongs to parity class s)
    gtab = jnp.moveaxis(gtab, 0, -1)          # [gl, 8, steps, 128, 2]
    gtab = jnp.swapaxes(gtab, 1, 2)           # [gl, steps, 8, 128, 2]
    gtab = gtab.reshape(gl, num_steps * PARITIES, LANES, 2)
    return gtab, jnp.zeros_like(positions)


parity_hash_encode.defvjp(_fwd_rule, _bwd_rule)


def init_parity_table(key: jax.Array, num_levels: int, num_steps: int,
                      num_packed: int = 1, scale: float = 1e-4) -> jax.Array:
    """Uniform(-scale, scale) init (tcnn default, ``encodings.py:300``)."""
    shape = (num_packed * num_levels, num_steps * PARITIES, LANES, 2)
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)
