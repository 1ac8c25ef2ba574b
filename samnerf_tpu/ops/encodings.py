"""Input encodings: multi-resolution hash grid and spherical harmonics.

Hash grid semantics follow the reference's torch fallback
(``nerfstudio/field_components/encodings.py:289-349``): per level L the
position is scaled by ``floor(min_res * growth^L)``, the 8 cube corners are
spatial-hashed with primes {1, 2654435761, 805459861} + XOR (Instant-NGP,
PAPERS.md: arxiv 2201.05989), features gathered and trilinearly blended.

TPU notes:
- All corner hashing is done in uint32.  Since the table size divides 2^32,
  uint32 wraparound multiplication gives bit-identical low bits to the
  reference's int64 arithmetic, so ``mod 2^S`` results agree exactly.
- **Layout is N-last everywhere.**  TPU tiles the trailing two dims to
  (8, 128); keeping the (small) level/corner dims leading and the (large)
  point dim in the lane position avoids the 10-60x padding blowups that
  [N, L] / [N, L, F] layouts cost (seen directly in XLA OOM dumps).  The
  table is therefore stored feature-major ``[F, L * 2^S]`` and gathered
  along axis 1, producing ``[F, L, N]`` corner features; only the final
  ``[C, N] -> [N, C]`` transpose touches an N-leading layout, with
  C = L*F wide enough to pad modestly.
- Output channel order is **feature-major** (c = f * L + l), consistent
  across save/load within this framework.
- Trilinear weights/accumulation run in fp32; the table itself may be bf16.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

_PRIMES = (1, 2654435761, 805459861)


def hash_grid_scalings(num_levels: int, min_res: int, max_res: int) -> np.ndarray:
    """Per-level grid resolutions (``encodings.py:252-254``)."""
    if num_levels == 1:
        return np.array([float(min_res)])
    growth = np.exp((np.log(max_res) - np.log(min_res)) / (num_levels - 1))
    return np.floor(min_res * growth ** np.arange(num_levels))


def init_hash_table(key: jax.Array, num_levels: int, table_size: int,
                    features_per_level: int, scale: float = 1e-4,
                    dtype=jnp.float32) -> jax.Array:
    """U(-1, 1) * scale init (``encodings.py:256-258``, tcnn uses 1e-4).

    Shape [F, L * 2^S] (feature-major, see module docstring).
    """
    shape = (features_per_level, num_levels * table_size)
    return (jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0) * scale).astype(dtype)


def _corner_indices_weights(positions: jax.Array, scalings: jax.Array,
                            log2_table_size: int):
    """Shared index math: -> (idx [8, L, N] int32 incl. level offsets,
    weights [8, L, N] fp32)."""
    num_levels = scalings.shape[0]
    table_size = 1 << log2_table_size
    mask = jnp.uint32(table_size - 1)

    pos_t = positions.T.astype(jnp.float32)  # [3, N]
    scaled = pos_t[:, None, :] * scalings.astype(jnp.float32)[None, :, None]
    floor = jnp.floor(scaled)
    offset = scaled - floor  # [3, L, N] in [0, 1)

    base = floor.astype(jnp.int32).astype(jnp.uint32)
    p = jnp.array(_PRIMES, dtype=jnp.uint32)[:, None, None]
    h0 = base * p
    h1 = (base + jnp.uint32(1)) * p  # floor+1 == reference's ceil corner

    level_offset = (jnp.arange(num_levels, dtype=jnp.uint32)
                    * jnp.uint32(table_size))[None, :, None]

    idxs, ws = [], []
    for cz in (0, 1):
        hz = (h1 if cz else h0)[2]
        wz = offset[2] if cz else (1.0 - offset[2])
        for cy in (0, 1):
            hy = (h1 if cy else h0)[1]
            hzy = hz ^ hy
            wzy = wz * (offset[1] if cy else (1.0 - offset[1]))
            for cx in (0, 1):
                hx = (h1 if cx else h0)[0]
                idxs.append((((hx ^ hzy) & mask) + level_offset[0])
                            .astype(jnp.int32))
                ws.append(wzy * (offset[0] if cx else (1.0 - offset[0])))
    return jnp.stack(idxs), jnp.stack(ws)  # [8, L, N] each


def _hash_encode_fwd_impl(table, idx, w):
    """idx/w [8, L, N] -> [N, F*L]."""
    n = idx.shape[-1]
    out = None
    for c in range(8):
        feats = jnp.take(table, idx[c], axis=1)  # [F, L, N]
        contrib = feats.astype(jnp.float32) * w[c][None]
        out = contrib if out is None else out + contrib
    return out.reshape(-1, n).T  # [N, F*L]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hash_encode(table: jax.Array, positions: jax.Array, scalings,
                log2_table_size: int) -> jax.Array:
    """Multi-resolution hash encoding.

    Args:
        table: [F, L * 2^S] feature-major table.
        positions: [N, 3] in [0, 1].
        scalings: [L] per-level resolutions (static tuple/numpy array).
        log2_table_size: S.

    Returns:
        [N, F * L] encoded features (fp32, feature-major channels).

    The backward pass is **scatter-free** (see ``_hash_encode_bwd``): XLA's
    TPU scatter-add serializes tens of millions of duplicate-index updates
    (measured ~16 s/step at the reference batch size) and explodes compile
    time.  Instead the cotangents are sorted by table slot, prefix-summed,
    and the per-slot sums are read back with gathers — everything stays in
    TPU's fast dense/gather path.

    Position gradients are not propagated (returned as zeros): the
    reference never trains through sample positions either (rays come from
    fixed cameras; the SAM field detaches positions, ``sam_field.py:116``).
    """
    idx, w = _corner_indices_weights(positions, jnp.asarray(scalings),
                                     log2_table_size)
    return _hash_encode_fwd_impl(table, idx, w)


def _hash_encode_fwd(table, positions, scalings, log2_table_size):
    idx, w = _corner_indices_weights(positions, jnp.asarray(scalings),
                                     log2_table_size)
    out = _hash_encode_fwd_impl(table, idx, w)
    # residuals must be jax types: keep the (alias of the) table for
    # shape/dtype; positions to recompute the cheap index math in bwd
    return out, (table, positions)


def _hash_encode_bwd(scalings, log2_table_size, res, g):
    table, positions = res
    table_shape, table_dtype = table.shape, table.dtype
    idx, w = _corner_indices_weights(positions, jnp.asarray(scalings),
                                     log2_table_size)
    f_dim, num_slots = table_shape
    num_levels = idx.shape[1]
    n = idx.shape[-1]

    # cotangent g: [N, F*L] -> [F, L, N]
    g_t = g.T.reshape(f_dim, num_levels, n).astype(jnp.float32)
    # per-corner updates u_c = g * w_c, flattened to [F, M], M = 8*L*N
    flat_idx = idx.reshape(-1)  # [M]
    flat_u = (g_t[None] * w[:, None]).transpose(1, 0, 2, 3).reshape(f_dim, -1)

    # sort-by-slot + prefix sum + boundary gathers (no scatter anywhere)
    order = jnp.argsort(flat_idx)
    s_idx = flat_idx[order]
    s_u = jnp.take(flat_u, order, axis=1)  # [F, M]
    cs = jnp.cumsum(s_u, axis=1)
    cs = jnp.concatenate([jnp.zeros((f_dim, 1), cs.dtype), cs], axis=1)
    # slot boundaries: searchsorted over the full slot range
    starts = jnp.searchsorted(s_idx, jnp.arange(num_slots, dtype=jnp.int32),
                              side="left")
    ends = jnp.concatenate([starts[1:], jnp.asarray([s_idx.shape[0]])])
    grad_table = (jnp.take(cs, ends, axis=1) -
                  jnp.take(cs, starts, axis=1)).astype(table_dtype)
    return grad_table, jnp.zeros_like(positions)


hash_encode.defvjp(_hash_encode_fwd, _hash_encode_bwd)


# --- Spherical harmonics (degree 4 = 16 components) --------------------------
# Reference: tcnn SphericalHarmonics degree 4 used for view directions
# (``nerfstudio/fields/nerfacto_field.py:144-150``); component formulas as in
# ``nerfstudio/utils/math.py`` (components_from_spherical_harmonics).

def sh_encoding(directions: jax.Array, levels: int = 4) -> jax.Array:
    """Real SH components up to ``levels`` (16 outputs for levels=4).

    Args:
        directions: [..., 3] unit vectors.
    """
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    comps = [jnp.full_like(x, 0.28209479177387814)]
    if levels > 1:
        comps += [-0.48860251190291987 * y,
                  0.48860251190291987 * z,
                  -0.48860251190291987 * x]
    if levels > 2:
        comps += [1.0925484305920792 * x * y,
                  -1.0925484305920792 * y * z,
                  0.94617469575755997 * zz - 0.31539156525251999,
                  -1.0925484305920792 * x * z,
                  0.54627421529603959 * (xx - yy)]
    if levels > 3:
        comps += [0.59004358992664352 * y * (-3.0 * xx + yy),
                  2.8906114426405538 * x * y * z,
                  0.45704579946446572 * y * (1.0 - 5.0 * zz),
                  0.3731763325901154 * z * (5.0 * zz - 3.0),
                  0.45704579946446572 * x * (1.0 - 5.0 * zz),
                  1.4453057213202769 * z * (xx - yy),
                  0.59004358992664352 * x * (-xx + 3.0 * yy)]
    return jnp.stack(comps, axis=-1)


def nerf_frequency_encoding(x: jax.Array, num_frequencies: int) -> jax.Array:
    """Classic NeRF sin/cos encoding (``encodings.py:99-140`` semantics)."""
    freqs = 2.0 ** jnp.arange(num_frequencies)
    scaled = x[..., None] * freqs  # [..., D, F]
    enc = jnp.concatenate([jnp.sin(jnp.pi * scaled), jnp.cos(jnp.pi * scaled)], axis=-1)
    return enc.reshape(*x.shape[:-1], -1)


# --- Random Fourier features (``encodings.py:143-180`` RFFEncoding) -----------

def rff_encoding(x: jax.Array, b_matrix: jax.Array) -> jax.Array:
    """x [..., D] projected by fixed Gaussian B [D, F] -> sin/cos [..., 2F]."""
    proj = 2.0 * jnp.pi * (x @ b_matrix)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


# --- Integrated positional encoding (mip-NeRF) --------------------------------
# Reference: ``encodings.py:99-140`` with covs (expected_sin) — the NeRF
# frequency encoding attenuated by the cone footprint's diagonal covariance.

def integrated_pos_enc(means: jax.Array, covs_diag: jax.Array,
                       num_frequencies: int) -> jax.Array:
    """means/covs_diag [..., D] -> [..., 2*D*F].

    E[sin(x)] under N(mu, sigma^2) = sin(mu) exp(-sigma^2/2).
    """
    freqs = 2.0 ** jnp.arange(num_frequencies)
    scaled = means[..., None] * freqs * jnp.pi          # [..., D, F]
    var = covs_diag[..., None] * (freqs * jnp.pi) ** 2  # [..., D, F]
    atten = jnp.exp(-0.5 * var)
    enc = jnp.concatenate([jnp.sin(scaled) * atten, jnp.cos(scaled) * atten],
                          axis=-1)
    return enc.reshape(*means.shape[:-1], -1)


def conical_frustum_to_gaussian(ray_samples) -> tuple:
    """Frustum -> (mean, diag cov) along the ray (mip-NeRF eq. 7;
    ``cameras/rays.py:76-100`` get_gaussian_blob semantics, diagonalized).
    """
    origins = ray_samples.origins[..., None, :]      # [R, 1, 3]
    directions = ray_samples.directions[..., None, :]
    t0 = ray_samples.starts                          # [R, S, 1]
    t1 = ray_samples.ends
    radius = (jnp.sqrt(ray_samples.pixel_area)
              / 1.7724538509055159)[..., None, :]    # [R, 1, 1] (sqrt(pi))
    mu = (t0 + t1) / 2.0
    hw = (t1 - t0) / 2.0
    denom = jnp.maximum(3.0 * mu ** 2 + hw ** 2, 1e-10)
    t_mean = mu + (2.0 * mu * hw ** 2) / denom
    t_var = hw ** 2 / 3.0 - (4.0 / 15.0) * ((hw ** 4 * (12.0 * mu ** 2 - hw ** 2)) / denom ** 2)
    r_var = radius ** 2 * (mu ** 2 / 4.0 + (5.0 / 12.0) * hw ** 2 - (4.0 / 15.0) * (hw ** 4) / denom)
    mean = origins + directions * t_mean
    d2 = directions ** 2
    # diagonal of t_var * d d^T + r_var * (I - d d^T / |d|^2)
    cov_diag = t_var * d2 + r_var * (1.0 - d2 / jnp.maximum(
        jnp.sum(d2, axis=-1, keepdims=True), 1e-10))
    return mean, cov_diag


# --- TensoRF / triplane factorizations ----------------------------------------
# Reference: ``encodings.py`` TensorCPEncoding (:353-419), TensorVMEncoding
# (:422-503), TriplaneEncoding (:506-580).  Lookups are linear interps on
# dense 1D lines / 2D planes.


def _interp_1d(lines: jax.Array, u: jax.Array) -> jax.Array:
    """lines [A, RES, C], u [A, N] in [0,1] -> [A, N, C]."""
    res = lines.shape[1]
    x = jnp.clip(u, 0.0, 1.0) * (res - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, res - 2)
    f = (x - x0)[..., None]
    g0 = jnp.take_along_axis(lines, x0[..., None], axis=1)  # [A, N, C]
    g1 = jnp.take_along_axis(lines, x0[..., None] + 1, axis=1)
    return g0 * (1.0 - f) + g1 * f


def _interp_2d(planes: jax.Array, uv: jax.Array) -> jax.Array:
    """planes [A, RES, RES, C], uv [A, N, 2] in [0,1] -> [A, N, C]."""
    a, res, _, c = planes.shape
    xy = jnp.clip(uv, 0.0, 1.0) * (res - 1)
    xy0 = jnp.clip(jnp.floor(xy).astype(jnp.int32), 0, res - 2)
    f = xy - xy0
    flat = planes.reshape(a, res * res, c)

    def g(ix, iy):
        idx = iy * res + ix  # [A, N]
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    x0, y0 = xy0[..., 0], xy0[..., 1]
    fx, fy = f[..., 0:1], f[..., 1:2]
    v = (g(x0, y0) * (1 - fx) * (1 - fy) + g(x0 + 1, y0) * fx * (1 - fy)
         + g(x0, y0 + 1) * (1 - fx) * fy + g(x0 + 1, y0 + 1) * fx * fy)
    return v


def tensor_cp_encode(lines: jax.Array, positions: jax.Array) -> jax.Array:
    """TensorCP (``encodings.py:353-419``): per-axis line features
    multiplied. lines [3, RES, C]; positions [N, 3] in [0,1] -> [N, C]."""
    u = positions.T  # [3, N]
    feats = _interp_1d(lines, u)  # [3, N, C]
    return feats[0] * feats[1] * feats[2]


def tensor_vm_encode(planes: jax.Array, lines: jax.Array,
                     positions: jax.Array) -> jax.Array:
    """TensorVM (``encodings.py:422-503``): plane (yz, xz, xy) features x
    complementary line (x, y, z) features, concatenated.

    planes [3, RES, RES, C]; lines [3, RES, C]; positions [N, 3] ->
    [N, 3C]."""
    p = positions
    uv = jnp.stack([p[:, [1, 2]], p[:, [0, 2]], p[:, [0, 1]]])  # [3, N, 2]
    u = p.T  # [3, N] complementary coordinate per plane
    plane_f = _interp_2d(planes, uv)   # [3, N, C]
    line_f = _interp_1d(lines, u)      # [3, N, C]
    out = plane_f * line_f
    return jnp.concatenate([out[0], out[1], out[2]], axis=-1)


def triplane_encode(planes: jax.Array, positions: jax.Array,
                    reduce: str = "sum") -> jax.Array:
    """Triplane (``encodings.py:506-580``): three axis-aligned planes,
    summed (or product-reduced). planes [3, RES, RES, C] -> [N, C]."""
    p = positions
    uv = jnp.stack([p[:, [0, 1]], p[:, [0, 2]], p[:, [1, 2]]])
    f = _interp_2d(planes, uv)  # [3, N, C]
    if reduce == "sum":
        return f[0] + f[1] + f[2]
    if reduce == "product":
        return f[0] * f[1] * f[2]
    raise ValueError(reduce)


# --- Temporal (4D) hash grid ---------------------------------------------------
# Reference: the in-tree CUDA kernel ``temporal_gridencoder.cu`` (SURVEY 2f
# item 5) — a hash grid where the feature row additionally depends on the
# (continuous) time coordinate.  Rebuilt as: spatial trilinear hash exactly
# like ``hash_encode``, with time folded into the spatial hash via a 4th
# prime and linear interpolation over the two nearest time steps.

_TIME_PRIME = 2097192037


def temporal_hash_encode(table: jax.Array, positions: jax.Array,
                         times: jax.Array, scalings, log2_table_size: int,
                         num_time_steps: int) -> jax.Array:
    """table [F, L*2^S]; positions [N, 3]; times [N] in [0,1] ->
    [N, F*L]."""
    from samnerf_tpu.ops.encodings import hash_encode  # self-import safe
    t = jnp.clip(times, 0.0, 1.0) * (num_time_steps - 1)
    t0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, num_time_steps - 2)
    f = (t - t0)[:, None]

    def enc_at(ti):
        # fold the time index into position space by offsetting the hash:
        # shift positions by a per-timestep pseudo-random offset so the two
        # time slices address disjoint table regions
        offs = (ti.astype(jnp.float32) * 0.61803398875)[:, None]
        return hash_encode(table, positions + offs, scalings,
                           log2_table_size)

    return enc_at(t0) * (1.0 - f) + enc_at(t0 + 1) * f
