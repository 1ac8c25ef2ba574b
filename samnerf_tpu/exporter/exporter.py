"""Geometry export from trained pipelines.

Reference: ``nerfstudio/exporter/*`` + ``scripts/exporter.py:35-326``
(point cloud / TSDF / poisson / texture).  The reference leans on
open3d/pymeshlab, which are unavailable here; everything below is
self-contained:

- point clouds: rendered depth back-projection, binary PLY writer;
- TSDF fusion: dense voxel grid integrated in jnp (one jit per view);
- mesh extraction: marching *tetrahedra* (6 tets/cube) — table-free and
  watertight, standing in for open3d's marching cubes;
- poisson reconstruction: dense-grid screened Poisson solved with
  conjugate gradients in jnp (open3d's octree FEM redesigned for dense
  TPU tensors; resolution-bounded) + the same marching-tetrahedra
  extraction.
"""
from __future__ import annotations

import struct
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


# --- PLY / OBJ writers ---------------------------------------------------------


def export_ply(path: Path, points: np.ndarray,
               colors: Optional[np.ndarray] = None,
               normals: Optional[np.ndarray] = None) -> None:
    """Binary little-endian PLY (same layout open3d writes)."""
    n = points.shape[0]
    props = ["property float x", "property float y", "property float z"]
    if normals is not None:
        props += ["property float nx", "property float ny",
                  "property float nz"]
    if colors is not None:
        props += ["property uchar red", "property uchar green",
                  "property uchar blue"]
    header = "\n".join([
        "ply", "format binary_little_endian 1.0",
        f"element vertex {n}", *props, "end_header", ""])
    with open(path, "wb") as f:
        f.write(header.encode())
        for i in range(n):
            f.write(struct.pack("<3f", *points[i].astype(np.float32)))
            if normals is not None:
                f.write(struct.pack("<3f", *normals[i].astype(np.float32)))
            if colors is not None:
                c = np.clip(colors[i] * 255, 0, 255).astype(np.uint8)
                f.write(struct.pack("<3B", *c))


def export_obj(path: Path, vertices: np.ndarray, faces: np.ndarray,
               vertex_colors: Optional[np.ndarray] = None) -> None:
    with open(path, "w") as f:
        for i, v in enumerate(vertices):
            if vertex_colors is not None:
                c = vertex_colors[i]
                f.write(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
            else:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for tri in faces + 1:  # OBJ is 1-indexed
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")


# --- Point cloud from rendered views -------------------------------------------


def backproject_depth(depth: np.ndarray, rgb: np.ndarray,
                      accumulation: np.ndarray, intrin: np.ndarray,
                      c2w: np.ndarray, min_accumulation: float = 0.8,
                      stride: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """One rendered view -> (points [M, 3], colors [M, 3]).

    Same OpenGL convention as ray generation (-z forward, y up).
    """
    h, w = depth.shape[:2]
    yy, xx = np.mgrid[0:h:stride, 0:w:stride]
    d = depth[yy, xx, 0] if depth.ndim == 3 else depth[yy, xx]
    acc = accumulation[yy, xx, 0] if accumulation.ndim == 3 else \
        accumulation[yy, xx]
    keep = acc > min_accumulation
    fx, fy = intrin[0, 0], intrin[1, 1]
    cx, cy = intrin[0, 2], intrin[1, 2]
    x = (xx + 0.5 - cx) / fx
    y = -(yy + 0.5 - cy) / fy
    dirs = np.stack([x, y, -np.ones_like(x)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs_w = dirs @ c2w[:3, :3].T
    pts = c2w[:3, 3][None, None] + dirs_w * d[..., None]
    cols = rgb[yy, xx]
    return pts[keep], cols[keep]


# --- TSDF fusion ----------------------------------------------------------------


def tsdf_init(resolution: int):
    tsdf = jnp.ones((resolution,) * 3)
    weight = jnp.zeros((resolution,) * 3)
    color = jnp.zeros((resolution,) * 3 + (3,))
    return tsdf, weight, color


def tsdf_integrate(state, depth: jax.Array, rgb: jax.Array,
                   intrin: jax.Array, c2w: jax.Array, aabb: jax.Array,
                   trunc: float = 0.05):
    """Integrate one rendered view into the TSDF (open3d
    ``ScalableTSDFVolume.integrate`` semantics on a dense grid)."""
    tsdf, weight, color = state
    res = tsdf.shape[0]
    idx = jnp.arange(res)
    gx, gy, gz = jnp.meshgrid(idx, idx, idx, indexing="ij")
    vox = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    world = aabb[0] + (vox + 0.5) / res * (aabb[1] - aabb[0])

    # world -> camera (OpenGL: -z forward)
    rot = c2w[:3, :3]
    t = c2w[:3, 3]
    cam = (world - t) @ rot  # inverse rotation
    z = -cam[:, 2]
    fx, fy = intrin[0, 0], intrin[1, 1]
    cx, cy = intrin[0, 2], intrin[1, 2]
    u = cam[:, 0] / jnp.maximum(z, 1e-6) * fx + cx
    v = -cam[:, 1] / jnp.maximum(z, 1e-6) * fy + cy
    h, w = depth.shape[:2]
    ui = jnp.clip(u.astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, h - 1)
    valid = ((z > 1e-4) & (u >= 0) & (u < w) & (v >= 0) & (v < h))
    d = depth.reshape(h * w)[vi * w + ui]
    c = rgb.reshape(h * w, 3)[vi * w + ui]
    sdf = (d - z) / trunc
    upd = valid & (sdf > -1.0) & (d > 0)
    sdf = jnp.clip(sdf, -1.0, 1.0)
    wnew = upd.astype(jnp.float32)
    w_old = weight.reshape(-1)
    w_tot = w_old + wnew
    safe = jnp.maximum(w_tot, 1e-6)
    tsdf_new = (tsdf.reshape(-1) * w_old + sdf * wnew) / safe
    col_new = (color.reshape(-1, 3) * w_old[:, None] + c * wnew[:, None]) \
        / safe[:, None]
    return (tsdf_new.reshape(tsdf.shape), w_tot.reshape(weight.shape),
            col_new.reshape(color.shape))


# --- Marching tetrahedra ---------------------------------------------------------

# cube corner offsets, and the 6-tetrahedra decomposition of a cube
_CORNERS = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]])
_TETS = np.array([[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
                  [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]])


def marching_tetrahedra(values: np.ndarray, aabb: np.ndarray,
                        level: float = 0.0,
                        mask: Optional[np.ndarray] = None):
    """Extract the iso-surface of a dense scalar grid.

    values [R, R, R]; returns (vertices [V, 3] world, faces [F, 3]).
    Table-free: each cube is split into 6 tetrahedra and each tet with a
    sign change emits 1 or 2 triangles from interpolated edge crossings.
    """
    res = values.shape[0]
    v = values - level
    idx = np.arange(res - 1)
    gx, gy, gz = np.meshgrid(idx, idx, idx, indexing="ij")
    base = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # [C, 3]
    if mask is not None:
        mcube = mask[:-1, :-1, :-1].reshape(-1)
        base = base[mcube]
    corner_idx = base[:, None, :] + _CORNERS[None]  # [C, 8, 3]
    cv = v[corner_idx[..., 0], corner_idx[..., 1], corner_idx[..., 2]]

    verts = []
    faces = []
    vcount = 0
    scale = (aabb[1] - aabb[0]) / res

    def emit(p):
        nonlocal vcount
        verts.append(p)
        vcount += 1
        return vcount - 1

    for tet in _TETS:
        tv = cv[:, tet]                       # [C, 4]
        tp = corner_idx[:, tet]               # [C, 4, 3]
        inside = tv < 0
        n_in = inside.sum(axis=1)
        for cnt in (1, 2, 3):
            sel = np.nonzero(n_in == cnt)[0]
            if sel.size == 0:
                continue
            for ci in sel:
                vv = tv[ci]
                pp = tp[ci].astype(np.float64)
                ins = np.nonzero(vv < 0)[0]
                outs = np.nonzero(vv >= 0)[0]

                def crossing(a, b):
                    ta = vv[a]
                    tb = vv[b]
                    alpha = ta / (ta - tb + 1e-12)
                    p = pp[a] + alpha * (pp[b] - pp[a])
                    return emit(aabb[0] + (p + 0.5) * scale)

                if cnt == 1:
                    a = ins[0]
                    tri = [crossing(a, outs[0]), crossing(a, outs[1]),
                           crossing(a, outs[2])]
                    faces.append(tri)
                elif cnt == 3:
                    a = outs[0]
                    tri = [crossing(ins[0], a), crossing(ins[1], a),
                           crossing(ins[2], a)]
                    faces.append(tri)
                else:  # 2 in, 2 out -> quad -> 2 triangles
                    a, b = ins
                    c, d = outs
                    q = [crossing(a, c), crossing(a, d), crossing(b, d),
                         crossing(b, c)]
                    faces.append([q[0], q[1], q[2]])
                    faces.append([q[0], q[2], q[3]])
    if not verts:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    return np.asarray(verts), np.asarray(faces, np.int64)


def depth_to_oriented_points(depth: np.ndarray, accumulation: np.ndarray,
                             intrin: np.ndarray, c2w: np.ndarray,
                             min_accumulation: float = 0.5):
    """Back-project a depth map to oriented points for Poisson meshing
    (the reference gets normals from open3d's point-cloud estimator;
    here they come from image-space depth-gradient cross products,
    flipped to face the camera).  Returns (points [M,3], normals [M,3])."""
    depth = depth[..., 0] if depth.ndim == 3 else depth
    acc = accumulation[..., 0] if accumulation.ndim == 3 else accumulation
    h, w = depth.shape
    fx, fy = intrin[0, 0], intrin[1, 1]
    cx, cy = intrin[0, 2], intrin[1, 2]
    yy, xx = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                         indexing="ij")
    dirs_cam = np.stack([(xx - cx) / fx, -(yy - cy) / fy,
                         -np.ones_like(xx)], -1)
    dirs = dirs_cam @ np.asarray(c2w)[:3, :3].T
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pts = np.asarray(c2w)[:3, 3][None, None] + depth[..., None] * dirs

    dpdx = np.gradient(pts, axis=1)
    dpdy = np.gradient(pts, axis=0)
    n = np.cross(dpdx, dpdy)
    n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12
    to_cam = np.asarray(c2w)[:3, 3][None, None] - pts
    flip = np.sum(n * to_cam, axis=-1, keepdims=True) < 0
    n = np.where(flip, -n, n)

    keep = acc > min_accumulation
    return pts[keep], n[keep]


def _splat_trilinear(grid: jax.Array, pts01: jax.Array,
                     vals: jax.Array) -> jax.Array:
    """Trilinear scatter-add of per-point values into [N,N,N,C]."""
    n = grid.shape[0]
    p = pts01 * (n - 1)
    f = jnp.floor(p)
    d = p - f
    base = f.astype(jnp.int32)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                w = (jnp.where(cx, d[:, 0], 1 - d[:, 0])
                     * jnp.where(cy, d[:, 1], 1 - d[:, 1])
                     * jnp.where(cz, d[:, 2], 1 - d[:, 2]))
                idx = jnp.clip(base + jnp.array([cx, cy, cz]), 0, n - 1)
                grid = grid.at[idx[:, 0], idx[:, 1], idx[:, 2]].add(
                    w[:, None] * vals)
    return grid


def _sample_trilinear(grid: jax.Array, pts01: jax.Array) -> jax.Array:
    n = grid.shape[0]
    p = pts01 * (n - 1)
    f = jnp.floor(p)
    d = p - f
    base = f.astype(jnp.int32)
    out = 0.0
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                w = (jnp.where(cx, d[:, 0], 1 - d[:, 0])
                     * jnp.where(cy, d[:, 1], 1 - d[:, 1])
                     * jnp.where(cz, d[:, 2], 1 - d[:, 2]))
                idx = jnp.clip(base + jnp.array([cx, cy, cz]), 0, n - 1)
                out = out + w * grid[idx[:, 0], idx[:, 1], idx[:, 2]]
    return out


def poisson_reconstruct(points: np.ndarray, normals: np.ndarray,
                        aabb: np.ndarray, resolution: int = 96,
                        screen: float = 4.0, cg_iters: int = 200):
    """Screened Poisson surface reconstruction on a dense grid.

    TPU-native replacement for open3d's octree Poisson
    (``nerfstudio/exporter/exporter_utils.py`` via
    ``scripts/exporter.py:183-244``): solve
    ``(laplacian - screen*I) chi = div(V)`` where V is the
    trilinearly-splatted oriented-normal field, using conjugate
    gradients on dense jnp tensors (every op is a stencil conv - ideal
    XLA shapes), then extract the isosurface at the mean indicator value
    over the input samples with :func:`marching_tetrahedra`.

    points [M, 3] world; normals [M, 3] (outward); aabb [2, 3].
    Returns (vertices [V, 3], faces [F, 3]).
    """
    aabb = np.asarray(aabb, np.float32)
    span = aabb[1] - aabb[0]
    pts01 = jnp.asarray((points - aabb[0]) / span)
    nrm = jnp.asarray(normals / (np.linalg.norm(normals, axis=-1,
                                                keepdims=True) + 1e-12))
    n = resolution
    vfield = _splat_trilinear(jnp.zeros((n, n, n, 3)), pts01, nrm)

    # divergence of V (central differences, grid units)
    def ddx(a, axis):
        return (jnp.roll(a, -1, axis) - jnp.roll(a, 1, axis)) * 0.5

    rhs = (ddx(vfield[..., 0], 0) + ddx(vfield[..., 1], 1)
           + ddx(vfield[..., 2], 2))

    def laplace(x):
        out = -6.0 * x
        for ax in (0, 1, 2):
            out = out + jnp.roll(x, 1, ax) + jnp.roll(x, -1, ax)
        return out

    alpha = screen / (n * n)

    def A(x):
        return laplace(x) - alpha * x

    @jax.jit
    def solve(rhs):
        def body(i, carry):
            x, r, p, rs = carry
            ap = A(p)
            denom = jnp.sum(p * ap)
            a = rs / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
            x = x + a * p
            r = r - a * ap
            rs_new = jnp.sum(r * r)
            beta = rs_new / jnp.where(rs < 1e-20, 1e-20, rs)
            return x, r, p * beta + r, rs_new
        x0 = jnp.zeros_like(rhs)
        x, *_ = jax.lax.fori_loop(0, cg_iters, body,
                                  (x0, rhs, rhs, jnp.sum(rhs * rhs)))
        return x

    chi = solve(rhs)
    iso = float(jnp.mean(_sample_trilinear(chi, pts01)))
    return marching_tetrahedra(np.asarray(chi - iso), aabb)


def export_poisson(path: Path, points: np.ndarray, normals: np.ndarray,
                   aabb: np.ndarray, resolution: int = 96) -> Path:
    """Poisson mesh -> OBJ (reference ``scripts/exporter.py:183-244``)."""
    verts, faces = poisson_reconstruct(points, normals, aabb, resolution)
    export_obj(Path(path), verts, faces)
    return Path(path)
