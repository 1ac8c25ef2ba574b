"""Exporter: PLY/OBJ writers, depth backprojection, TSDF, marching tets."""
import struct

import numpy as np
import pytest

import jax.numpy as jnp

from samnerf_tpu.exporter import exporter as ex


def test_export_ply_roundtrip(tmp_path):
    pts = np.random.RandomState(0).randn(10, 3).astype(np.float32)
    cols = np.random.RandomState(1).rand(10, 3)
    p = tmp_path / "cloud.ply"
    ex.export_ply(p, pts, colors=cols)
    raw = p.read_bytes()
    header, body = raw.split(b"end_header\n", 1)
    assert b"element vertex 10" in header
    x, y, z = struct.unpack("<3f", body[:12])
    np.testing.assert_allclose([x, y, z], pts[0], rtol=1e-6)


def test_backproject_depth_geometry():
    h = w = 8
    depth = np.full((h, w, 1), 2.0)
    rgb = np.random.rand(h, w, 3)
    acc = np.ones((h, w, 1))
    intrin = np.array([[8.0, 0, 4.0], [0, 8.0, 4.0], [0, 0, 1]])
    c2w = np.eye(4)[:3]
    pts, cols = ex.backproject_depth(depth, rgb, acc, intrin, c2w)
    assert pts.shape == (64, 3) and cols.shape == (64, 3)
    # all points at distance 2 from origin
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 2.0, rtol=1e-5)
    # center pixel looks straight down -z
    center = pts.reshape(8, 8, 3)[4, 4]
    assert center[2] < -1.9


def test_marching_tetrahedra_sphere():
    res = 24
    g = np.linspace(-1, 1, res)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - 0.5
    aabb = np.array([[-1.0, -1, -1], [1, 1, 1]])
    verts, faces = ex.marching_tetrahedra(sdf, aabb)
    assert len(verts) > 0 and len(faces) > 0
    r = np.linalg.norm(verts, axis=-1)
    # all vertices near the 0.5-radius sphere
    assert abs(r.mean() - 0.5) < 0.05
    assert r.std() < 0.05


def test_tsdf_integration_recovers_plane():
    res = 16
    state = ex.tsdf_init(res)
    h = w = 32
    depth = jnp.full((h, w), 1.0)   # plane at z = -1 in world
    rgb = jnp.full((h, w, 3), 0.5)
    intrin = jnp.asarray([[32.0, 0, 16.0], [0, 32.0, 16.0], [0, 0, 1]])
    c2w = jnp.eye(4)[:3]
    aabb = jnp.asarray([[-2.0, -2, -2], [2, 2, 2]])
    state = ex.tsdf_integrate(state, depth, rgb, intrin, c2w, aabb,
                              trunc=0.5)
    tsdf, weight, color = state
    assert float(weight.sum()) > 0
    v = np.asarray(tsdf)
    aabb_np = np.asarray(aabb)
    verts, faces = ex.marching_tetrahedra(
        v, aabb_np, mask=np.asarray(weight) > 0)
    if len(verts):
        # extracted surface near z = -1
        assert abs(np.median(verts[:, 2]) + 1.0) < 0.3


def test_export_obj(tmp_path):
    verts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    faces = np.array([[0, 1, 2]])
    p = tmp_path / "mesh.obj"
    ex.export_obj(p, verts, faces)
    txt = p.read_text()
    assert txt.count("v ") == 3 and "f 1 2 3" in txt


def test_poisson_reconstruct_sphere(tmp_path):
    """Screened-Poisson reconstruction recovers a sphere from oriented
    point samples (replaces the open3d path, scripts/exporter.py:183-244)."""
    from samnerf_tpu.exporter.exporter import export_poisson

    rng = np.random.RandomState(0)
    d = rng.randn(4000, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = 0.5 * d             # sphere of radius 0.5
    normals = d               # outward
    aabb = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)
    out = export_poisson(tmp_path / "sphere.obj", pts, normals, aabb,
                         resolution=48)
    text = out.read_text()
    verts = np.array([[float(x) for x in l.split()[1:4]]
                      for l in text.splitlines() if l.startswith("v ")])
    faces = sum(1 for l in text.splitlines() if l.startswith("f "))
    assert len(verts) > 200 and faces > 200
    r = np.linalg.norm(verts, axis=-1)
    # the reconstructed surface sits near radius 0.5
    assert abs(np.median(r) - 0.5) < 0.08, np.median(r)
    assert np.percentile(np.abs(r - 0.5), 90) < 0.12
