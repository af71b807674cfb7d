"""Geometry tests: native marching tetrahedra vs numpy fallback, PLY
roundtrip, component filtering, oriented bounds."""

import numpy as np
import pytest

from intrinsicnerf_tpu.native import (
    _marching_tetrahedra_np,
    filter_small_components,
    marching_cubes,
    native_available,
)
from intrinsicnerf_tpu.geometry.mesh import (
    grid_within_bound,
    oriented_bounds,
    read_ply,
    vertex_normals,
    write_ply,
)


def sphere_grid(n=24, r=0.35):
    t = np.linspace(-0.5, 0.5, n)
    x, y, z = np.meshgrid(t, t, t, indexing="ij")
    return (r - np.sqrt(x**2 + y**2 + z**2)).astype(np.float32)


def test_native_builds():
    assert native_available(), "C++ native library failed to build"


def test_marching_cubes_sphere():
    grid = sphere_grid()
    verts, tris = marching_cubes(grid, 0.0)
    assert len(verts) > 100 and len(tris) > 100
    # vertices lie on the r=0.35 sphere (grid coords -> centered coords)
    n = grid.shape[0]
    pts = verts / (n - 1) - 0.5
    radii = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.35, atol=0.02)
    assert radii.std() < 0.02
    # valid topology
    assert tris.min() >= 0 and tris.max() < len(verts)
    # surface area ~ 4*pi*r^2 (as fraction of unit cube)
    v = verts / (n - 1)
    a, b, c = v[tris[:, 0]], v[tris[:, 1]], v[tris[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
    np.testing.assert_allclose(area, 4 * np.pi * 0.35**2, rtol=0.1)


def test_native_matches_numpy_fallback():
    grid = sphere_grid(n=10)
    v1, t1 = marching_cubes(grid, 0.0)
    v2, t2 = _marching_tetrahedra_np(grid, 0.0)
    assert len(v1) == len(v2) and len(t1) == len(t2)
    # same vertex set (orderings agree by construction of the scan)
    np.testing.assert_allclose(v1, v2, atol=1e-5)
    np.testing.assert_array_equal(t1, t2)


def test_normals_point_outward():
    grid = sphere_grid()
    verts, tris = marching_cubes(grid, 0.0)
    n = grid.shape[0]
    pts = verts / (n - 1) - 0.5
    normals = vertex_normals(verts, tris)
    radial = pts / np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
    align = np.sum(normals * radial, axis=1)
    frac_in = (align < 0).mean()
    assert frac_in > 0.95 or frac_in < 0.05  # consistent orientation


def test_component_filter():
    grid = sphere_grid(n=20, r=0.3)
    # add a tiny disconnected blob in a corner
    grid[1:3, 1:3, 1:3] = np.maximum(grid[1:3, 1:3, 1:3], 0.01)
    verts, tris = marching_cubes(grid, 0.0)
    keep = filter_small_components(tris, len(verts), min_faces=500)
    assert keep.sum() < len(keep)  # something was dropped
    assert keep.sum() > 0.8 * len(keep)  # but only the small blob


def test_ply_roundtrip(tmp_path):
    grid = sphere_grid(n=12)
    verts, tris = marching_cubes(grid, 0.0)
    colors = np.random.default_rng(0).integers(0, 255, (len(verts), 3)).astype(
        np.uint8
    )
    normals = vertex_normals(verts, tris)
    path = str(tmp_path / "m.ply")
    write_ply(path, verts, tris, colors=colors, normals=normals)
    rv, rf = read_ply(path)
    np.testing.assert_allclose(rv, verts, rtol=1e-6)
    np.testing.assert_array_equal(rf, tris)


def test_ply_ascii_read(tmp_path):
    path = str(tmp_path / "a.ply")
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\nproperty list uchar int vertex_indices\n"
            "end_header\n0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n"
        )
    v, fc = read_ply(path)
    np.testing.assert_allclose(v, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    np.testing.assert_array_equal(fc, [[0, 1, 2]])


def test_oriented_bounds(rng):
    # elongated box rotated 30 deg about z
    pts = rng.uniform(-1, 1, size=(5000, 3)) * [4.0, 1.0, 0.5]
    th = np.deg2rad(30)
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    pts = pts @ rot.T + [10, -5, 2]
    transform, extents = oriented_bounds(pts)
    np.testing.assert_allclose(sorted(extents), sorted([8, 2, 1]), rtol=0.05)
    np.testing.assert_allclose(transform[:3, 3], [10, -5, 2], atol=0.1)
    # transform maps local box coords back onto the points
    local = (pts - transform[:3, 3]) @ transform[:3, :3]
    assert np.all(np.abs(local) <= np.asarray(extents) / 2 + 1e-6)


def test_grid_within_bound():
    transform = np.eye(4, dtype=np.float32)
    transform[:3, 3] = [1, 2, 3]
    pts, scale = grid_within_bound([-1, 1], np.array([2.0, 2.0, 2.0]), transform, 8)
    assert pts.shape == (512, 3)
    center = pts.mean(0)
    np.testing.assert_allclose(center, [1, 2, 3], atol=1e-5)
    # spans extents/0.9
    np.testing.assert_allclose(pts[:, 0].max() - pts[:, 0].min(), 2 / 0.9 * 2 / 2, rtol=1e-5)


def test_keep_largest_component():
    """min_faces = -1 keeps only the largest connected component (open3d
    clean_mesh keep_single_cluster parity, open3d_utils.py:186-191)."""
    import numpy as np

    from intrinsicnerf_tpu.native import (
        _filter_components_np,
        filter_small_components,
    )

    # comp A: 3 faces on verts 0-4; comp B: 1 face on verts 5-7
    tris = np.array(
        [[0, 1, 2], [1, 2, 3], [2, 3, 4], [5, 6, 7]], np.int64
    )
    for fn in (filter_small_components, _filter_components_np):
        keep = fn(tris, 8, -1)
        assert keep.tolist() == [True, True, True, False], fn
