"""ctypes bindings for the first-party C++ host kernels.

Builds ``native/intrinsic_native.cpp`` with g++ on first use (cached
next to the source).  Every binding has a pure-numpy fallback so the
framework degrades gracefully without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "intrinsic_native.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libintrinsic_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
                _SRC
            ):
                base = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-o", _SO, _SRC]
                try:  # OpenMP parallelizes the mean-shift seed loop
                    subprocess.run(base + ["-fopenmp"], check=True,
                                   capture_output=True)
                except subprocess.CalledProcessError:
                    subprocess.run(base, check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.mc_run.restype = ctypes.c_int
            lib.mc_num_vertices.restype = ctypes.c_int64
            lib.mc_num_triangles.restype = ctypes.c_int64
            lib.filter_small_components.restype = ctypes.c_int64
            lib.estimate_bandwidth_kth.restype = ctypes.c_double
            _lib = lib
        except (subprocess.CalledProcessError, OSError) as e:
            print(f"[native] build/load failed, using numpy fallbacks: {e}")
            _build_failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


def marching_cubes(
    grid: np.ndarray, level: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Isosurface of ``grid [nx, ny, nz]`` at ``level``; returns
    (vertices [V, 3] in grid coordinates, triangles [T, 3] int64).
    Surface normals point toward increasing field (gradient ascent),
    matching the reference's ``gradient_direction='ascent'`` use."""
    lib = _load()
    grid = np.ascontiguousarray(grid, np.float32)
    if lib is None:
        return _marching_tetrahedra_np(grid, level)
    nx, ny, nz = grid.shape
    rc = lib.mc_run(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(nx),
        ctypes.c_int64(ny),
        ctypes.c_int64(nz),
        ctypes.c_float(level),
    )
    if rc != 0:
        raise ValueError(f"marching_cubes failed on grid shape {grid.shape}")
    nv, nt = lib.mc_num_vertices(), lib.mc_num_triangles()
    verts = np.empty((nv, 3), np.float32)
    tris = np.empty((nt, 3), np.int64)
    if nv:
        lib.mc_copy_vertices(verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if nt:
        lib.mc_copy_triangles(tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    lib.mc_free()
    return verts, tris


def filter_small_components(
    triangles: np.ndarray, n_verts: int, min_faces: int
) -> np.ndarray:
    """Boolean keep-mask over triangles whose connected component has at
    least ``min_faces`` faces; ``min_faces < 0`` keeps only the largest
    component (open3d ``clean_mesh`` equivalent incl. its
    ``keep_single_cluster`` mode, ``open3d_utils.py:175-199``)."""
    lib = _load()
    triangles = np.ascontiguousarray(triangles, np.int64)
    n_tris = len(triangles)
    if lib is None:
        return _filter_components_np(triangles, n_verts, min_faces)
    mask = np.empty(n_tris, np.uint8)
    lib.filter_small_components(
        triangles.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n_tris),
        ctypes.c_int64(n_verts),
        ctypes.c_int64(min_faces),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return mask.astype(bool)


def meanshift_iterate(
    points: np.ndarray,
    seeds: np.ndarray,
    bandwidth: float,
    max_iter: int = 300,
) -> Tuple[np.ndarray, np.ndarray]:
    """Converge each seed with the flat-kernel mean-shift update;
    returns (converged seeds, support counts)."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float64)
    seeds = np.ascontiguousarray(seeds, np.float64).copy()
    if lib is None:
        raise RuntimeError("native meanshift unavailable")
    support = np.empty(len(seeds), np.int64)
    lib.meanshift_iterate(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(len(points)),
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(len(seeds)),
        ctypes.c_int(points.shape[1]),
        ctypes.c_double(bandwidth),
        ctypes.c_int(max_iter),
        ctypes.c_double(1e-3 * bandwidth),
        support.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return seeds, support


def estimate_bandwidth_kth(points: np.ndarray, k: int) -> float:
    """Mean distance to the k-th nearest neighbor (self included)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native bandwidth estimator unavailable")
    points = np.ascontiguousarray(points, np.float64)
    return float(
        lib.estimate_bandwidth_kth(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(len(points)),
            ctypes.c_int(points.shape[1]),
            ctypes.c_int64(k),
        )
    )


# ------------------------------------------------------------- fallbacks

_TETS = np.array(
    [[0, 5, 1, 7], [0, 1, 3, 7], [0, 3, 2, 7],
     [0, 2, 6, 7], [0, 6, 4, 7], [0, 4, 5, 7]]
)


def _marching_tetrahedra_np(grid: np.ndarray, level: float):
    """Slow reference implementation of the same algorithm (tests and
    toolchain-free environments)."""
    nx, ny, nz = grid.shape
    verts: list = []
    tris: list = []
    edge_cache: dict = {}

    def gid(x, y, z):
        return (x * ny + y) * nz + z

    def vert(ga, gb, va, vb):
        key = (ga, gb) if ga < gb else (gb, ga)
        if key in edge_cache:
            return edge_cache[key]
        t = 0.5 if vb == va else np.clip((level - va) / (vb - va), 0, 1)
        ax, ay, az = ga // (ny * nz), (ga // nz) % ny, ga % nz
        bx, by, bz = gb // (ny * nz), (gb // nz) % ny, gb % nz
        idx = len(verts)
        verts.append(
            [ax + t * (bx - ax), ay + t * (by - ay), az + t * (bz - az)]
        )
        edge_cache[key] = idx
        return idx

    def pos(g):
        return np.array([g // (ny * nz), (g // nz) % ny, g % nz], float)

    def emit(v0, v1, v2, in_dir):
        a, b, c = (np.asarray(verts[v]) for v in (v0, v1, v2))
        n = np.cross(b - a, c - a)
        if float(np.dot(n, in_dir)) > 0:
            v1, v2 = v2, v1
        tris.append([v0, v1, v2])

    for x in range(nx - 1):
        for y in range(ny - 1):
            for z in range(nz - 1):
                cg = [gid(x + (c & 1), y + ((c >> 1) & 1), z + ((c >> 2) & 1))
                      for c in range(8)]
                cv = [grid.flat[g] for g in cg]
                for tet in _TETS:
                    inside = [i for i in range(4) if cv[tet[i]] > level]
                    outside = [i for i in range(4) if cv[tet[i]] <= level]
                    if not inside or not outside:
                        continue
                    ci = np.mean([pos(cg[tet[i]]) for i in inside], axis=0)
                    co = np.mean([pos(cg[tet[o]]) for o in outside], axis=0)
                    in_dir = ci - co
                    if len(inside) == 1:
                        a = tet[inside[0]]
                        vs = [vert(cg[a], cg[tet[o]], cv[a], cv[tet[o]])
                              for o in outside]
                        emit(vs[0], vs[1], vs[2], in_dir)
                    elif len(inside) == 3:
                        a = tet[outside[0]]
                        vs = [vert(cg[a], cg[tet[i]], cv[a], cv[tet[i]])
                              for i in inside]
                        emit(vs[0], vs[1], vs[2], in_dir)
                    else:
                        a0, a1 = (tet[i] for i in inside)
                        b0, b1 = (tet[o] for o in outside)
                        v00 = vert(cg[a0], cg[b0], cv[a0], cv[b0])
                        v01 = vert(cg[a0], cg[b1], cv[a0], cv[b1])
                        v10 = vert(cg[a1], cg[b0], cv[a1], cv[b0])
                        v11 = vert(cg[a1], cg[b1], cv[a1], cv[b1])
                        emit(v00, v10, v11, in_dir)
                        emit(v00, v11, v01, in_dir)
    return (
        np.asarray(verts, np.float32).reshape(-1, 3),
        np.asarray(tris, np.int64).reshape(-1, 3),
    )


def _filter_components_np(triangles, n_verts, min_faces):
    parent = np.arange(n_verts)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for t in triangles:
        a, b, c = (find(v) for v in t)
        parent[a] = b
        parent[find(b)] = find(c)
    roots = np.array([find(t[0]) for t in triangles])
    _, inv, counts = np.unique(roots, return_inverse=True, return_counts=True)
    if min_faces < 0:  # keep_single_cluster: only the largest component
        return inv == np.argmax(counts)
    return counts[inv] >= min_faces
