"""Mesh extraction: density-grid query -> isosurface -> colored PLY.

Behavioral parity target: ``SSR/extract_colour_mesh.py`` +
``SSR/geometry/occupancy.py`` + ``SSR/visualisation/open3d_utils.py``:
query the fine MLP (zero viewdirs) on a ``grid_dim^3`` grid inside the
scene's oriented bounds, ``occ = 1 - exp(-relu(sigma) * voxel)``,
marching cubes at ``level``, drop small connected clusters, then color
each vertex either by its semantic argmax color or by rendering a ray
along the negative vertex normal, and export PLY.

First-party replacements: trimesh oriented bounds -> PCA oriented
bounding box; skimage marching_cubes -> native marching tetrahedra
(``native.py``); open3d clean_mesh -> union-find component filter; PLY
IO implemented here.  The density query itself is a jitted TPU fn.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from intrinsicnerf_tpu.native import filter_small_components, marching_cubes


# ----------------------------------------------------------------- PLY IO


def write_ply(
    path: str,
    vertices: np.ndarray,
    faces: Optional[np.ndarray] = None,
    colors: Optional[np.ndarray] = None,
    normals: Optional[np.ndarray] = None,
):
    """Binary little-endian PLY writer (colors uint8, normals float)."""
    v = np.asarray(vertices, np.float32)
    n = len(v)
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {c}" for c in "xyz"]
    if normals is not None:
        header += [f"property float n{c}" for c in "xyz"]
    if colors is not None:
        header += [f"property uchar {c}" for c in ("red", "green", "blue")]
    if faces is not None:
        header += [
            f"element face {len(faces)}",
            "property list uchar int vertex_indices",
        ]
    header.append("end_header")

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        cols = [v]
        if normals is not None:
            cols.append(np.asarray(normals, np.float32))
        rec = np.concatenate(cols, axis=1).astype("<f4")
        if colors is not None:
            c8 = np.asarray(colors, np.uint8)
            # interleave: struct rows of (floats..., uchars...)
            fmt = "<" + "f" * rec.shape[1] + "BBB"
            for i in range(n):
                f.write(struct.pack(fmt, *rec[i], *c8[i]))
        else:
            f.write(rec.tobytes())
        if faces is not None:
            fc = np.asarray(faces, np.int32)
            for tri in fc:
                f.write(struct.pack("<Biii", 3, *tri))


def read_ply(path: str) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Minimal PLY reader (ascii or binary_little_endian): returns
    (vertices [V, 3], faces [F, 3] or None).  Extra vertex properties
    are skipped."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", "replace").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        n_vert = n_face = 0
        vert_props = []
        cur = None
        for line in header:
            if line.startswith("element vertex"):
                n_vert = int(line.split()[-1])
                cur = "vertex"
            elif line.startswith("element face"):
                n_face = int(line.split()[-1])
                cur = "face"
            elif line.startswith("property") and cur == "vertex":
                parts = line.split()
                vert_props.append((parts[1], parts[2]))

        type_map = {
            "float": ("<f4", 4), "float32": ("<f4", 4),
            "double": ("<f8", 8), "float64": ("<f8", 8),
            "uchar": ("<u1", 1), "uint8": ("<u1", 1),
            "char": ("<i1", 1), "int8": ("<i1", 1),
            "short": ("<i2", 2), "ushort": ("<u2", 2),
            "int": ("<i4", 4), "int32": ("<i4", 4),
            "uint": ("<u4", 4), "uint32": ("<u4", 4),
        }
        xyz_idx = [i for i, (_, name) in enumerate(vert_props) if name in "xyz"]

        if fmt == "ascii":
            verts = np.empty((n_vert, 3), np.float32)
            for i in range(n_vert):
                vals = f.readline().split()
                verts[i] = [float(vals[j]) for j in xyz_idx[:3]]
            faces = None
            if n_face:
                faces = np.empty((n_face, 3), np.int64)
                for i in range(n_face):
                    vals = f.readline().split()
                    faces[i] = [int(x) for x in vals[1:4]]
            return verts, faces

        dtype = np.dtype(
            [(f"p{i}", type_map[t][0]) for i, (t, _) in enumerate(vert_props)]
        )
        raw = np.frombuffer(f.read(dtype.itemsize * n_vert), dtype=dtype)
        verts = np.stack(
            [raw[f"p{j}"].astype(np.float32) for j in xyz_idx[:3]], axis=1
        )
        faces = None
        if n_face:
            faces = np.empty((n_face, 3), np.int64)
            for i in range(n_face):
                (cnt,) = struct.unpack("<B", f.read(1))
                idx = struct.unpack(f"<{cnt}i", f.read(4 * cnt))
                faces[i] = idx[:3]
        return verts, faces


# ------------------------------------------------------------ geometry


def oriented_bounds(points: np.ndarray):
    """PCA oriented bounding box: returns (transform [4,4] mapping
    box-centered coords to world, extents [3])."""
    pts = np.asarray(points, np.float64)
    center = pts.mean(0)
    centered = pts - center
    cov = centered.T @ centered / len(pts)
    _, vecs = np.linalg.eigh(cov)
    rot = vecs[:, ::-1]  # principal axis first
    if np.linalg.det(rot) < 0:
        rot[:, -1] *= -1
    local = centered @ rot
    lo, hi = local.min(0), local.max(0)
    extents = hi - lo
    box_center_world = center + rot @ ((lo + hi) / 2)
    transform = np.eye(4)
    transform[:3, :3] = rot
    transform[:3, 3] = box_center_world
    return transform.astype(np.float32), extents.astype(np.float32)


def grid_within_bound(
    occ_range: Tuple[float, float],
    extents: np.ndarray,
    transform: np.ndarray,
    grid_dim: int,
):
    """Grid of ``grid_dim^3`` world-space query points inside the
    oriented box (reference occupancy.py:5-48: normalized grid scaled by
    ``extents / (range * 0.9)`` then rotated+translated)."""
    t = np.linspace(occ_range[0], occ_range[1], grid_dim, dtype=np.float32)
    gx, gy, gz = np.meshgrid(t, t, t, indexing="ij")
    grid = np.stack([gx, gy, gz], axis=-1)  # [D, D, D, 3]
    scale = np.asarray(extents, np.float32) / (
        (occ_range[1] - occ_range[0]) * 0.9
    )
    grid = grid * scale
    rot, trans = transform[:3, :3], transform[:3, 3]
    grid = grid @ rot.T + trans
    return grid.reshape(-1, 3), scale


def vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals."""
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    vn = np.zeros_like(v)
    for i in range(3):
        np.add.at(vn, f[:, i], fn)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return (vn / np.maximum(norm, 1e-12)).astype(np.float32)


# ----------------------------------------------------------- extraction


def query_density_grid(
    params_fine,
    mcfg,
    query_pts: np.ndarray,
    voxel_size: float,
    chunk: int = 128 * 1024,
):
    """sigma -> occupancy on the grid, chunked jitted TPU queries with
    zero view directions."""
    from intrinsicnerf_tpu.models.mlp import eval_points

    @jax.jit
    def q(pts):
        raw = eval_points(
            params_fine, mcfg, pts[:, None, :], jnp.zeros_like(pts)
        )
        occ = 1.0 - jnp.exp(-jax.nn.relu(raw.sigma[:, 0]) * voxel_size)
        sem = (
            jnp.argmax(raw.sem_logits[:, 0], axis=-1)
            if raw.sem_logits is not None
            else jnp.zeros(pts.shape[0], jnp.int32)
        )
        return occ, sem

    n = len(query_pts)
    occs, sems = [], []
    for s in range(0, n, chunk):
        block = jnp.asarray(query_pts[s : s + chunk], jnp.float32)
        o, c = q(block)
        occs.append(np.asarray(o))
        sems.append(np.asarray(c))
    return np.concatenate(occs), np.concatenate(sems)


def extract_colour_mesh(
    trainer,
    scene_points: Optional[np.ndarray] = None,
    grid_dim: int = 256,
    level: float = 0.45,
    min_cluster_faces: int = 400,
    near_t: float = 1.0,
    color_mode: str = "rgb",  # "rgb" | "semantic"
    out_path: str = "mesh.ply",
):
    """Full pipeline on a trained ``Trainer``.  ``scene_points`` (e.g.
    vertices of the dataset's scene mesh, or rendered depth
    backprojections) define the oriented bounds; defaults to a cube over
    the camera positions' span."""
    cfg = trainer.cfg
    if scene_points is None:
        origins = np.asarray(trainer.bundle.rays_test[:, 0, 0:3])
        center = origins.mean(0)
        span = max(np.ptp(origins, axis=0).max(), 1.0) * 2.5
        scene_points = center + span / 2 * np.array(
            [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)]
        )
    transform, extents = oriented_bounds(scene_points)
    query_pts, _ = grid_within_bound([-1.0, 1.0], extents, transform, grid_dim)

    near, far = cfg.depth_range
    voxel_size = (far - near) / cfg.render.n_importance
    occ, _ = query_density_grid(
        trainer.state.params_fine, trainer.mcfg, query_pts, voxel_size
    )
    occ = occ.reshape(grid_dim, grid_dim, grid_dim)
    print(f"occupied fraction @{level}: {(occ > level).mean():.4f}")

    verts, tris = marching_cubes(occ, level)
    if len(tris) == 0:
        raise RuntimeError("empty isosurface — lower the level?")
    keep = filter_small_components(tris, len(verts), min_cluster_faces)
    tris = tris[keep]
    used = np.unique(tris)
    remap = np.full(len(verts), -1, np.int64)
    remap[used] = np.arange(len(used))
    verts, tris = verts[used], remap[tris]

    # grid coords -> [-1,1] -> oriented box -> world
    verts_w = verts / (grid_dim - 1) * 2.0 - 1.0
    verts_w = verts_w * (extents / 2.0)
    verts_w = verts_w @ transform[:3, :3].T + transform[:3, 3]

    normals = vertex_normals(verts_w, tris)
    # color by rendering along the negative vertex normal
    rays_d = -normals
    rays_o = verts_w - rays_d * (near * near_t)
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=1, keepdims=True)
    nf = np.broadcast_to(np.asarray([near, far], np.float32), (len(verts_w), 2))
    rays = np.concatenate([rays_o, rays_d, nf, viewdirs], axis=1).astype(
        np.float32
    )

    from intrinsicnerf_tpu.render.pipeline import render_rays_chunked

    chunk = 4096
    pad = (-len(rays)) % chunk
    rays_p = np.pad(rays, ((0, pad), (0, 0)), mode="edge")
    out = jax.jit(
        lambda r: render_rays_chunked(
            trainer.state.params_coarse,
            trainer.state.params_fine,
            trainer.mcfg,
            r,
            cfg.render,
            chunk=chunk,
        )
    )(jnp.asarray(rays_p))
    maps = out.fine if out.fine is not None else out.coarse
    if color_mode == "semantic" and maps.sem_logits is not None:
        labels = np.asarray(jnp.argmax(maps.sem_logits, -1))[: len(verts_w)]
        cmap = trainer.bundle.colour_map
        if cmap is None:
            from intrinsicnerf_tpu.utils.image import label_colormap

            cmap = label_colormap(trainer.bundle.num_valid_classes + 2)
        colors = np.asarray(cmap)[1:][labels].astype(np.uint8)
    else:
        colors = (np.clip(np.asarray(maps.rgb)[: len(verts_w)], 0, 1) * 255).astype(
            np.uint8
        )

    write_ply(out_path, verts_w, tris, colors=colors, normals=normals)
    print(
        f"wrote {out_path}: {len(verts_w)} vertices, {len(tris)} faces"
    )
    return verts_w, tris, colors
