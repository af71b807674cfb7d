from intrinsicnerf_tpu.geometry.mesh import (
    grid_within_bound,
    oriented_bounds,
    extract_colour_mesh,
    read_ply,
    write_ply,
    vertex_normals,
)
