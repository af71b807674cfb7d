"""Ray generation for pinhole cameras (opencv / opengl conventions) and NDC.

Behavioral parity targets:
- ``get_rays_camera`` / ``get_rays_world`` / ``create_rays``
  (``/root/reference/SSR/models/rays.py:27-67,223-256``): per-image ray
  blocks ``[H*W, 11] = [origin(3), dir(3), near, far, viewdir(3)]``.
- ``get_rays`` (``/root/reference/object_level/run_nerf_helpers.py``-style,
  via ``run_nerf.py:900``): blender convention with single focal length.
- ``ndc_rays`` (``/root/reference/SSR/models/rays.py:111-130``).

All functions are pure and jittable; ray pools for a whole dataset are
built once and kept device-resident (sharded over the data mesh axis in
the multi-host path).
"""

from __future__ import annotations

import jax.numpy as jnp


def camera_ray_dirs(
    h: int,
    w: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    convention: str = "opencv",
    euclidean_depth: bool = False,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Per-pixel ray directions in the camera frame, shape ``[H, W, 3]``.

    opencv: x right, y down, z forward. opengl: x right, y up, z backward.
    Pixel centers at integer coordinates (i=column, j=row), matching the
    reference's ``(i - cx) / fx`` convention.
    """
    i = jnp.arange(w, dtype=dtype)[None, :].repeat(h, axis=0)  # [H, W] columns
    j = jnp.arange(h, dtype=dtype)[:, None].repeat(w, axis=1)  # [H, W] rows
    x = (i - cx) / fx
    if convention == "opencv":
        y = (j - cy) / fy
        z = jnp.ones_like(x)
    elif convention == "opengl":
        y = -(j - cy) / fy
        z = -jnp.ones_like(x)
    else:
        raise ValueError(f"unknown convention: {convention}")
    dirs = jnp.stack([x, y, z], axis=-1)
    if euclidean_depth:
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs


def rays_to_world(c2w: jnp.ndarray, dirs_cam: jnp.ndarray):
    """Rotate camera-frame dirs into the world frame and broadcast origins.

    c2w: ``[..., 4, 4]`` or ``[..., 3, 4]`` camera-to-world transforms.
    dirs_cam: ``[..., N, 3]`` (batch dims must broadcast against c2w's).
    Returns (origins ``[..., N, 3]``, dirs_world ``[..., N, 3]``).
    """
    rot = c2w[..., :3, :3]
    # [..., N, 3] = [..., N, 1, 3] x [..., 1, 3, 3] summed over camera axis
    dirs_w = jnp.einsum("...ij,...nj->...ni", rot, dirs_cam)
    origins = jnp.broadcast_to(c2w[..., None, :3, -1], dirs_w.shape)
    return origins, dirs_w


def create_rays(
    c2w: jnp.ndarray,
    h: int,
    w: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    near: float,
    far: float,
    convention: str = "opencv",
    euclidean_depth: bool = False,
) -> jnp.ndarray:
    """Build the per-image ray pool ``[B, H*W, 11]``.

    Layout matches the reference (``rays.py:251-255``):
    ``[o(3), d(3), near, far, viewdir(3)]`` with viewdir = normalized d.
    """
    dirs_cam = camera_ray_dirs(h, w, fx, fy, cx, cy, convention, euclidean_depth)
    dirs_cam = dirs_cam.reshape(-1, 3)  # [HW, 3]
    if c2w.ndim == 2:
        c2w = c2w[None]
    origins, dirs_w = rays_to_world(c2w, dirs_cam[None, :, :])
    viewdirs = dirs_w / jnp.linalg.norm(dirs_w, axis=-1, keepdims=True)
    nf = jnp.broadcast_to(
        jnp.asarray([near, far], dtype=dirs_w.dtype), (*dirs_w.shape[:-1], 2)
    )
    return jnp.concatenate([origins, dirs_w, nf, viewdirs], axis=-1)


def ndc_rays(h: int, w: int, focal: float, near: float, rays_o, rays_d):
    """Shift rays to the near plane and project to NDC (forward-facing LLFF).

    Matches ``/root/reference/SSR/models/rays.py:111-130``.
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (w / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (h / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (w / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (h / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], axis=-1), jnp.stack([d0, d1, d2], axis=-1)
