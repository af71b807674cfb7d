"""Occupancy-guided coarse sampling (beyond-reference accelerator).

Inspired by NerfAcc-style occupancy grids (PAPERS.md), redesigned for
TPU static shapes: instead of *skipping* empty-space samples (dynamic
ray lengths), the per-ray ``[near, far]`` interval is *tightened* to the
occupied depth span (:func:`occupancy_ray_bounds`) — two masked
reductions over a fixed probe grid, zero dynamic shapes, fully
shard-local.  All coarse samples then land where matter can be, which
lets ``n_coarse`` shrink on mostly-empty object scenes.  The earlier
redistribute-only design (:func:`occupancy_guided_z_vals`, kept for
comparison) paid an inverse-CDF redraw per step without saving any
evals and lost its A/B outright.

The grid is a dense ``[G, G, G]`` float EMA of ``relu(sigma)`` over the
scene AABB, refreshed off the critical path every ``update_every`` steps
by evaluating the coarse network on jittered voxel centers.  Empty rays
(no occupied probe) gracefully fall back to the original bounds.

STATUS — experimental, not wired (round-3 A/B, object cube 64^2,
1500 steps, white bkgd, v5e, n_importance=64):

  ===============  =========  =====
  arm              steps/s    PSNR
  ===============  =========  =====
  uniform-64       46.9       24.07
  occ-bounds-32    49.6       25.12
  uniform-32       56.4       25.74
  ===============  =========  =====

occ-bounds-32 beats the reference's uniform-64 on both axes, but plain
uniform-32 beats it harder: the *hierarchical importance sampler* (the
fine pass's inverse-CDF resample from coarse weights) already re-places
most samples onto the surface, so the grid's per-step probe-lookup
gather buys less than it costs.  NerfAcc-style grids pay off for
single-level samplers; with a 2-level sampler the cheaper win is simply
lowering ``n_coarse``.  Hence: demoted to ``experimental/``, no
pipeline plumbing.  To experiment, tighten bounds manually before
calling ``render_rays``::

    near, far = occupancy_ray_bounds(grid, rays_o, rays_d, near, far)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from intrinsicnerf_tpu.core.sampling import sample_pdf


class OccupancyGrid(NamedTuple):
    density: jnp.ndarray  # [G, G, G] EMA of relu(sigma)
    aabb_min: jnp.ndarray  # [3]
    aabb_max: jnp.ndarray  # [3]

    @property
    def resolution(self) -> int:
        return self.density.shape[0]


def create_grid(aabb_min, aabb_max, resolution: int = 64) -> OccupancyGrid:
    return OccupancyGrid(
        density=jnp.zeros((resolution,) * 3, jnp.float32),
        aabb_min=jnp.asarray(aabb_min, jnp.float32),
        aabb_max=jnp.asarray(aabb_max, jnp.float32),
    )


def lookup(grid: OccupancyGrid, pts: jnp.ndarray) -> jnp.ndarray:
    """Nearest-voxel density at world points ``[..., 3]`` (0 outside)."""
    g = grid.resolution
    t = (pts - grid.aabb_min) / (grid.aabb_max - grid.aabb_min)
    idx = jnp.floor(t * g).astype(jnp.int32)
    inside = jnp.all((idx >= 0) & (idx < g), axis=-1)
    idx = jnp.clip(idx, 0, g - 1)
    vals = grid.density[idx[..., 0], idx[..., 1], idx[..., 2]]
    return jnp.where(inside, vals, 0.0)


def update_grid(
    grid: OccupancyGrid,
    sigma_fn,
    key: jax.Array,
    ema: float = 0.8,
) -> OccupancyGrid:
    """EMA-refresh the grid with ``relu(sigma)`` at jittered voxel
    centers.  ``sigma_fn(pts [M, 3]) -> sigma [M]`` (typically the
    coarse network's density head)."""
    g = grid.resolution
    ax = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    gx, gy, gz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    t = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    t = t + (jax.random.uniform(key, t.shape) - 0.5) / g
    pts = grid.aabb_min + t * (grid.aabb_max - grid.aabb_min)
    sigma = jax.nn.relu(sigma_fn(pts)).reshape(grid.density.shape)
    new = jnp.maximum(grid.density * ema, sigma)  # decayed-max EMA
    return grid._replace(density=new)


def occupancy_ray_bounds(
    grid: OccupancyGrid,
    rays_o: jnp.ndarray,  # [N, 3]
    rays_d: jnp.ndarray,  # [N, 3]
    near: jnp.ndarray,  # [N, 1]
    far: jnp.ndarray,  # [N, 1]
    n_probe: int = 64,
    threshold: float = 1e-2,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Tighten per-ray ``[near, far]`` to the occupied depth span.

    Probes ``n_probe`` evenly spaced depths, keeps the min/max occupied
    depth (padded by one probe bin on each side), and falls back to the
    original bounds on fully-empty rays.  Two masked reductions — no
    resampling pass, no gathers beyond the grid lookup itself.  The
    caller then runs the normal stratified sampler inside the tightened
    range, concentrating *all* coarse samples where matter can be: on
    mostly-empty object scenes this lets ``n_coarse`` drop (e.g. 64 ->
    32) at equal effective resolution — fewer MLP evals, the only cost
    that matters (redistributing a fixed sample count, the previous
    design here, paid a full inverse-CDF redraw and saved nothing).
    """
    t = jnp.linspace(0.0, 1.0, n_probe, dtype=near.dtype)
    z = near + (far - near) * t  # [N, P]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    occ = lookup(grid, pts) > threshold  # [N, P]
    any_occ = jnp.any(occ, axis=-1, keepdims=True)
    pad = (far - near) / (n_probe - 1)
    z_occ_min = jnp.min(jnp.where(occ, z, jnp.inf), axis=-1, keepdims=True)
    z_occ_max = jnp.max(jnp.where(occ, z, -jnp.inf), axis=-1, keepdims=True)
    new_near = jnp.where(any_occ, jnp.maximum(z_occ_min - pad, near), near)
    new_far = jnp.where(any_occ, jnp.minimum(z_occ_max + pad, far), far)
    return new_near, new_far


def occupancy_guided_z_vals(
    grid: OccupancyGrid,
    rays_o: jnp.ndarray,  # [N, 3]
    rays_d: jnp.ndarray,  # [N, 3]
    z_uniform: jnp.ndarray,  # [N, S] stratified depths (the fallback)
    key: jax.Array,
    threshold: float = 1e-2,
    eps_floor: float = 0.05,
    det: bool = False,
) -> jnp.ndarray:
    """Redistribute the S coarse samples into occupied bins.

    Per-bin occupancy is looked up at the midpoints of ``z_uniform``'s
    intervals; the (binary + floor) weights drive an inverse-CDF redraw
    over the same depth range.  Returns sorted ``[N, S]`` depths."""
    z_mid = 0.5 * (z_uniform[..., 1:] + z_uniform[..., :-1])  # [N, S-1]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_mid[..., None]
    occ = (lookup(grid, pts) > threshold).astype(jnp.float32)
    # uniform floor keeps empty rays valid and preserves exploration
    weights = occ + eps_floor
    # sample_pdf draws sorted uniforms -> already sorted per ray
    return sample_pdf(z_uniform, weights, z_uniform.shape[-1], key=key, det=det)
