"""Occupancy-guided coarse sampling (beyond-reference accelerator).

Inspired by NerfAcc-style occupancy grids (PAPERS.md), redesigned for
TPU static shapes: instead of *skipping* empty-space samples (dynamic
ray lengths), the same fixed number of coarse samples is *redistributed*
along each ray by importance-sampling the ray's per-bin occupancy — a
gather + the existing inverse-CDF resampler, zero dynamic shapes, fully
shard-local.

The grid is a dense ``[G, G, G]`` float EMA of ``relu(sigma)`` over the
scene AABB, refreshed off the critical path every ``update_every`` steps
by evaluating the coarse network on jittered voxel centers.  Empty rays
(all bins unoccupied) gracefully fall back to uniform stratified
sampling (the blend keeps an ``eps_floor`` of uniform mass everywhere,
which also preserves exploration of newly-occupied space).

STATUS: experimental opt-in.  A/B on the synthetic cube (64^2, 1500
steps, v5e): uniform-64-coarse 172 steps/s @ PSNR 28.2; guided-32
136.9 @ 26.2; uniform-32 227 @ 27.9 — at small coarse counts the
per-step lookup+redraw outweighs the saved MLP evals and the early
(noisy-grid) redistribution hurts convergence.  Expected to pay off on
large mostly-empty object scenes with high sample counts; not wired
into the default pipeline.
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
    z = sample_pdf(z_uniform, weights, z_uniform.shape[-1], key=key, det=det)
    return jnp.sort(z, axis=-1)
