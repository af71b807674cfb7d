"""Tests for the experimental occupancy grid (demoted after losing its
A/B to plain lower-n_coarse sampling — see the module docstring)."""

import numpy as np
import jax
import jax.numpy as jnp

from intrinsicnerf_tpu.experimental.occupancy_grid import (
    create_grid,
    lookup,
    occupancy_guided_z_vals,
    occupancy_ray_bounds,
    update_grid,
)


def sphere_sigma(pts, center=(0.0, 0.0, 0.0), r=1.0, density=50.0):
    d = jnp.linalg.norm(pts - jnp.asarray(center), axis=-1)
    return jnp.where(d < r, density, -10.0)


def test_update_and_lookup():
    grid = create_grid([-2, -2, -2], [2, 2, 2], resolution=32)
    grid = update_grid(grid, sphere_sigma, jax.random.key(0))
    # center occupied, corner empty, outside-aabb zero
    assert float(lookup(grid, jnp.asarray([0.0, 0, 0]))) > 1.0
    assert float(lookup(grid, jnp.asarray([1.9, 1.9, 1.9]))) == 0.0
    assert float(lookup(grid, jnp.asarray([5.0, 0, 0]))) == 0.0
    # EMA decayed-max keeps occupancy across updates
    grid2 = update_grid(grid, lambda p: jnp.full(p.shape[:-1], -10.0),
                        jax.random.key(1))
    assert float(lookup(grid2, jnp.asarray([0.0, 0, 0]))) > 0.5


def test_guided_sampling_concentrates():
    grid = create_grid([-2, -2, -2], [2, 2, 2], resolution=32)
    grid = update_grid(grid, sphere_sigma, jax.random.key(0))
    n, s = 64, 64
    # rays along +x from x=-3: sphere occupies t in [2, 4]
    rays_o = jnp.tile(jnp.asarray([[-3.0, 0, 0]]), (n, 1))
    rays_d = jnp.tile(jnp.asarray([[1.0, 0, 0]]), (n, 1))
    z_uniform = jnp.broadcast_to(jnp.linspace(0.1, 6.0, s), (n, s))
    z = occupancy_guided_z_vals(
        grid, rays_o, rays_d, z_uniform, jax.random.key(2)
    )
    assert z.shape == (n, s)
    zc = np.asarray(z)
    assert np.all(np.diff(zc, axis=-1) >= 0)  # sorted
    frac_in = ((zc > 1.9) & (zc < 4.1)).mean()
    # occupied span is 2/5.9 of the range; guided sampling concentrates
    assert frac_in > 0.7, frac_in
    # bounds respected
    assert zc.min() >= 0.1 - 1e-4 and zc.max() <= 6.0 + 1e-4


def test_ray_bounds_tighten_to_occupied_span():
    grid = create_grid([-2, -2, -2], [2, 2, 2], resolution=32)
    grid = update_grid(grid, sphere_sigma, jax.random.key(0))
    n = 16
    rays_o = jnp.tile(jnp.asarray([[-3.0, 0, 0]]), (n, 1))
    rays_d = jnp.tile(jnp.asarray([[1.0, 0, 0]]), (n, 1))
    near = jnp.full((n, 1), 0.1)
    far = jnp.full((n, 1), 6.0)
    nn, nf = occupancy_ray_bounds(grid, rays_o, rays_d, near, far)
    nn, nf = np.asarray(nn), np.asarray(nf)
    # sphere spans t in [2, 4]; bounds tighten to it (+- one probe bin)
    pad = (6.0 - 0.1) / 63
    assert np.all(nn > 2.0 - 2 * pad - 0.15) and np.all(nn < 2.3)
    assert np.all(nf < 4.0 + 2 * pad + 0.15) and np.all(nf > 3.7)
    assert np.all(nn < nf)


def test_ray_bounds_empty_fallback():
    grid = create_grid([-2, -2, -2], [2, 2, 2], resolution=16)  # empty
    n = 4
    rays_o = jnp.tile(jnp.asarray([[-3.0, 0, 0]]), (n, 1))
    rays_d = jnp.tile(jnp.asarray([[1.0, 0, 0]]), (n, 1))
    near = jnp.full((n, 1), 0.1)
    far = jnp.full((n, 1), 6.0)
    nn, nf = occupancy_ray_bounds(grid, rays_o, rays_d, near, far)
    np.testing.assert_allclose(np.asarray(nn), 0.1)
    np.testing.assert_allclose(np.asarray(nf), 6.0)


def test_ray_bounds_compose_with_render():
    """Manual composition (the documented usage): tighten bounds, write
    them back into the ray block, render — finite maps, jittable."""
    from intrinsicnerf_tpu.models.mlp import MLPConfig, init_mlp_params
    from intrinsicnerf_tpu.render.pipeline import RenderConfig, render_rays

    mcfg = MLPConfig(depth=3, width=16, skips=(1,), n_freqs_pos=2,
                     n_freqs_dir=2, use_fused_kernel=False)
    params = init_mlp_params(jax.random.key(0), mcfg)
    grid = create_grid([-2, -2, -2], [2, 2, 2], resolution=16)
    grid = update_grid(grid, sphere_sigma, jax.random.key(0))

    n = 8
    rays_o = jnp.tile(jnp.asarray([[-3.0, 0, 0]]), (n, 1))
    rays_d = jnp.tile(jnp.asarray([[1.0, 0, 0]]), (n, 1))
    near = jnp.full((n, 1), 0.1)
    far = jnp.full((n, 1), 6.0)

    @jax.jit
    def go(rays_o, rays_d, near, far):
        nn, nf = occupancy_ray_bounds(grid, rays_o, rays_d, near, far)
        vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        rays = jnp.concatenate([rays_o, rays_d, nn, nf, vd], axis=-1)
        return render_rays(
            params, None, mcfg, rays, None,
            RenderConfig(n_coarse=8, n_importance=0),
        ).coarse.rgb

    rgb = np.asarray(go(rays_o, rays_d, near, far))
    assert rgb.shape == (n, 3) and np.isfinite(rgb).all()


def test_guided_sampling_empty_ray_fallback():
    grid = create_grid([-2, -2, -2], [2, 2, 2], resolution=16)  # all empty
    n, s = 8, 32
    rays_o = jnp.tile(jnp.asarray([[-3.0, 0, 0]]), (n, 1))
    rays_d = jnp.tile(jnp.asarray([[1.0, 0, 0]]), (n, 1))
    z_uniform = jnp.broadcast_to(jnp.linspace(0.1, 6.0, s), (n, s))
    z = occupancy_guided_z_vals(
        grid, rays_o, rays_d, z_uniform, jax.random.key(3)
    )
    zc = np.asarray(z)
    assert np.all(np.isfinite(zc))
    # roughly uniform coverage when nothing is occupied
    assert zc.mean() > 2.0 and zc.mean() < 4.0
