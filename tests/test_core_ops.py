"""Golden-value and property tests for the core math layer.

Each test checks the jitted JAX op against an independent numpy
implementation written directly from the reference formulas
(SURVEY.md §2.1 C1/C3/C5/C6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intrinsicnerf_tpu.core.pe import positional_encoding, pe_output_dim
from intrinsicnerf_tpu.core.rays import camera_ray_dirs, create_rays, ndc_rays
from intrinsicnerf_tpu.core.sampling import (
    stratified_z_vals,
    perturb_z_vals,
    sample_pdf,
    merge_z_vals,
    merge_sorted_z_vals,
)
from intrinsicnerf_tpu.core.compositing import RawOutputs, composite


# ---------------------------------------------------------------- PE


def np_positional_encoding(x, num_freqs, scalar_factor=1.0):
    x = x / scalar_factor
    out = [x]
    for k in range(num_freqs):
        f = 2.0**k
        out.append(np.sin(x * f))
        out.append(np.cos(x * f))
    return np.concatenate(out, axis=-1)


def test_pe_matches_reference_formula(rng):
    x = rng.normal(size=(17, 3)).astype(np.float32)
    got = np.asarray(positional_encoding(jnp.asarray(x), 10, scalar_factor=10.0))
    want = np_positional_encoding(x, 10, scalar_factor=10.0)
    assert got.shape == (17, pe_output_dim(10))
    # fp32 sin/cos at args up to 2^9*|x| carries ~ulp(arg) absolute error
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_pe_dims():
    assert pe_output_dim(10) == 63
    assert pe_output_dim(4) == 27


# ---------------------------------------------------------------- rays


def test_camera_ray_dirs_opencv_center_pixel():
    h, w = 4, 6
    fx = fy = 2.0
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    d = np.asarray(camera_ray_dirs(h, w, fx, fy, cx, cy, "opencv"))
    # x = (col - cx)/fx, y = (row - cy)/fy
    np.testing.assert_allclose(
        d[2, 3][:2], [(3 - cx) / fx, (2 - cy) / fy], rtol=1e-6
    )
    np.testing.assert_allclose(d[..., 2], 1.0)
    d_gl = np.asarray(camera_ray_dirs(h, w, fx, fy, cx, cy, "opengl"))
    np.testing.assert_allclose(d_gl[..., 2], -1.0)
    np.testing.assert_allclose(d_gl[..., 1], -d[..., 1])


def test_create_rays_layout(rng):
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [1.0, 2.0, 3.0]
    rays = np.asarray(
        create_rays(jnp.asarray(c2w), 8, 8, 4.0, 4.0, 3.5, 3.5, 0.1, 10.0)
    )
    assert rays.shape == (1, 64, 11)
    np.testing.assert_allclose(rays[0, :, 0:3], [[1.0, 2.0, 3.0]] * 64)
    np.testing.assert_allclose(rays[0, :, 6], 0.1, rtol=1e-6)
    np.testing.assert_allclose(rays[0, :, 7], 10.0, rtol=1e-6)
    # viewdirs unit-norm
    np.testing.assert_allclose(
        np.linalg.norm(rays[0, :, 8:11], axis=-1), 1.0, rtol=1e-5
    )


def test_create_rays_rotation(rng):
    # 90 deg rotation about x: camera +z maps to world +y (opencv)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], dtype=np.float32)
    rays = np.asarray(create_rays(jnp.asarray(c2w), 3, 3, 1.0, 1.0, 1.0, 1.0, 0.0, 1.0))
    center = rays[0, 4, 3:6]  # center pixel dir = camera [0,0,1]
    np.testing.assert_allclose(center, [0.0, -1.0, 0.0] * np.array([0, 0, 0]) + c2w[:3, :3] @ [0, 0, 1], atol=1e-6)


def test_ndc_rays_near_plane():
    rays_o = jnp.asarray([[0.0, 0.0, -4.0]])
    rays_d = jnp.asarray([[0.0, 0.0, -1.0]])
    o, d = ndc_rays(8, 8, 4.0, 1.0, rays_o, rays_d)
    # on-axis ray stays on-axis; o2 = 1 + 2*near/oz with oz=-near -> -1
    np.testing.assert_allclose(np.asarray(o)[0], [0.0, 0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d)[0][:2], [0.0, 0.0], atol=1e-6)


# ---------------------------------------------------------------- sampling


def test_stratified_bounds_and_monotone(rng):
    near = jnp.full((5, 1), 2.0)
    far = jnp.full((5, 1), 6.0)
    z = stratified_z_vals(near, far, 64)
    z = np.asarray(jnp.broadcast_to(z, (5, 64)))
    np.testing.assert_allclose(z[:, 0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(z[:, -1], 6.0, rtol=1e-6)
    assert np.all(np.diff(z, axis=-1) > 0)

    zp = np.asarray(perturb_z_vals(jnp.asarray(z), jax.random.key(0)))
    # jittered values stay within their intervals -> still monotone
    assert np.all(np.diff(zp, axis=-1) > 0)
    assert np.all(zp >= 2.0) and np.all(zp <= 6.0)


def np_sample_pdf(bins, weights, u):
    """Reference-formula inverse CDF (searchsorted right)."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    out = np.empty_like(u)
    for i in range(bins.shape[0]):
        inds = np.searchsorted(cdf[i], u[i], side="right")
        below = np.maximum(inds - 1, 0)
        above = np.minimum(inds, cdf.shape[-1] - 1)
        cg0, cg1 = cdf[i][below], cdf[i][above]
        bg0, bg1 = bins[i][below], bins[i][above]
        denom = cg1 - cg0
        denom = np.where(denom < 1e-5, 1.0, denom)
        t = (u[i] - cg0) / denom
        out[i] = bg0 + t * (bg1 - bg0)
    return out


def test_sample_pdf_matches_searchsorted(rng):
    n, b, f = 16, 63, 128
    bins = np.sort(rng.uniform(0.1, 10.0, size=(n, b)).astype(np.float32), axis=-1)
    weights = rng.uniform(0.0, 1.0, size=(n, b - 1)).astype(np.float32)
    u = rng.uniform(0.0, 1.0, size=(n, f)).astype(np.float32)
    got = np.asarray(
        sample_pdf(jnp.asarray(bins), jnp.asarray(weights), f, u=jnp.asarray(u))
    )
    want = np_sample_pdf(bins, weights, u)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # samples fall inside the bin range
    assert np.all(got >= bins[:, :1] - 1e-5) and np.all(got <= bins[:, -1:] + 1e-5)


def test_sample_pdf_det_linspace():
    bins = jnp.linspace(0.0, 1.0, 11)[None].repeat(2, 0)
    weights = jnp.ones((2, 10))
    s = np.asarray(sample_pdf(bins, weights, 5, det=True))
    # uniform weights + det -> evenly spaced samples over [0, 1]
    np.testing.assert_allclose(s[0], np.linspace(0, 1, 5), atol=1e-5)


def test_merge_z_vals_sorted(rng):
    a = jnp.asarray(np.sort(rng.uniform(size=(4, 8)), -1))
    b = jnp.asarray(rng.uniform(size=(4, 5)))
    m = np.asarray(merge_z_vals(a, b))
    assert m.shape == (4, 13)
    assert np.all(np.diff(m, axis=-1) >= 0)


def test_merge_sorted_z_vals_matches_sort(rng):
    """Rank merge of two sorted arrays == sort of their concatenation."""
    a = np.sort(rng.uniform(size=(16, 64)).astype(np.float32), -1)
    b = np.sort(rng.uniform(size=(16, 128)).astype(np.float32), -1)
    got = np.asarray(merge_sorted_z_vals(jnp.asarray(a), jnp.asarray(b)))
    want = np.sort(np.concatenate([a, b], -1), -1)
    np.testing.assert_array_equal(got, want)


def test_merge_sorted_z_vals_ties():
    """Duplicate values across and within inputs still yield a valid
    permutation (every slot filled exactly once)."""
    a = jnp.asarray([[0.0, 0.5, 0.5, 1.0]])
    b = jnp.asarray([[0.5, 0.5, 2.0]])
    got = np.asarray(merge_sorted_z_vals(a, b))
    np.testing.assert_array_equal(got, [[0.0, 0.5, 0.5, 0.5, 0.5, 1.0, 2.0]])


def test_sample_pdf_random_draws_sorted_and_distributed(rng):
    """Non-det sample_pdf returns per-ray *sorted* depths (the order
    statistics draw) whose empirical distribution matches the target
    pdf: mass in each bin ~ bin weight."""
    bins = np.linspace(0.0, 1.0, 5, dtype=np.float32)  # 4 intervals
    weights = np.asarray([[1.0, 0.0, 0.0, 3.0]], np.float32)
    n = 4096
    s = np.asarray(
        sample_pdf(
            jnp.asarray(bins[None]),
            jnp.asarray(weights),
            n,
            key=jax.random.key(3),
        )
    )[0]
    assert np.all(np.diff(s) >= 0)
    frac_last = np.mean(s >= 0.75)
    assert abs(frac_last - 0.75) < 0.03  # weight 3 of 4 -> ~75% of mass
    assert np.mean((s >= 0.25) & (s < 0.75)) < 0.02  # zero-weight bins


# ---------------------------------------------------------------- compositing


def np_composite(sigma, rgb, z_vals, rays_d):
    dists = np.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1], np.full_like(z_vals[..., :1], 1e10)], -1
    )
    dists = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    alpha = 1.0 - np.exp(-np.maximum(sigma, 0.0) * dists)
    ones = np.ones_like(alpha[..., :1])
    trans = np.cumprod(np.concatenate([ones, 1.0 - alpha + 1e-10], -1), -1)[..., :-1]
    weights = alpha * trans
    rgb_map = (weights[..., None] * rgb).sum(-2)
    depth = (weights * z_vals).sum(-1)
    acc = weights.sum(-1)
    disp = 1.0 / np.maximum(1e-10, depth / acc)
    return weights, rgb_map, depth, acc, disp


def _mk_raw(rng, n, s, c=0):
    return RawOutputs(
        rgb=jnp.asarray(rng.uniform(size=(n, s, 3)).astype(np.float32)),
        sigma=jnp.asarray(rng.normal(size=(n, s)).astype(np.float32)),
        albedo=jnp.asarray(rng.uniform(size=(n, s, 3)).astype(np.float32)),
        shading=jnp.asarray(rng.uniform(size=(n, s)).astype(np.float32)),
        residual=jnp.asarray(rng.uniform(size=(n, s, 3)).astype(np.float32)),
        sem_logits=(
            jnp.asarray(rng.normal(size=(n, s, c)).astype(np.float32)) if c else None
        ),
    )


def test_alpha_to_weights_closed_form_vjp(rng):
    """The closed-form VJP must match autodiff through the cumprod."""
    from intrinsicnerf_tpu.core.compositing import (
        alpha_to_weights,
        exclusive_transmittance,
    )

    alpha = jnp.asarray(
        rng.uniform(0.0, 0.999, size=(6, 24)).astype(np.float32)
    )
    gw = jnp.asarray(rng.normal(size=(6, 24)).astype(np.float32))

    def ref(a):
        return a * exclusive_transmittance(a)

    np.testing.assert_allclose(
        np.asarray(alpha_to_weights(alpha)), np.asarray(ref(alpha)),
        rtol=1e-6, atol=1e-7,
    )
    _, vjp_got = jax.vjp(alpha_to_weights, alpha)
    _, vjp_ref = jax.vjp(ref, alpha)
    np.testing.assert_allclose(
        np.asarray(vjp_got(gw)[0]), np.asarray(vjp_ref(gw)[0]),
        rtol=2e-4, atol=1e-5,
    )


def test_composite_matches_reference_formula(rng):
    n, s = 8, 32
    raw = _mk_raw(rng, n, s, c=5)
    z = jnp.asarray(
        np.sort(rng.uniform(0.1, 10.0, size=(n, s)).astype(np.float32), -1)
    )
    rays_d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    maps = composite(raw, z, rays_d)

    w, rgb, depth, acc, disp = np_composite(
        np.asarray(raw.sigma), np.asarray(raw.rgb), np.asarray(z), np.asarray(rays_d)
    )
    # atol 1e-5: fp32 exp/cumprod noise varies with XLA fusion across versions
    np.testing.assert_allclose(np.asarray(maps.weights), w, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(maps.rgb), rgb, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(maps.depth), depth, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(maps.acc), acc, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(maps.disp), disp, rtol=1e-4, atol=1e-5)
    # weights are a sub-probability measure
    assert np.all(np.asarray(maps.weights) >= 0)
    assert np.all(np.asarray(maps.acc) <= 1.0 + 1e-5)
    # semantic map composited with the same weights
    np.testing.assert_allclose(
        np.asarray(maps.sem_logits),
        (w[..., None] * np.asarray(raw.sem_logits)).sum(-2),
        rtol=1e-5,
        atol=1e-5,
    )


def test_composite_white_bkgd(rng):
    n, s = 4, 16
    raw = _mk_raw(rng, n, s)
    # zero density -> pure background
    raw = raw._replace(sigma=jnp.full((n, s), -100.0))
    z = jnp.asarray(np.sort(rng.uniform(0.1, 4.0, size=(n, s)).astype(np.float32), -1))
    rays_d = jnp.asarray(np.ones((n, 3), np.float32))
    maps = composite(raw, z, rays_d, white_bkgd=True)
    np.testing.assert_allclose(np.asarray(maps.rgb), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(maps.albedo), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(maps.shading), 1.0, atol=1e-5)


def test_composite_grad_flows(rng):
    n, s = 4, 16
    z = jnp.asarray(np.sort(rng.uniform(0.1, 4.0, size=(n, s)).astype(np.float32), -1))
    rays_d = jnp.asarray(np.ones((n, 3), np.float32))

    def f(sig):
        raw = _mk_raw(np.random.default_rng(0), n, s)._replace(sigma=sig)
        return jnp.sum(composite(raw, z, rays_d).rgb)

    g = jax.grad(f)(jnp.asarray(rng.normal(size=(n, s)).astype(np.float32)))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)
