"""Fused Pallas MLP kernel parity tests (interpret mode on CPU).

The kernel runs in bf16 on the MXU; parity tolerance vs the fp32 XLA
path is bf16-level.  On CPU both paths run the same bf16 casts inside
the interpreter, so agreement is tight.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from intrinsicnerf_tpu.models.mlp import MLPConfig, eval_points, init_mlp_params
from intrinsicnerf_tpu.ops.fused_mlp import fused_eval_points, pack_weights


@pytest.fixture(scope="module")
def setup():
    mcfg = MLPConfig(
        pos_scalar_factor=10.0,
        enable_semantic=True,
        num_semantic_classes=7,
        compute_dtype=jnp.bfloat16,
    )
    params = init_mlp_params(jax.random.key(0), mcfg)
    pts = jax.random.normal(jax.random.key(1), (8, 16, 3))
    dirs = jax.random.normal(jax.random.key(2), (8, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return mcfg, params, pts, dirs


def test_forward_parity(setup):
    mcfg, params, pts, dirs = setup
    ref = eval_points(params, mcfg, pts, dirs)
    fused = fused_eval_points(params, mcfg, pts, dirs)
    for name in ("sigma", "albedo", "shading", "residual", "sem_logits", "rgb"):
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(fused, name))
        scale = max(np.abs(a).max(), 1.0)
        assert np.max(np.abs(a - b)) / scale < 2e-2, name


def test_gradient_parity(setup):
    from jax.flatten_util import ravel_pytree

    mcfg, params, pts, dirs = setup

    def mk_loss(f):
        def loss(p):
            r = f(p, mcfg, pts, dirs)
            return (
                jnp.mean(r.rgb**2)
                + 0.01 * jnp.mean(r.sigma**2)
                + 0.01 * jnp.mean(r.sem_logits**2)
            )

        return loss

    g1, _ = ravel_pytree(jax.grad(mk_loss(eval_points))(params))
    g2, _ = ravel_pytree(jax.grad(mk_loss(fused_eval_points))(params))
    g1, g2 = np.asarray(g1), np.asarray(g2)
    cos = g1 @ g2 / (np.linalg.norm(g1) * np.linalg.norm(g2) + 1e-12)
    assert cos > 0.999, cos
    assert np.abs(g1 - g2).max() < 1e-2 * max(np.abs(g1).max(), 1e-3)


def test_pack_weights_shapes(setup):
    mcfg, params, _, _ = setup
    packed = pack_weights(params, mcfg)
    assert packed["w0"].shape == (128, 256)
    assert packed["w5h"].shape == (256, 256)
    assert packed["b0"].shape == (1, 256)
    # head columns land in their slots
    assert float(jnp.abs(packed["w_a2"][:, 0]).max()) == 0.0  # sigma col empty
    assert float(jnp.abs(packed["w_a2"][:, 1:4]).max()) > 0.0


def test_dispatch_flag(setup):
    """eval_points with use_fused_kernel routes through the kernel and
    matches the plain path."""
    mcfg, params, pts, dirs = setup
    import dataclasses

    fcfg = dataclasses.replace(mcfg, use_fused_kernel=True)
    a = eval_points(params, mcfg, pts, dirs)
    b = eval_points(params, fcfg, pts, dirs)
    np.testing.assert_allclose(
        np.asarray(a.rgb), np.asarray(b.rgb), atol=2e-2
    )
    # unsupported shapes fall back to the XLA path without error
    small = MLPConfig(depth=4, width=32, skips=(2,), use_fused_kernel=True)
    p_small = init_mlp_params(jax.random.key(3), small)
    out = eval_points(p_small, small, pts, dirs)
    assert np.isfinite(np.asarray(out.rgb)).all()


def test_pe_constants_match_reference_encoding(setup):
    """The in-kernel closed form ``m*sin(in8 @ F) + (1-m)*(in8 @ F)``
    must reproduce ``positional_encoding`` (reference ordering,
    ``semantic_nerf.py:14-65``) in the packed [pos | dir@64] layout."""
    from intrinsicnerf_tpu.core.pe import positional_encoding
    from intrinsicnerf_tpu.ops.fused_mlp import (
        DIR_OFF,
        build_in8,
        pe_constants,
    )

    mcfg, _, pts, dirs = setup
    in8 = build_in8(mcfg, pts, dirs)
    F, m = pe_constants(mcfg)
    z = in8 @ F
    feat = m * jnp.sin(z) + (1.0 - m) * z

    pe_pos = positional_encoding(
        pts.reshape(-1, 3), mcfg.n_freqs_pos,
        scalar_factor=mcfg.pos_scalar_factor,
    )
    n, s, _ = pts.shape
    pe_dir = jnp.broadcast_to(
        positional_encoding(dirs, mcfg.n_freqs_dir)[:, None, :],
        (n, s, 27),
    ).reshape(n * s, 27)

    np.testing.assert_allclose(
        np.asarray(feat[:, :63]), np.asarray(pe_pos), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(feat[:, DIR_OFF : DIR_OFF + 27]), np.asarray(pe_dir), atol=2e-5
    )
    # padding columns are exactly zero
    assert float(jnp.abs(feat[:, 63:DIR_OFF]).max()) == 0.0
    assert float(jnp.abs(feat[:, DIR_OFF + 27 :]).max()) == 0.0
