"""Tests for the intrinsic losses against independent numpy formulas
(reference behavior at SSR/training/training_utils.py:124-207)."""

import numpy as np
import jax.numpy as jnp

from intrinsicnerf_tpu.core.losses import (
    IntrinsicLosses,
    chroma_loss,
    chroma_pair_weights,
    compute_intrinsic_losses,
    img2mse,
    intensity_loss,
    mse2psnr,
    residual_loss,
    semantic_cross_entropy,
    semantic_entropy,
)


def np_chroma(c):
    s = c.sum(-1) + 1e-5
    return c[:, 0] / s, c[:, 1] / s


def test_chroma_loss(rng):
    a = rng.uniform(size=(32, 3)).astype(np.float32)
    b = rng.uniform(size=(32, 3)).astype(np.float32)
    r1, g1 = np_chroma(a)
    r2, g2 = np_chroma(b)
    want = ((r1 - r2) ** 2).mean() + ((g1 - g2) ** 2).mean()
    got = float(chroma_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_pair_weights(rng):
    a = rng.uniform(size=(16, 3)).astype(np.float32)
    b = rng.uniform(size=(16, 3)).astype(np.float32)
    lbl = rng.integers(0, 3, size=16)
    same = (lbl == lbl).astype(np.float32)
    w, inv_w = chroma_pair_weights(jnp.asarray(a), jnp.asarray(b), jnp.asarray(same))
    r1, g1 = np_chroma(a)
    r2, g2 = np_chroma(b)
    d2 = (r1 - r2) ** 2 + (g1 - g2) ** 2
    np.testing.assert_allclose(np.asarray(w), np.exp(-60 * d2) * same, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(inv_w), d2, rtol=1e-5)


def test_full_intrinsic_losses_structure(rng):
    n2 = 64  # 2N
    albedo = jnp.asarray(rng.uniform(size=(n2, 3)).astype(np.float32))
    shading = jnp.asarray(rng.uniform(size=(n2,)).astype(np.float32))
    residual = jnp.asarray(rng.uniform(size=(n2, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(size=(n2, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, size=n2))
    out = compute_intrinsic_losses(albedo, shading, residual, gt, labels)
    assert isinstance(out, IntrinsicLosses)
    for v in out:
        assert np.isfinite(float(v)) and float(v) >= 0
    # intensity loss exact
    np.testing.assert_allclose(
        float(out.intensity),
        (np.asarray(gt).mean() - np.asarray(albedo).mean()) ** 2,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(out.residual), (np.asarray(residual) ** 2).mean(), rtol=1e-5
    )


def test_identical_pairs_zero_sparsity(rng):
    """If neighbor == original, reflectance sparsity must vanish."""
    n = 16
    a = rng.uniform(size=(n, 3)).astype(np.float32)
    albedo = jnp.asarray(np.concatenate([a, a], 0))
    sh = rng.uniform(size=(n,)).astype(np.float32)
    shading = jnp.asarray(np.concatenate([sh, sh], 0))
    res = jnp.zeros((2 * n, 3))
    gt = jnp.asarray(np.concatenate([a, a], 0))
    labels = jnp.zeros(2 * n, dtype=jnp.int32)
    out = compute_intrinsic_losses(albedo, shading, res, gt, labels)
    assert float(out.reflect_sparsity) < 1e-10
    assert float(out.shading_smooth) < 1e-10
    assert float(out.residual) == 0.0


def test_label_mask_gates_sparsity(rng):
    """Pairs with different labels contribute zero sparsity weight."""
    n = 8
    albedo = jnp.asarray(rng.uniform(size=(2 * n, 3)).astype(np.float32))
    shading = jnp.asarray(rng.uniform(size=(2 * n,)).astype(np.float32))
    res = jnp.zeros((2 * n, 3))
    gt = jnp.asarray(np.tile(rng.uniform(size=(1, 3)).astype(np.float32), (2 * n, 1)))
    labels = jnp.asarray(np.concatenate([np.zeros(n), np.ones(n)]).astype(np.int32))
    out = compute_intrinsic_losses(albedo, shading, res, gt, labels)
    assert float(out.reflect_sparsity) == 0.0


def test_semantic_ce_matches_torch_semantics(rng):
    import torch

    logits = rng.normal(size=(32, 7)).astype(np.float32)
    labels = rng.integers(0, 8, size=32)  # 0 = void
    got = float(semantic_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    want = torch.nn.CrossEntropyLoss(ignore_index=-1)(
        torch.from_numpy(logits), torch.from_numpy(labels - 1)
    ).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_semantic_ce_all_void():
    logits = jnp.zeros((4, 3))
    labels = jnp.zeros(4, dtype=jnp.int32)
    assert float(semantic_cross_entropy(logits, labels)) == 0.0


def test_entropy_uniform_max(rng):
    c = 10
    uniform = jnp.zeros((2, c))
    e = np.asarray(semantic_entropy(uniform))
    np.testing.assert_allclose(e, np.log(c), rtol=1e-5)
    peaked = jnp.asarray(np.eye(c, dtype=np.float32)[:2] * 100)
    assert np.all(np.asarray(semantic_entropy(peaked)) < 0.01)


def test_psnr():
    np.testing.assert_allclose(float(mse2psnr(jnp.asarray(0.01))), 20.0, rtol=1e-5)
    np.testing.assert_allclose(
        float(img2mse(jnp.ones((4, 3)), jnp.zeros((4, 3)))), 1.0
    )
