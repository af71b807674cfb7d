"""Image, semantic, and distance-aware intrinsic-decomposition losses.

Behavioral parity targets:
- ``compute_intrinsic_loss`` and helpers
  (``/root/reference/SSR/training/training_utils.py:124-207``; object
  variant with object-mask pair weighting at
  ``object_level/run_nerf_helpers.py:11-86``).
- semantic cross-entropy with void-shift (label-1, ignore -1)
  (``trainer.py:858-865``).

Pairing contract: a training batch of ``2N`` rays is the concatenation
``[originals(N), neighbors(N)]`` — ``batch[i]`` and ``batch[i+N]`` are an
8-neighborhood pixel pair (``SSR/models/rays.py:153-172``).  The "far"
loss pairs non-adjacent pixels by comparing the first and second quarter
of the original half.  All losses are pure functions of the composited
maps, so under sharding they run shard-local (per-device pairs) and only
scalar means cross the mesh.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def chromaticity(color: jnp.ndarray, eps: float = 1e-5):
    """(r, g) chromaticity: ``r = R/(R+G+B+eps)``, ``g = G/(...)``."""
    s = jnp.sum(color, axis=-1) + eps
    return color[..., 0] / s, color[..., 1] / s


def chroma_loss(color1: jnp.ndarray, color2: jnp.ndarray) -> jnp.ndarray:
    """Mean squared chromaticity difference (albedo vs gt rgb)."""
    r1, g1 = chromaticity(color1)
    r2, g2 = chromaticity(color2)
    return jnp.mean((r1 - r2) ** 2) + jnp.mean((g1 - g2) ** 2)


def residual_loss(residual: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(residual**2)


def chroma_pair_weights(color1, color2, same_mask):
    """Pairwise weights from gt chromaticity difference.

    ``w = exp(-60 * d2) * same_mask`` drives reflectance sparsity
    (similar chroma -> albedos pulled together); ``inv_w = d2`` drives
    shading smoothness (different chroma -> shading pulled together).
    ``same_mask`` is 1 where the pair is comparable (same semantic label
    for scenes, product of object masks for objects).
    """
    r1, g1 = chromaticity(color1)
    r2, g2 = chromaticity(color2)
    d2 = (r1 - r2) ** 2 + (g1 - g2) ** 2
    w = jnp.exp(-60.0 * d2) * same_mask
    return w, d2


def chroma_pair_weights_masked(color1, color2, mask1, mask2):
    """Object-level variant: both weights gated by the object-mask product
    (``object_level/run_nerf_helpers.py:27-36``)."""
    r1, g1 = chromaticity(color1)
    r2, g2 = chromaticity(color2)
    d2 = (r1 - r2) ** 2 + (g1 - g2) ** 2
    m = mask1 * mask2
    return jnp.exp(-60.0 * d2) * m, d2 * m


def depth_pair_weight(disp1, disp2, acc1, acc2):
    """Exists in the reference but is always passed as 1 to the losses
    (``training_utils.py:153-160,199-205``).  Kept for completeness."""
    mask = acc1 * acc2
    dist = jnp.sqrt((disp1 - disp2) ** 2)
    dist = jnp.where(jnp.isnan(dist), jnp.ones_like(dist), dist)
    return jax.lax.stop_gradient(mask * jnp.exp(-100.0 * dist))


def reflect_sparsity_loss(albedo1, albedo2, w):
    return jnp.mean(w * jnp.sum((albedo1 - albedo2) ** 2, axis=-1))


def shading_smooth_loss(shading1, shading2, inv_w):
    return jnp.mean(inv_w * (shading1 - shading2) ** 2)


def intensity_loss(gt_rgb, albedo):
    return (jnp.mean(gt_rgb) - jnp.mean(albedo)) ** 2


class IntrinsicLosses(NamedTuple):
    chroma: jnp.ndarray
    residual: jnp.ndarray
    reflect_sparsity: jnp.ndarray
    shading_smooth: jnp.ndarray
    far_reflect: jnp.ndarray
    intensity: jnp.ndarray


def compute_intrinsic_losses(
    albedo: jnp.ndarray,  # [2N, 3]
    shading: jnp.ndarray,  # [2N]
    residual: jnp.ndarray,  # [2N, 3]
    gt_rgb: jnp.ndarray,  # [2N, 3]
    pair_label: jnp.ndarray,  # [2N] semantic label (scene) or object mask (object)
    mask_mode: str = "label",  # "label": same-label indicator; "mask": mask product
) -> IntrinsicLosses:
    """All six intrinsic-prior losses on a neighbor-paired batch.

    Mirrors ``compute_intrinsic_loss`` exactly, including the quarter-
    split "far" pairing (originals[:N/2] vs originals[N/2:]).
    """
    n = albedo.shape[0] // 2
    a1, a2 = albedo[:n], albedo[-n:]
    s1, s2 = shading[:n], shading[-n:]
    c1, c2 = gt_rgb[:n], gt_rgb[-n:]
    l1, l2 = pair_label[:n], pair_label[-n:]

    li = intensity_loss(gt_rgb, albedo)
    lr = residual_loss(residual)
    lc = chroma_loss(albedo, gt_rgb)

    if mask_mode == "label":
        same = (l1 == l2).astype(albedo.dtype)
        w, inv_w = chroma_pair_weights(c1, c2, same)
    else:
        w, inv_w = chroma_pair_weights_masked(c1, c2, l1, l2)

    lsp = reflect_sparsity_loss(a1, a2, w)
    lsm = shading_smooth_loss(s1, s2, inv_w)

    m = n // 2  # far pairs: non-adjacent originals
    if mask_mode == "label":
        same_far = (l1[:m] == l1[-m:]).astype(albedo.dtype)
        w_far, _ = chroma_pair_weights(c1[:m], c1[-m:], same_far)
    else:
        w_far, _ = chroma_pair_weights_masked(c1[:m], c1[-m:], l1[:m], l1[-m:])
    lfar = reflect_sparsity_loss(a1[:m], a1[-m:], w_far)

    return IntrinsicLosses(
        chroma=lc,
        residual=lr,
        reflect_sparsity=lsp,
        shading_smooth=lsm,
        far_reflect=lfar,
        intensity=li,
    )


def semantic_cross_entropy(
    logits: jnp.ndarray,  # [N, C] composited semantic logits
    labels: jnp.ndarray,  # [N] raw labels; 0 = void
    void_shift: bool = True,
) -> jnp.ndarray:
    """CE with void class ignored: ``CE(logits, label-1, ignore=-1)``.

    Matches ``nn.CrossEntropyLoss(ignore_index=-1)(logits, label-1)``
    (mean over non-ignored elements; 0 if all ignored).
    """
    tgt = labels - 1 if void_shift else labels
    valid = tgt >= 0
    tgt_safe = jnp.maximum(tgt, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt_safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.sum(valid)
    return jnp.where(count > 0, jnp.sum(nll) / jnp.maximum(count, 1), 0.0)


def semantic_entropy(logits: jnp.ndarray) -> jnp.ndarray:
    """Per-ray predictive entropy (uncertainty), ``trainer.py:1245``."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.sum(-logp * jnp.exp(logp), axis=-1)
