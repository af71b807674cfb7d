"""Differentiable alpha compositing of intrinsic radiance fields.

Behavioral parity target: ``raw2outputs``
(``/root/reference/SSR/models/model_utils.py:39-116``; object dup at
``object_level/run_nerf.py:359-412``):

- ``alpha = 1 - exp(-relu(sigma + noise) * dist)``, last dist = 1e10,
  dists scaled by ``|ray_d|``.
- ``weights = alpha * cumprod_exclusive(1 - alpha + 1e-10)``.
- composites rgb / albedo / residual (3ch), shading (1ch), semantic
  logits (Cch), depth, ``disp = 1 / max(1e-10, depth/acc)``, acc.
- white-background compensation on rgb/albedo/shading/semantics.
- rgb is NOT squashed here — it is already composed in the MLP as
  ``albedo * shading + residual``.

TPU-first design: the model returns a *struct* of heads instead of the
reference's packed raw vector, so compositing is one weighted reduction
per head; XLA fuses the cumprod scan and the reductions into a single
pass over the sample axis.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RawOutputs(NamedTuple):
    """Per-sample model predictions: shapes ``[..., S, C]`` / ``[..., S]``."""

    rgb: jnp.ndarray  # [..., S, 3] (already albedo*shading + residual)
    sigma: jnp.ndarray  # [..., S]
    albedo: jnp.ndarray  # [..., S, 3]
    shading: jnp.ndarray  # [..., S]
    residual: jnp.ndarray  # [..., S, 3]
    sem_logits: Optional[jnp.ndarray] = None  # [..., S, C]
    endpoint_feat: Optional[jnp.ndarray] = None  # [..., S, F]


class RenderMaps(NamedTuple):
    """Composited per-ray maps."""

    rgb: jnp.ndarray  # [..., 3]
    disp: jnp.ndarray  # [...]
    acc: jnp.ndarray  # [...]
    weights: jnp.ndarray  # [..., S]
    depth: jnp.ndarray  # [...]
    albedo: jnp.ndarray  # [..., 3]
    shading: jnp.ndarray  # [...]
    residual: jnp.ndarray  # [..., 3]
    sem_logits: Optional[jnp.ndarray] = None  # [..., C]
    endpoint_feat: Optional[jnp.ndarray] = None  # [..., F]
    sigma: Optional[jnp.ndarray] = None  # [..., S] raw pre-noise density
    # (the reference's raw[..., 3], logged as TB histograms
    # trans_coarse/trans_fine at trainer.py:1023-1028; XLA dead-code
    # eliminates it from consumers that don't read it)


def exclusive_transmittance(alpha: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """``T_i = prod_{j<i} (1 - alpha_j + eps)`` (exclusive cumprod)."""
    trans = jnp.cumprod(1.0 - alpha + eps, axis=-1)
    return jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)


_EPS = 1e-10


@jax.custom_vjp
def alpha_to_weights(alpha: jnp.ndarray) -> jnp.ndarray:
    """``w_i = alpha_i * prod_{j<i}(1 - alpha_j + eps)`` with a
    closed-form VJP.

    Autodiff through the cumprod emits a second scan plus divisions in
    the backward; the exact gradient is just one reversed exclusive
    cumsum:  ``d w_k / d alpha_i = -w_k / c_i`` for ``i < k`` (where
    ``c_i = 1 - alpha_i + eps``) and ``T_i`` on the diagonal, so
    ``galpha_i = gw_i T_i - (sum_{k>i} gw_k w_k) / c_i``.
    """
    return alpha * exclusive_transmittance(alpha)


def _a2w_fwd(alpha):
    t = exclusive_transmittance(alpha)
    w = alpha * t
    return w, (alpha, t, w)


def _a2w_bwd(res, gw):
    alpha, t, w = res
    gww = gw * w
    # suffix_i = sum_{k>i} gw_k w_k  (exclusive reversed cumsum)
    suffix = jnp.cumsum(gww[..., ::-1], axis=-1)[..., ::-1] - gww
    # maximum barrier: XLA may reassociate `1 - alpha + eps` into
    # `(1 + eps) - alpha` == exactly 0 at alpha == 1 (fp32 rounds
    # 1+1e-10 back to 1), which turns the division into 0/0 under jit
    # only.  The suffix carries the same ~c_i factor, so the clamped
    # quotient stays bounded.
    c = jnp.maximum(1.0 - alpha + _EPS, _EPS)
    galpha = gw * t - suffix / c
    return (galpha,)


alpha_to_weights.defvjp(_a2w_fwd, _a2w_bwd)


def composite(
    raw: RawOutputs,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
    white_bkgd: bool = False,
) -> RenderMaps:
    """Composite per-sample predictions into per-ray maps.

    z_vals: ``[..., S]`` sorted depths; rays_d: ``[..., 3]`` (possibly
    non-unit — dists are scaled by its norm).  ``noise`` is optional
    pre-drawn gaussian noise on sigma (``raw_noise_std`` semantics,
    train only).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    sigma = raw.sigma
    if noise is not None:
        sigma = sigma + noise
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)

    weights = alpha_to_weights(alpha)

    def comp_vec(x):  # [..., S, C] -> [..., C]
        return jnp.sum(weights[..., None] * x, axis=-2)

    def comp_scalar(x):  # [..., S] -> [...]
        return jnp.sum(weights * x, axis=-1)

    rgb_map = comp_vec(raw.rgb)
    albedo_map = comp_vec(raw.albedo)
    shading_map = comp_scalar(raw.shading)
    residual_map = comp_vec(raw.residual)
    sem_map = comp_vec(raw.sem_logits) if raw.sem_logits is not None else None
    feat_map = (
        comp_vec(raw.endpoint_feat) if raw.endpoint_feat is not None else None
    )

    depth_map = comp_scalar(z_vals)
    acc_map = jnp.sum(weights, axis=-1)
    # identical to the reference's 1/max(1e-10, depth/acc) wherever
    # acc > 0; the acc == 0 ray (0/0 -> NaN in the reference) is mapped
    # to the 1e-10 clamp branch instead so downstream stays finite
    safe_acc = jnp.where(acc_map > 0, acc_map, 1.0)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / safe_acc)

    if white_bkgd:
        rest = 1.0 - acc_map
        rgb_map = rgb_map + rest[..., None]
        albedo_map = albedo_map + rest[..., None]
        shading_map = shading_map + rest
        if sem_map is not None:
            sem_map = sem_map + rest[..., None]

    return RenderMaps(
        rgb=rgb_map,
        disp=disp_map,
        acc=acc_map,
        weights=weights,
        depth=depth_map,
        albedo=albedo_map,
        shading=shading_map,
        residual=residual_map,
        sem_logits=sem_map,
        endpoint_feat=feat_map,
        sigma=raw.sigma,
    )
