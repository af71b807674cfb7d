"""The intrinsic NeRF MLP: trunk + five heads, as pure functions over pytrees.

Behavioral parity target: ``Semantic_NeRF``
(``/root/reference/SSR/models/semantic_nerf.py:74-181``) and the
object-level ``NeRF`` (``object_level/run_nerf_helpers.py:247-325``,
identical math; its shading head is called ``test_linear*`` and its
residual head ``shading_linear`` there):

- trunk: D=8 layers of width W=256, ReLU, skip-concat ``[input_pts, h]``
  after layer index 4.
- heads off the trunk feature ``h``: sigma (1, linear), semantic
  (fc_block(W, W/2) + Linear(W/2, C), view-independent), albedo
  (W->W/2->3, sigmoid), shading (W->W/2->1, sigmoid).
- view branch: ``feature_linear(h)`` concat dir-PE -> Linear(W/2), ReLU
  -> residual (3, sigmoid).
- ``rgb = albedo * shading + residual`` computed *inside* the network.

TPU-first design: parameters are a flat dict of ``(kernel, bias)``
arrays (no framework Module); the apply function is shape-polymorphic
over leading batch dims and jit/vmap/shard_map-friendly.  All matmuls
are ``[B, K] @ [K, N]`` with K, N multiples of (or padded by XLA to)
MXU tiles; the optional ``compute_dtype=bfloat16`` runs the trunk in
bf16 while keeping params and head outputs in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from intrinsicnerf_tpu.core.pe import positional_encoding, pe_output_dim
from intrinsicnerf_tpu.core.compositing import RawOutputs

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    depth: int = 8
    width: int = 256
    skips: Tuple[int, ...] = (4,)
    n_freqs_pos: int = 10
    n_freqs_dir: int = 4
    pos_scalar_factor: float = 1.0  # 10.0 for Replica scenes, 1.0 for objects
    use_viewdirs: bool = True
    enable_semantic: bool = False
    num_semantic_classes: int = 0
    compute_dtype: Any = jnp.float32  # trunk matmul dtype (bf16 for speed)
    use_fused_kernel: bool = False  # Pallas fused trunk+heads (D=8/skip 4)

    @property
    def input_ch(self) -> int:
        return pe_output_dim(self.n_freqs_pos)

    @property
    def input_ch_views(self) -> int:
        return pe_output_dim(self.n_freqs_dir)


def _linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for kernel and bias (torch
    nn.Linear default — kept so training dynamics match the reference)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"kernel": w, "bias": b}


def init_mlp_params(key: jax.Array, cfg: MLPConfig) -> Params:
    if any(s >= cfg.depth - 1 for s in cfg.skips):
        raise ValueError(
            f"skip indices {cfg.skips} must be < depth-1 ({cfg.depth - 1}): the "
            "skip concat widens the trunk and must be consumed by a later layer"
        )
    keys = iter(jax.random.split(key, 32))
    W, D = cfg.width, cfg.depth
    in_ch, in_ch_views = cfg.input_ch, cfg.input_ch_views

    params: Params = {}
    trunk = []
    fan_in = in_ch
    for i in range(D):
        trunk.append(_linear_init(next(keys), fan_in, W))
        # the layer *after* a skip concat consumes [input_pts, h]
        fan_in = W + in_ch if i in cfg.skips else W
    params["trunk"] = trunk

    params["sigma"] = _linear_init(next(keys), W, 1)
    params["albedo1"] = _linear_init(next(keys), W, W // 2)
    params["albedo2"] = _linear_init(next(keys), W // 2, 3)
    params["shading1"] = _linear_init(next(keys), W, W // 2)
    params["shading2"] = _linear_init(next(keys), W // 2, 1)
    params["feature"] = _linear_init(next(keys), W, W)
    params["views"] = _linear_init(next(keys), W + in_ch_views, W // 2)
    params["residual"] = _linear_init(next(keys), W // 2, 3)
    if cfg.enable_semantic:
        assert cfg.num_semantic_classes > 0
        params["sem1"] = _linear_init(next(keys), W, W // 2)
        params["sem2"] = _linear_init(next(keys), W // 2, cfg.num_semantic_classes)
    return params


def count_params(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def _dense(p, x, dtype=None):
    w, b = p["kernel"], p["bias"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    return x @ w + b.astype(x.dtype)


def apply_mlp(
    params: Params,
    cfg: MLPConfig,
    pts_embedded: jnp.ndarray,  # [..., input_ch]
    dirs_embedded: Optional[jnp.ndarray],  # [..., input_ch_views]
    want_endpoint_feat: bool = False,
) -> RawOutputs:
    """Evaluate the network on embedded points/dirs; any leading batch dims."""
    cd = cfg.compute_dtype
    h = pts_embedded.astype(cd)
    inp = h
    for i, layer in enumerate(params["trunk"]):
        h = jax.nn.relu(_dense(layer, h, cd))
        if i in cfg.skips:
            h = jnp.concatenate([inp, h], axis=-1)

    h32 = h.astype(jnp.float32)
    sigma = _dense(params["sigma"], h32)[..., 0]
    albedo = jax.nn.sigmoid(
        _dense(params["albedo2"], jax.nn.relu(_dense(params["albedo1"], h32)))
    )
    shading = jax.nn.sigmoid(
        _dense(params["shading2"], jax.nn.relu(_dense(params["shading1"], h32)))
    )[..., 0]

    sem_logits = None
    if cfg.enable_semantic:
        sem_logits = _dense(
            params["sem2"], jax.nn.relu(_dense(params["sem1"], h32))
        )

    if cfg.use_viewdirs and dirs_embedded is not None:
        feature = _dense(params["feature"], h, cd)
        hv = jnp.concatenate([feature, dirs_embedded.astype(cd)], axis=-1)
        hv = jax.nn.relu(_dense(params["views"], hv, cd))
        hv32 = hv.astype(jnp.float32)
        residual = jax.nn.sigmoid(_dense(params["residual"], hv32))
    else:
        # plain-NeRF mode (reference's non-viewdirs ``output_linear``
        # branch): no view-dependent residual — radiance is purely
        # albedo*shading and the intrinsic losses degenerate gracefully
        residual = jnp.zeros_like(albedo)
        hv32 = h32

    rgb = albedo * shading[..., None] + residual

    return RawOutputs(
        rgb=rgb,
        sigma=sigma,
        albedo=albedo,
        shading=shading,
        residual=residual,
        sem_logits=sem_logits,
        endpoint_feat=hv32 if want_endpoint_feat else None,
    )


def eval_points(
    params: Params,
    cfg: MLPConfig,
    pts: jnp.ndarray,  # [N, S, 3] world-space sample positions
    viewdirs: Optional[jnp.ndarray],  # [N, 3] unit view directions
    want_endpoint_feat: bool = False,
) -> RawOutputs:
    """PE + MLP over a ray batch; the per-ray dir-PE is computed once and
    broadcast over the sample axis (reference re-embeds per point,
    ``model_utils.py:27-31`` — same values, less work)."""
    if (
        cfg.use_fused_kernel
        and not want_endpoint_feat
        and cfg.depth == 8
        and tuple(cfg.skips) == (4,)
        and cfg.use_viewdirs
        and viewdirs is not None
    ):
        from intrinsicnerf_tpu.ops.fused_mlp import (
            DIR_OFF,
            IN_W,
            OUT_W,
            fused_eval_points,
        )

        # the packed layout fits pos-PE below DIR_OFF, dir-PE in the
        # remainder, and sigma+heads+semantics in OUT_W output columns;
        # otherwise fall back to the XLA path
        if (
            cfg.input_ch <= DIR_OFF
            and cfg.input_ch_views <= IN_W - DIR_OFF
            and 8 + max(cfg.num_semantic_classes, 1) <= OUT_W
        ):
            return fused_eval_points(params, cfg, pts, viewdirs)
    from intrinsicnerf_tpu.ops.fused_mlp import is_packed, unpack_weights

    if is_packed(params):
        # packed training state reaching an XLA-path eval (endpoint_feat,
        # viewdirs-off, non-reference arch): slice back to the pytree
        params = unpack_weights(params, cfg)
    pe_pts = positional_encoding(
        pts, cfg.n_freqs_pos, scalar_factor=cfg.pos_scalar_factor
    )
    pe_dirs = None
    if cfg.use_viewdirs and viewdirs is not None:
        pe_dirs = positional_encoding(viewdirs, cfg.n_freqs_dir)
        pe_dirs = jnp.broadcast_to(
            pe_dirs[..., None, :], (*pts.shape[:-1], pe_dirs.shape[-1])
        )
    return apply_mlp(params, cfg, pe_pts, pe_dirs, want_endpoint_feat)
