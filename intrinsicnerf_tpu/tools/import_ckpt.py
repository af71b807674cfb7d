"""Import a trained reference PyTorch checkpoint into this framework.

The reference persists models as torch ``state_dict``s inside
``{:06d}.ckpt`` files (scene pipeline,
``/root/reference/SSR/training/trainer.py:1036-1048``: keys
``global_step``, ``network_coarse_state_dict``,
``network_fine_state_dict``, ``optimizer_state_dict``) or
``{:06d}.tar`` files (object pipeline,
``object_level/run_nerf.py:1035-1043``: ``network_fn_state_dict`` +
``network_fine_state_dict``).  This module maps those state_dicts onto
our parameter pytree (transposing torch's ``[out, in]`` Linear kernels
to our ``[in, out]`` layout), packs them for the fused kernel when the
architecture is eligible, and writes an Orbax checkpoint that the
Trainer's auto-resume picks up — so a reference user can bring a
trained model here for rendering, editing, mesh export, or continued
training.

Name mapping (scene ``Semantic_NeRF``,
``SSR/models/semantic_nerf.py:95-118``):

    pts_linears.{i}   -> trunk[i]          alpha_linear      -> sigma
    albedo_linear1/2  -> albedo1/albedo2   shading_linear1/2 -> shading1/2
    semantic_linear.0.0 -> sem1            semantic_linear.1 -> sem2
    feature_linear    -> feature           views_linears.0   -> views
    residual_linear   -> residual

Object-level ``NeRF`` (``object_level/run_nerf_helpers.py:268-279``)
names its *shading* head ``test_linear1/2`` and its *residual* head
``shading_linear`` (the math is identical — see models/mlp.py):

    test_linear1/2    -> shading1/2        shading_linear    -> residual

Adam moments are NOT imported: the reference keeps per-parameter torch
Adam state keyed by parameter *registration order*, which has no stable
correspondence once weights are re-packed; moments re-warm within ~100
steps at the reference LR schedule, which is noise against the 10k-step
checkpoint cadence.  ``global_step`` IS imported — into
``TrainState.step`` AND every optimizer step counter (the exp-decay LR
schedule reads the opt_state's count), so LR decay and loss schedules
resume at the right point.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np

from intrinsicnerf_tpu.models.mlp import MLPConfig, Params


def _np(t) -> np.ndarray:
    """torch tensor (any device/dtype) -> fp32 numpy."""
    return np.asarray(t.detach().cpu().numpy(), np.float32)


def _layer(sd: Dict[str, Any], name: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _np(sd[f"{name}.weight"]).T.copy(),  # [out,in] -> [in,out]
        "bias": _np(sd[f"{name}.bias"]),
    }


def detect_flavor(sd: Dict[str, Any]) -> str:
    """'scene' (Semantic_NeRF) or 'object' (object-level NeRF)."""
    if "residual_linear.weight" in sd or "semantic_linear.1.weight" in sd:
        return "scene"
    if "test_linear1.weight" in sd:
        return "object"
    raise ValueError(
        "unrecognized reference state_dict: expected Semantic_NeRF "
        "(residual_linear/semantic_linear) or object-level NeRF "
        f"(test_linear*) keys; got {sorted(sd)[:8]}..."
    )


def infer_arch(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Architecture facts encoded in the state_dict shapes."""
    depth = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("pts_linears.")
    )
    w0 = _np(sd["pts_linears.0.weight"])  # [W, input_ch]
    width, input_ch = w0.shape
    # skip layers consume [input_pts, h]: fan_in = W + input_ch
    skips = tuple(
        i - 1
        for i in range(1, depth)
        if _np(sd[f"pts_linears.{i}.weight"]).shape[1] == width + input_ch
    )
    # input_ch = 3 * (1 + 2*n_freqs)
    n_freqs_pos = (input_ch // 3 - 1) // 2
    wv = _np(sd["views_linears.0.weight"])  # [W/2, W + input_ch_views]
    in_ch_views = wv.shape[1] - width
    n_freqs_dir = (in_ch_views // 3 - 1) // 2
    enable_semantic = "semantic_linear.1.weight" in sd
    num_classes = (
        _np(sd["semantic_linear.1.weight"]).shape[0] if enable_semantic else 0
    )
    return {
        "depth": depth,
        "width": width,
        "skips": skips,
        "n_freqs_pos": n_freqs_pos,
        "n_freqs_dir": n_freqs_dir,
        "enable_semantic": enable_semantic,
        "num_semantic_classes": num_classes,
    }


def state_dict_to_params(sd: Dict[str, Any], flavor: Optional[str] = None) -> Params:
    """One reference state_dict -> our (unpacked) parameter pytree."""
    flavor = flavor or detect_flavor(sd)
    arch = infer_arch(sd)
    params: Params = {
        "trunk": [_layer(sd, f"pts_linears.{i}") for i in range(arch["depth"])]
    }
    params["sigma"] = _layer(sd, "alpha_linear")
    params["albedo1"] = _layer(sd, "albedo_linear1")
    params["albedo2"] = _layer(sd, "albedo_linear2")
    params["feature"] = _layer(sd, "feature_linear")
    params["views"] = _layer(sd, "views_linears.0")
    if flavor == "scene":
        params["shading1"] = _layer(sd, "shading_linear1")
        params["shading2"] = _layer(sd, "shading_linear2")
        params["residual"] = _layer(sd, "residual_linear")
        if arch["enable_semantic"]:
            params["sem1"] = _layer(sd, "semantic_linear.0.0")
            params["sem2"] = _layer(sd, "semantic_linear.1")
    else:  # object: shading head = test_linear*, residual head = shading_linear
        params["shading1"] = _layer(sd, "test_linear1")
        params["shading2"] = _layer(sd, "test_linear2")
        params["residual"] = _layer(sd, "shading_linear")
    return params


def load_reference_checkpoint(path: str):
    """Read a reference ``.ckpt``/``.tar`` -> (step, sd_coarse, sd_fine).

    ``sd_fine`` is None for coarse-only object checkpoints (N_importance
    0 trains no fine network).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu")
    step = int(ckpt.get("global_step", 0))
    if "network_coarse_state_dict" in ckpt:  # scene .ckpt
        return step, ckpt["network_coarse_state_dict"], ckpt[
            "network_fine_state_dict"
        ]
    if "network_fn_state_dict" in ckpt:  # object .tar
        return step, ckpt["network_fn_state_dict"], ckpt.get(
            "network_fine_state_dict"
        )
    raise ValueError(
        f"{path}: no network_coarse_state_dict/network_fn_state_dict key — "
        "not a reference IntrinsicNeRF checkpoint"
    )


def mlp_config_from_arch(
    arch: Dict[str, Any],
    pos_scalar_factor: float,
    compute_dtype=None,
    use_fused_kernel: Optional[bool] = None,
) -> MLPConfig:
    """MLPConfig for the imported weights.  Architecture facts come from
    the checkpoint itself; scene-scale normalization (``scalar_factor``,
    ``trainer.py:817``) and our compute-path knobs come from the caller's
    framework config."""
    import jax.numpy as jnp

    from intrinsicnerf_tpu.config import _fused_kernel_default

    if use_fused_kernel is None:
        use_fused_kernel = _fused_kernel_default(
            arch["depth"], arch["width"], True
        )
    return MLPConfig(
        depth=arch["depth"],
        width=arch["width"],
        # pass the inferred skips through verbatim: fabricating (4,) for
        # a skip-free checkpoint would silently mis-split trunk[5] in
        # pack_weights (no shape error, corrupted weights).  A non-(4,)
        # skip set simply fails packs_state and uses the XLA path.
        skips=arch["skips"],
        n_freqs_pos=arch["n_freqs_pos"],
        n_freqs_dir=arch["n_freqs_dir"],
        pos_scalar_factor=pos_scalar_factor,
        use_viewdirs=True,
        enable_semantic=arch["enable_semantic"],
        num_semantic_classes=arch["num_semantic_classes"],
        compute_dtype=compute_dtype if compute_dtype is not None else jnp.bfloat16,
        use_fused_kernel=use_fused_kernel,
    )


def import_reference_checkpoint(
    path: str,
    pos_scalar_factor: float = 10.0,
    mcfg: Optional[MLPConfig] = None,
    train_cfg=None,
    compute_dtype=None,
    use_fused_kernel: Optional[bool] = None,
) -> Tuple[Any, MLPConfig]:
    """Reference ckpt -> (TrainState, MLPConfig), ready to train/render.

    When ``mcfg`` is given (e.g. from the user's framework config) its
    architecture fields are cross-checked against the checkpoint; when
    omitted the config is inferred.  The returned state has packed
    params when the fused kernel is eligible, a fresh Adam state (see
    module docstring), and ``step = global_step`` from the checkpoint.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from intrinsicnerf_tpu.train.schedules import make_lr_schedule
    from intrinsicnerf_tpu.train.step import TrainConfig, TrainState, packs_state

    step, sd_c, sd_f = load_reference_checkpoint(path)
    arch = infer_arch(sd_c)
    if mcfg is None:
        # compute-path knobs (fused-kernel packing, dtype) must come from
        # the caller's framework config when one exists: the written
        # checkpoint's pytree structure (packed vs unpacked) has to match
        # what the Trainer configured from the same config will build,
        # or auto-resume fails with an Orbax structure mismatch
        mcfg = mlp_config_from_arch(
            arch, pos_scalar_factor, compute_dtype=compute_dtype,
            use_fused_kernel=use_fused_kernel,
        )
    else:
        got = {
            "depth": mcfg.depth,
            "width": mcfg.width,
            "skips": tuple(mcfg.skips),
            "n_freqs_pos": mcfg.n_freqs_pos,
            "n_freqs_dir": mcfg.n_freqs_dir,
            "enable_semantic": mcfg.enable_semantic,
            "num_semantic_classes": mcfg.num_semantic_classes,
        }
        want = dict(arch)
        if got != want:
            raise ValueError(
                f"framework MLPConfig {got} does not match the checkpoint's "
                f"architecture {want}; fix the config or drop --import flags"
            )

    pc = state_dict_to_params(sd_c)
    pf = state_dict_to_params(sd_f) if sd_f is not None else None
    if packs_state(mcfg):
        from intrinsicnerf_tpu.ops.fused_mlp import pack_weights

        pc = pack_weights(pc, mcfg)
        pf = pack_weights(pf, mcfg) if pf is not None else None
    else:
        to_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        pc = to_dev(pc)
        pf = to_dev(pf) if pf is not None else None

    tcfg = train_cfg if train_cfg is not None else TrainConfig()
    optimizer = optax.adam(make_lr_schedule(tcfg.lrate, tcfg.lrate_decay))
    opt_state = optimizer.init({"coarse": pc, "fine": pf})
    # Fast-forward every optimizer step counter to the imported step:
    # the exp-decay LR schedule reads the opt_state's count, not
    # TrainState.step, so a fresh count would resume a 200k-step
    # checkpoint at the un-decayed base LR (~6x too hot).  Adam's own
    # count moves too — with zero moments its bias correction briefly
    # (~50 steps) scales updates ~3x at the (correctly decayed) LR
    # while the moments re-warm, which is benign; a cold LR schedule is
    # not.
    opt_state = jax.tree_util.tree_map_with_path(
        lambda kp, leaf: (
            jnp.asarray(step, leaf.dtype)
            if kp
            and isinstance(kp[-1], jax.tree_util.GetAttrKey)
            and kp[-1].name == "count"
            else leaf
        ),
        opt_state,
    )
    state = TrainState(
        step=jnp.asarray(step, jnp.int32),
        params_coarse=pc,
        params_fine=pf,
        opt_state=opt_state,
    )
    return state, mcfg


def import_to_orbax(
    path: str,
    save_dir: str,
    pos_scalar_factor: float = 10.0,
    mcfg: Optional[MLPConfig] = None,
    train_cfg=None,
    compute_dtype=None,
    use_fused_kernel: Optional[bool] = None,
) -> Tuple[int, MLPConfig]:
    """Write the imported state as ``<save_dir>/checkpoints/<step>`` so
    ``Trainer``/CLI auto-resume (and the render_only/mesh/editing tools)
    find it like any native checkpoint.  Returns (step, mcfg)."""
    import os

    from intrinsicnerf_tpu.train.checkpoint import save_checkpoint

    state, mcfg = import_reference_checkpoint(
        path, pos_scalar_factor, mcfg=mcfg, train_cfg=train_cfg,
        compute_dtype=compute_dtype, use_fused_kernel=use_fused_kernel,
    )
    step = int(state.step)
    save_checkpoint(os.path.join(save_dir, "checkpoints"), state, step)
    return step, mcfg
