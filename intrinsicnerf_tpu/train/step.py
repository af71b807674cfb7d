"""The fused training step: sample -> render -> losses -> Adam update.

Behavioral parity target: ``SSRTrainer.step``
(``/root/reference/SSR/training/trainer.py:851-1009``) and the
object-level loop body (``object_level/run_nerf.py:941-1028``):

- total loss = img(coarse+fine)
  + wgt_sem * CE(sem logits, label-1, ignore -1) * sem_available
  + 1 * chroma + w_res(step) * residual + w_n * reflect_sparsity
  + w_s * shading_smooth + w_f * far_reflect + w_i(step) * intensity
  + w_c * mse(albedo, cluster_target)   [both levels]
- cluster target computed without gradient from the *fine* albedo and
  fine semantic argmax (``trainer.py:913-920``).
- Adam with exp-decayed LR (the schedule lives in the optax chain).

TPU-first design: one jitted pure function with donated state covers
what the reference spreads over the python step, chunk loops and the
optimizer: pixel sampling happens on device from resident pools, both
MLP levels evaluate as large batched matmuls, and the only host
interaction is the scalar loss report.  Under the data mesh the same
function runs per-device on per-device ray pairs with gradient psum
(see ``parallel/``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from intrinsicnerf_tpu.cluster.assign import ClusterTable, dest_color
from intrinsicnerf_tpu.core.losses import (
    compute_intrinsic_losses,
    img2mse,
    mse2psnr,
    semantic_cross_entropy,
)
from intrinsicnerf_tpu.data.samplers import sample_ray_pairs
from intrinsicnerf_tpu.models.mlp import MLPConfig, Params
from intrinsicnerf_tpu.render.pipeline import RenderConfig, render_rays
from intrinsicnerf_tpu.train.schedules import loss_weight_schedule


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    n_rays: int = 512  # sampled pixels; the batch is 2x this after pairing
    lrate: float = 5e-4
    lrate_decay: float = 250e3
    n_iters: int = 200_000
    # loss weights (scene defaults from SSR_room0_config.yaml)
    wgt_sem: float = 4e-2
    w_chroma: float = 1.0
    w_n: float = 0.01  # reflect sparsity
    w_f: float = 0.005  # far reflect
    w_s: float = 1.0  # shading smooth (object configs override)
    w_res1: float = 1.0
    w_res2: float = 0.02
    w_i1: float = 0.1
    w_i2: float = 0.01
    residual_switch: int = 100_000
    intensity_switch: int = 50_000
    # ablations (trainer.py:52-54)
    no_cluster: bool = False
    no_semantic_tree: bool = False
    no_intrinsic_loss: bool = False
    mask_mode: str = "label"  # "label" (scene) | "mask" (object)
    # steps executed per host dispatch (lax.scan inside one executable).
    # Host->device dispatch costs ~0.7 ms *serialized* on the tunneled
    # backend (measured, tools_fwd_probe.py) — at a ~12 ms device step
    # that is ~5% of wall time.  Must divide every logging cadence; the
    # trainer falls back to 1 (with a warning) when it doesn't.
    steps_per_call: int = 1


class TrainState(NamedTuple):
    step: jnp.ndarray
    params_coarse: Params
    params_fine: Optional[Params]
    opt_state: Any


class DataPools(NamedTuple):
    """Device-resident training data: per-image ray and gt pools."""

    rays: jnp.ndarray  # [I, H*W, 11]
    rgb: jnp.ndarray  # [I, H*W, 3]
    depth: Optional[jnp.ndarray] = None  # [I, H*W]
    semantic: Optional[jnp.ndarray] = None  # [I, H*W] labels (0=void) or mask
    mask_ids: Optional[jnp.ndarray] = None  # [I]


class PosePools(NamedTuple):
    """Object-pipeline pools: rays built on the fly from poses (O(HW)
    instead of O(I*HW*11) memory)."""

    dirs_cam: jnp.ndarray  # [H*W, 3]
    poses: jnp.ndarray  # [I, 4, 4]
    rgb: jnp.ndarray  # [I, H*W, 3]
    mask: Optional[jnp.ndarray] = None  # [I, H*W] object mask (alpha)


class LossReport(NamedTuple):
    total: jnp.ndarray
    img_coarse: jnp.ndarray
    img_fine: jnp.ndarray
    psnr_coarse: jnp.ndarray
    psnr_fine: jnp.ndarray
    semantic: jnp.ndarray
    chroma: jnp.ndarray
    residual: jnp.ndarray
    reflect_sparsity: jnp.ndarray
    shading_smooth: jnp.ndarray
    far_reflect: jnp.ndarray
    intensity: jnp.ndarray
    reflect_cluster: jnp.ndarray


def packs_state(mcfg: MLPConfig) -> bool:
    """Whether the training state stores kernel-packed weights.  Mirrors
    the fused-path eligibility in ``models.mlp.eval_points`` — packed
    state removes the per-step pack/unpack pad+slice+copy traffic
    (~1.8 ms/step measured on v5e at the bench config)."""
    from intrinsicnerf_tpu.ops.fused_mlp import DIR_OFF, IN_W, OUT_W

    return (
        mcfg.use_fused_kernel
        and mcfg.depth == 8
        and tuple(mcfg.skips) == (4,)
        and mcfg.use_viewdirs
        and mcfg.input_ch <= DIR_OFF
        and mcfg.input_ch_views <= IN_W - DIR_OFF
        and 8 + max(mcfg.num_semantic_classes, 1) <= OUT_W
    )


def create_train_state(
    key: jax.Array,
    mcfg: MLPConfig,
    tcfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    with_fine: bool = True,
) -> TrainState:
    from intrinsicnerf_tpu.models.mlp import init_mlp_params

    kc, kf = jax.random.split(key)
    pc = init_mlp_params(kc, mcfg)
    pf = init_mlp_params(kf, mcfg) if with_fine else None
    if packs_state(mcfg):
        from intrinsicnerf_tpu.ops.fused_mlp import pack_weights

        pc = pack_weights(pc, mcfg)
        pf = pack_weights(pf, mcfg) if pf is not None else None
    opt_state = optimizer.init({"coarse": pc, "fine": pf})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params_coarse=pc,
        params_fine=pf,
        opt_state=opt_state,
    )


def make_multi_step(step_fn, k: int):
    """Wrap a train step (same ``(state, pools, table, w_c, key)``
    signature) into one executable running ``k`` steps via
    ``lax.scan``.  Per-step RNG still differs (the step folds its key by
    ``state.step``); the last step's report is returned — cadence-gated
    logging reads one report per block anyway, and the cadences are
    required to be multiples of ``k``.  Amortizes the per-dispatch host
    overhead (see ``TrainConfig.steps_per_call``)."""

    def multi(state, pools, table, w_c, key):
        def body(st, _):
            st, rep = step_fn(st, pools, table, w_c, key)
            return st, rep

        state, reps = jax.lax.scan(body, state, None, length=k)
        return state, jax.tree_util.tree_map(lambda x: x[-1], reps)

    return multi


def make_train_step(
    mcfg: MLPConfig,
    rcfg: RenderConfig,
    tcfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    h: int,
    w: int,
    axis_name: Optional[str] = None,
    sample_fn=None,
):
    """Build the (un-jitted) step function; callers wrap it in jit or
    shard_map.  ``axis_name`` set -> gradients/metrics are psum'd over
    that mesh axis (multi-chip data parallelism).  ``sample_fn(key,
    pools, step) -> RayBatch`` overrides the default pool sampler (the
    object pipeline uses the pose-based one with precrop)."""
    grad_mask = None
    if packs_state(mcfg):
        from intrinsicnerf_tpu.models.mlp import init_mlp_params
        from intrinsicnerf_tpu.ops.fused_mlp import packed_grad_masks

        # 0/1 projection onto the reference architecture: the packed
        # padding slots receive nonzero cross-head gradients from the
        # shared output matmul and must not be trained (see
        # ops/fused_mlp.packed_grad_masks)
        template = init_mlp_params(jax.random.key(0), mcfg)
        grad_mask = jax.tree_util.tree_map(
            np.asarray, packed_grad_masks(template, mcfg)
        )

    def loss_terms(maps, batch, w_res, w_i, cluster_target, w_c):
        img = img2mse(maps.rgb, batch.rgb)
        terms = {"img": img}

        sem = jnp.float32(0.0)
        if mcfg.enable_semantic and maps.sem_logits is not None:
            sem = (
                semantic_cross_entropy(maps.sem_logits, batch.semantic)
                * batch.sem_flag
            )
        terms["sem"] = sem

        pair_label = (
            batch.semantic
            if batch.semantic is not None
            else jnp.ones(batch.rgb.shape[0], batch.rgb.dtype)
        )
        intr = compute_intrinsic_losses(
            maps.albedo,
            maps.shading,
            maps.residual,
            batch.rgb,
            pair_label,
            mask_mode=tcfg.mask_mode,
        )
        terms["intr"] = intr

        cluster = jnp.float32(0.0)
        if cluster_target is not None:
            cluster = img2mse(maps.albedo, cluster_target)
        terms["cluster"] = cluster

        if tcfg.no_intrinsic_loss:
            total = img + sem * tcfg.wgt_sem
        else:
            total = (
                img
                + sem * tcfg.wgt_sem
                + intr.chroma * tcfg.w_chroma
                + intr.residual * w_res
                + intr.reflect_sparsity * tcfg.w_n
                + intr.shading_smooth * tcfg.w_s
                + intr.far_reflect * tcfg.w_f
                + intr.intensity * w_i
            )
        total = total + cluster * w_c
        terms["total"] = total
        return terms

    def step_fn(
        state: TrainState,
        pools: DataPools,
        table: ClusterTable,
        w_c: jnp.ndarray,  # [] cluster-loss weight (0 disables; annealed)
        key: jax.Array,
    ):
        step = state.step
        key = jax.random.fold_in(key, step)
        k_sample, k_render = jax.random.split(key)

        if sample_fn is not None:
            batch = sample_fn(k_sample, pools, step)
        else:
            batch = sample_ray_pairs(
                k_sample,
                pools.rays,
                pools.rgb,
                h,
                w,
                tcfg.n_rays,
                depth_pool=pools.depth,
                sem_pool=pools.semantic,
                mask_ids=pools.mask_ids,
            )

        w_res, w_i = loss_weight_schedule(
            step,
            tcfg.w_res1,
            tcfg.w_res2,
            tcfg.w_i1,
            tcfg.w_i2,
            tcfg.residual_switch,
            tcfg.intensity_switch,
        )
        use_cluster = (not tcfg.no_cluster) and table is not None

        def loss_fn(params):
            out = render_rays(
                params["coarse"],
                params["fine"],
                mcfg,
                batch.rays,
                k_render,
                rcfg,
                train=True,
            )
            fine = out.fine if out.fine is not None else out.coarse

            cluster_target = None
            if use_cluster:
                if mcfg.enable_semantic and fine.sem_logits is not None:
                    cls = jnp.argmax(fine.sem_logits, axis=-1)
                else:
                    cls = jnp.zeros(batch.rays.shape[0], jnp.int32)
                cluster_target = jax.lax.stop_gradient(
                    dest_color(table, jax.lax.stop_gradient(fine.albedo), cls)
                )

            t_c = loss_terms(out.coarse, batch, w_res, w_i, cluster_target, w_c)
            if out.fine is not None:
                t_f = loss_terms(out.fine, batch, w_res, w_i, cluster_target, w_c)
            else:
                t_f = None

            total = t_c["total"] + (t_f["total"] if t_f is not None else 0.0)
            return total, (t_c, t_f)

        params = {"coarse": state.params_coarse, "fine": state.params_fine}
        (total, (t_c, t_f)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        if grad_mask is not None:
            mask_tree = {
                "coarse": grad_mask,
                "fine": grad_mask if grads["fine"] is not None else None,
            }
            grads = jax.tree_util.tree_map(lambda g, m: g * m, grads, mask_tree)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            total = jax.lax.pmean(total, axis_name)
            # logged metrics must reflect the global batch too
            t_c = jax.lax.pmean(t_c, axis_name)
            t_f = jax.lax.pmean(t_f, axis_name) if t_f is not None else None

        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)

        zero = jnp.float32(0.0)
        tf = t_f if t_f is not None else None
        report = LossReport(
            total=total,
            img_coarse=t_c["img"],
            img_fine=tf["img"] if tf else zero,
            psnr_coarse=mse2psnr(t_c["img"]),
            psnr_fine=mse2psnr(tf["img"]) if tf else zero,
            semantic=t_c["sem"] + (tf["sem"] if tf else zero),
            chroma=t_c["intr"].chroma + (tf["intr"].chroma if tf else zero),
            residual=t_c["intr"].residual + (tf["intr"].residual if tf else zero),
            reflect_sparsity=t_c["intr"].reflect_sparsity
            + (tf["intr"].reflect_sparsity if tf else zero),
            shading_smooth=t_c["intr"].shading_smooth
            + (tf["intr"].shading_smooth if tf else zero),
            far_reflect=t_c["intr"].far_reflect
            + (tf["intr"].far_reflect if tf else zero),
            intensity=t_c["intr"].intensity + (tf["intr"].intensity if tf else zero),
            reflect_cluster=t_c["cluster"] + (tf["cluster"] if tf else zero),
        )
        new_state = TrainState(
            step=step + 1,
            params_coarse=params["coarse"],
            params_fine=params["fine"],
            opt_state=opt_state,
        )
        return new_state, report

    return step_fn
