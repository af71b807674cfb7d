"""Data-parallel training step over a device mesh via shard_map.

Each device holds a shard of the training-image pools, samples its own
``n_rays`` neighbor pairs with a device-folded key, renders and
computes losses shard-locally, and the gradients/metrics are ``pmean``'d
over the ``data`` axis (the psum rides ICI within a slice; XLA overlaps
it with the backward pass).  Parameters, optimizer state and the
cluster table are replicated.

Both pipelines are covered: scene bundles (``DataPools``, precomputed
per-image ray pools) and object bundles (``PosePools`` + a custom
``sample_fn`` building rays from poses on the fly, with the shared
``dirs_cam`` leaf replicated) — the reference has no distribution layer
at all for either (SURVEY.md §2.2).  Global batch =
``n_rays_per_device * n_devices`` pairs, identical loss semantics to a
single-device run with the same global batch (mean of per-shard means
over equal shard sizes).
"""

from __future__ import annotations


import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from intrinsicnerf_tpu.models.mlp import MLPConfig
from intrinsicnerf_tpu.parallel.mesh import pool_specs
from intrinsicnerf_tpu.render.pipeline import RenderConfig
from intrinsicnerf_tpu.train.step import TrainConfig, make_train_step


def make_sharded_train_step(
    mcfg: MLPConfig,
    rcfg: RenderConfig,
    tcfg: TrainConfig,
    optimizer,
    h: int,
    w: int,
    mesh: Mesh,
    pools,
    axis: str = "data",
    sample_fn=None,
    donate_state: bool = True,
    jit_compile: bool = True,
):
    """Returns ``step(state, pools, table, w_c, key) -> (state, report)``
    jit-compiled over the mesh.  Pool specs are derived from the
    concrete ``pools`` pytree (image-axis leaves shard, shared leaves
    replicate, optional None leaves drop).  ``sample_fn(key, pools,
    step)`` overrides the default pool sampler per device (the object
    pipeline's pose-based sampler with precrop)."""
    base_step = make_train_step(
        mcfg, rcfg, tcfg, optimizer, h, w, axis_name=axis, sample_fn=sample_fn
    )

    def device_step(state, pools, table, w_c, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return base_step(state, pools, table, w_c, key)

    rep = P()
    mapped = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(rep, pool_specs(pools, axis), rep, rep, rep),
        out_specs=(rep, rep),
        check_vma=False,
    )
    if not jit_compile:
        # un-jitted variant for callers that compose further (the
        # Trainer's steps_per_call scan wraps this in its own single
        # outer jit — a nested jit's donate_argnums would be ignored
        # while tracing and only emit donation warnings)
        return mapped
    return jax.jit(mapped, donate_argnums=(0,) if donate_state else ())


# Back-compat alias (round-1 name); same signature.
make_sharded_train_step_for = make_sharded_train_step
