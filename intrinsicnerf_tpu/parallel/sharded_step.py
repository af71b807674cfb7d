"""Data-parallel training step over a device mesh via shard_map.

Each device holds a shard of the training-image pools, samples its own
``n_rays`` neighbor pairs with a device-folded key, renders and
computes losses shard-locally, and the gradients/metrics are ``pmean``'d
over the ``data`` axis (the psum rides ICI within a slice; XLA overlaps
it with the backward pass).  Parameters, optimizer state and the
cluster table are replicated.

This is the TPU replacement for the reference's absent distribution
layer (SURVEY.md §2.2): global batch = ``n_rays_per_device * n_devices``
pairs, identical loss semantics to a single-device run with the same
global batch (mean of per-shard means over equal shard sizes).
"""

from __future__ import annotations


import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from intrinsicnerf_tpu.models.mlp import MLPConfig
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
    axis: str = "data",
    donate_state: bool = True,
):
    """Returns ``step(state, pools, table, w_c, key) -> (state, report)``
    jit-compiled over the mesh.  ``pools`` leaves must be sharded on
    their leading (image) axis; everything else replicated."""
    base_step = make_train_step(mcfg, rcfg, tcfg, optimizer, h, w, axis_name=axis)

    def device_step(state, pools, table, w_c, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return base_step(state, pools, table, w_c, key)

    rep = P()
    sharded = P(axis)
    pool_specs = jax.tree_util.tree_map(lambda _: sharded, _pool_struct())

    mapped = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(rep, pool_specs, rep, rep, rep),
        out_specs=(rep, rep),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate_state else ())


def _pool_struct():
    # structural template mirroring DataPools' 5 leaves; tree_map over a
    # DataPools of placeholders yields per-leaf specs (None leaves vanish
    # from the pytree so their specs are dropped consistently).
    from intrinsicnerf_tpu.train.step import DataPools

    return DataPools(rays=0, rgb=0, depth=0, semantic=0, mask_ids=0)


def make_pool_specs(pools, axis: str = "data"):
    """Per-leaf PartitionSpec for an actual DataPools instance (handles
    None leaves)."""
    return jax.tree_util.tree_map(lambda _: P(axis), pools)


def make_sharded_train_step_for(
    mcfg, rcfg, tcfg, optimizer, h, w, mesh, pools, axis: str = "data"
):
    """Like ``make_sharded_train_step`` but derives pool specs from the
    concrete ``pools`` pytree (robust to optional None leaves)."""
    base_step = make_train_step(mcfg, rcfg, tcfg, optimizer, h, w, axis_name=axis)

    def device_step(state, pools, table, w_c, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return base_step(state, pools, table, w_c, key)

    rep = P()
    mapped = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(rep, make_pool_specs(pools, axis), rep, rep, rep),
        out_specs=(rep, rep),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))
