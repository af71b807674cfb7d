"""Device mesh and sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.2: no DP/TP/PP,
"multi-GPU" = one scene per GPU via shell).  The TPU-native scaling
story replaces its chunk loops: rays are sharded over a 1-D ``data``
mesh axis (ICI within a slice, DCN across hosts), parameters are
replicated, and the only hot-path collective is the gradient psum
emitted inside the sharded train step.  Training-image pools are
sharded over the same axis so each device samples ray pairs from its
local images — sampling, fine resampling and cluster assignment never
cross chips.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicate(mesh: Mesh, tree):
    """Place a pytree replicated over the mesh.  Works across processes:
    under multi-controller JAX a plain device_put cannot address other
    hosts' devices, so host-local values (identical on every process —
    same seed / same restore) are lifted to global replicated arrays."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.device_put(tree, sharding)


def _replicated_leaves(pools) -> frozenset:
    """Field names of pool leaves that must replicate instead of shard
    over the image axis (PosePools.dirs_cam is shared by every image)."""
    from intrinsicnerf_tpu.train.step import PosePools

    return frozenset(("dirs_cam",)) if isinstance(pools, PosePools) else frozenset()


def pool_specs(pools, axis: str = "data"):
    """Per-leaf PartitionSpec for a DataPools *or* PosePools pytree:
    image-axis leaves shard, shared leaves replicate, None leaves drop."""
    rep = _replicated_leaves(pools)
    fields = type(pools)._fields
    return type(pools)(
        **{
            f: None
            if getattr(pools, f) is None
            else (P() if f in rep else P(axis))
            for f in fields
        }
    )


def shard_pools(mesh: Mesh, pools, axis: str = "data"):
    """Place pools on the mesh: ``[num_images, ...]`` leaves shard over
    the image axis (leading dim must divide the axis size), shared
    leaves (PosePools.dirs_cam) replicate."""
    specs = pool_specs(pools, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), pools, specs
    )


def pad_images_to_multiple(pools_np, n: int):
    """Host-side: repeat trailing images so the image count divides the
    mesh axis size (keeps shapes static; duplicates only change the
    sampling distribution negligibly).  Shared (replicated) leaves are
    left untouched."""
    import numpy as np

    rep = _replicated_leaves(pools_np)
    fields = type(pools_np)._fields

    def pad(x):
        if x is None:
            return None
        r = (-x.shape[0]) % n
        if r == 0:
            return x
        reps = [x] + [x[: min(r, x.shape[0])]]
        while sum(a.shape[0] for a in reps) < x.shape[0] + r:
            reps.append(x[: x.shape[0] + r - sum(a.shape[0] for a in reps)])
        return np.concatenate(reps, axis=0)

    return type(pools_np)(
        **{
            f: getattr(pools_np, f) if f in rep else pad(getattr(pools_np, f))
            for f in fields
        }
    )
