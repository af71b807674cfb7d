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
    """Place a pytree replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_pools(mesh: Mesh, tree, axis: str = "data"):
    """Shard a pytree of ``[num_images, ...]`` pools over the mesh's
    image axis (leading dim must divide by the axis size)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def pad_images_to_multiple(pools_np, n: int):
    """Host-side: repeat trailing images so the image count divides the
    mesh axis size (keeps shapes static; duplicates only change the
    sampling distribution negligibly)."""
    import numpy as np

    def pad(x):
        if x is None:
            return None
        r = (-x.shape[0]) % n
        if r == 0:
            return x
        return np.concatenate([x, x[:r]], axis=0)

    return jax.tree_util.tree_map(pad, pools_np)
