"""Multi-host initialization and per-host data sharding helpers.

The reference has no distributed runtime (SURVEY.md §2.2).  Here a
multi-host run is: ``initialize_distributed()`` once per process, build
the global ``data`` mesh over all devices, load only the local image
shard on each host (``local_image_slice``), and run the shard_map'd
train step — gradient psum rides ICI within a slice and DCN across
hosts, inserted by XLA.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed (no-op on a single process).  Returns
    (process_index, process_count).  On TPU pods the arguments are
    auto-detected from the environment; explicit args support CPU/GPU
    test rigs."""
    want_multi = (
        coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if want_multi:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def local_image_slice(num_images: int) -> slice:
    """The contiguous image range this host should load, matching how a
    leading-axis NamedSharding over the data mesh places shards: device
    order follows process order, so host ``p`` owns images
    ``[p, p+1) * num_images / process_count``."""
    p, n = jax.process_index(), jax.process_count()
    per = num_images // n
    assert per * n == num_images, (
        f"image count {num_images} must divide process count {n} "
        "(pad with pad_images_to_multiple first)"
    )
    return slice(p * per, (p + 1) * per)


def make_global_pools(mesh, local_pools):
    """Assemble globally-sharded pools from per-host local shards via
    ``jax.make_array_from_process_local_data`` (host-local IO, no
    cross-host gather)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))

    def to_global(x):
        if x is None:
            return None
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(to_global, local_pools)
