"""Multi-host initialization and per-host data sharding helpers.

The reference has no distributed runtime (SURVEY.md §2.2).  Here a
multi-host run is: ``initialize_distributed()`` once per process, build
the global ``data`` mesh over all devices, load only the local image
shard on each host (``local_train_ids`` -> the dataset loader), agree
on the semantic class set (``allgather_semantic_classes``), assemble
the globally-sharded pools from the host-local arrays
(``make_global_pools`` — no host ever materializes the full dataset),
and run the shard_map'd train step — gradient psum rides ICI within a
slice and DCN across hosts, inserted by XLA.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

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
    import os

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


def is_lead_process() -> bool:
    """True on the process that owns file IO (TB logs, rendered images,
    eval GT) in a multi-host run — and always on a single process."""
    return jax.process_index() == 0


def local_image_slice(num_images: int) -> slice:
    """The contiguous image range this host should load, matching how a
    leading-axis NamedSharding over the data mesh places shards: device
    order follows process order, so host ``p`` owns images
    ``[p, p+1) * num_images / process_count``."""
    p, n = jax.process_index(), jax.process_count()
    per = num_images // n
    assert per * n == num_images, (
        f"image count {num_images} must divide process count {n} "
        "(pad the id list with pad_ids_to_multiple first)"
    )
    return slice(p * per, (p + 1) * per)


def pad_ids_to_multiple(ids: Sequence[int], n: int) -> List[int]:
    """Wrap-around-pad a frame-id list so its length divides ``n``
    (host-side analog of ``mesh.pad_images_to_multiple``: duplicates
    only perturb the sampling distribution negligibly)."""
    ids = list(ids)
    r = (-len(ids)) % n
    out = ids[:]
    while r > 0:
        take = min(r, len(ids))
        out += ids[:take]
        r -= take
    return out


def local_train_ids(
    train_ids: Sequence[int], n_total_devices: Optional[int] = None
) -> Tuple[List[int], int]:
    """The train-frame ids THIS host loads: the full id list is padded to
    a multiple of the global device count (so pools shard evenly) and
    sliced by process.  Returns (local_ids, padded_total)."""
    n_dev = n_total_devices if n_total_devices is not None else jax.device_count()
    padded = pad_ids_to_multiple(train_ids, n_dev)
    return padded[local_image_slice(len(padded))], len(padded)


def allgather_semantic_classes(
    local_classes: np.ndarray, max_id: int = 4096
) -> np.ndarray:
    """Union of the semantic class ids present across all hosts.

    Each host only loads its image shard, so the locally-observed class
    set differs per host; the dense [0, C) label remap (and with it the
    model's semantic head width) must be computed from the SAME set
    everywhere.  A fixed-size presence bitmap rides one allgather."""
    local_classes = np.asarray(local_classes, np.int64)
    if jax.process_count() == 1:
        return np.unique(local_classes)
    assert local_classes.size == 0 or int(local_classes.max()) < max_id
    from jax.experimental import multihost_utils

    bitmap = np.zeros((max_id,), np.int32)
    bitmap[local_classes] = 1
    gathered = np.asarray(multihost_utils.process_allgather(bitmap))
    return np.nonzero(gathered.reshape(-1, max_id).sum(axis=0) > 0)[0].astype(
        np.int64
    )


def allgather_pixels(arrays: List[np.ndarray]) -> List[np.ndarray]:
    """Concatenate per-host pixel blocks across processes (cluster
    rebuild inputs when each host renders only its own views).  No-op on
    a single process; rows may differ per host (padded to the max)."""
    if jax.process_count() == 1:
        return arrays
    from jax.experimental import multihost_utils

    out = []
    for a in arrays:
        g = np.asarray(multihost_utils.process_allgather(a))
        out.append(g.reshape(-1, *a.shape[1:]))
    return out


def make_global_pools(mesh, local_pools):
    """Assemble globally-sharded pools from per-host local shards via
    ``jax.make_array_from_process_local_data`` (host-local IO, no
    cross-host gather).  Image-axis leaves shard over ``data``; shared
    leaves (PosePools.dirs_cam) replicate — same placement as the
    single-host ``mesh.shard_pools``."""
    from jax.sharding import NamedSharding

    from intrinsicnerf_tpu.parallel.mesh import pool_specs

    specs = pool_specs(local_pools)

    def to_global(x, spec):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x)
        )

    return jax.tree_util.tree_map(to_global, local_pools, specs)
