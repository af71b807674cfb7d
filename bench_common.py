"""Shared scaffolding for the benchmark harnesses (bench.py,
bench_scaling.py): synthetic device-resident data pools and the timing
loop.

TIMING CAVEAT (load-bearing): synchronize via a host readback
(``float(report.total)``), NOT ``block_until_ready`` — the axon tunnel
backend returns early from ``block_until_ready``, which silently
inflates throughput ~30x.  Both harnesses must share this loop so a fix
to one cannot miss the other.
"""

from __future__ import annotations

import time


def make_synthetic_pools(h, w, n_img, n_classes, with_depth=True, seed=0):
    """Identity-pose cameras pulled back along -z + uniform-noise gt
    pools, matching the reference's Replica scene shapes (hfov 90)."""
    import numpy as np
    import jax.numpy as jnp

    from intrinsicnerf_tpu.core.rays import create_rays
    from intrinsicnerf_tpu.train.step import DataPools

    rng = np.random.default_rng(seed)
    c2ws = np.tile(np.eye(4, dtype=np.float32), (n_img, 1, 1))
    c2ws[:, 2, 3] = -3.0 - 0.05 * np.arange(n_img)
    fx = w / 2.0  # hfov 90
    return DataPools(
        rays=create_rays(
            jnp.asarray(c2ws), h, w, fx, fx, (w - 1) / 2, (h - 1) / 2, 0.1, 10.0
        ),
        rgb=jnp.asarray(rng.uniform(size=(n_img, h * w, 3)).astype(np.float32)),
        depth=(
            jnp.asarray(rng.uniform(1, 5, size=(n_img, h * w)).astype(np.float32))
            if with_depth
            else None
        ),
        semantic=jnp.asarray(rng.integers(0, n_classes, size=(n_img, h * w))),
        mask_ids=jnp.ones((n_img,), jnp.int32),
    )


def make_multi_step(step_fn, k: int):
    """Re-export of ``intrinsicnerf_tpu.train.step.make_multi_step``
    (the Trainer's ``steps_per_call``) for the bench harnesses — the
    contract and the dispatch-cost rationale live there."""
    from intrinsicnerf_tpu.train.step import make_multi_step as _impl

    return _impl(step_fn, k)


def time_steps(step, state, pools, table, w_c, key, iters, warmup=5):
    """Run ``warmup`` then ``iters`` steps; returns (seconds_total,
    final_state).  Syncs by host readback per the module caveat."""
    for _ in range(warmup):
        state, report = step(state, pools, table, w_c, key)
    float(report.total)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, report = step(state, pools, table, w_c, key)
    float(report.total)
    return time.perf_counter() - t0, state
