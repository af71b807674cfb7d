"""Weak-scaling efficiency of the data-parallel train step.

Runs the shard_map'd step on 1..N devices with a FIXED per-device ray
batch and reports steps/s and efficiency vs 1 device.  On a real pod
slice this is the BASELINE.md scaling-efficiency metric.  NOTE: on the
virtual CPU mesh (``xla_force_host_platform_device_count``) the
"devices" share the same physical cores, so the efficiency numbers
mostly measure core oversubscription — use the CPU run only to validate
that the sharded path executes, not to judge scaling.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python bench_scaling.py [--devices 1 2 4 8] [--n-rays 64]
"""

import argparse
import json
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    parser.add_argument("--n-rays", type=int, default=64)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument(
        "--cpu-mesh",
        type=int,
        default=0,
        metavar="N",
        help="force an N-device virtual CPU mesh (XLA_FLAGS alone comes "
        "too late when a sitecustomize imports jax at interpreter start)",
    )
    args = parser.parse_args()

    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_mesh)

    import numpy as np
    import jax.numpy as jnp
    import optax

    from intrinsicnerf_tpu.cluster.assign import empty_cluster_table
    from intrinsicnerf_tpu.core.rays import create_rays
    from intrinsicnerf_tpu.models.mlp import MLPConfig
    from intrinsicnerf_tpu.parallel.mesh import make_mesh, replicate, shard_pools
    from intrinsicnerf_tpu.parallel.sharded_step import make_sharded_train_step_for
    from intrinsicnerf_tpu.render.pipeline import RenderConfig
    from intrinsicnerf_tpu.train.step import DataPools, TrainConfig, create_train_state

    h = w = 32
    n_classes = 8
    on_cpu = jax.default_backend() == "cpu"
    mcfg = MLPConfig(
        depth=8 if not on_cpu else 4,
        width=256 if not on_cpu else 64,
        skips=(4,) if not on_cpu else (2,),
        pos_scalar_factor=10.0,
        enable_semantic=True,
        num_semantic_classes=n_classes,
        compute_dtype=jnp.bfloat16 if not on_cpu else jnp.float32,
    )
    rcfg = RenderConfig(
        n_coarse=64 if not on_cpu else 16,
        n_importance=128 if not on_cpu else 32,
        raw_noise_std=1.0,
    )
    tcfg = TrainConfig(n_rays=args.n_rays)
    rng = np.random.default_rng(0)
    max_dev = max(args.devices)
    c2ws = np.tile(np.eye(4, dtype=np.float32), (max_dev, 1, 1))
    c2ws[:, 2, 3] = -3.0 - 0.05 * np.arange(max_dev)
    pools_host = DataPools(
        rays=create_rays(jnp.asarray(c2ws), h, w, w / 2, w / 2, (w - 1) / 2,
                         (h - 1) / 2, 0.1, 10.0),
        rgb=jnp.asarray(rng.uniform(size=(max_dev, h * w, 3)).astype(np.float32)),
        depth=None,
        semantic=jnp.asarray(rng.integers(0, n_classes, size=(max_dev, h * w))),
        mask_ids=jnp.ones((max_dev,), jnp.int32),
    )

    results = {}
    for n_dev in args.devices:
        if n_dev > jax.device_count():
            continue
        mesh = make_mesh(n_dev)
        opt = optax.adam(5e-4)
        # image count must divide the mesh: take the first n_dev images
        pools_n = jax.tree_util.tree_map(
            lambda x: None if x is None else x[:n_dev], pools_host
        )
        pools = shard_pools(mesh, pools_n)
        state = replicate(
            mesh, create_train_state(jax.random.key(0), mcfg, tcfg, opt)
        )
        table = replicate(mesh, empty_cluster_table(n_classes, 128))
        step = make_sharded_train_step_for(
            mcfg, rcfg, tcfg, opt, h, w, mesh, pools
        )
        key = jax.random.key(1)
        for _ in range(3):
            state, report = step(state, pools, table, jnp.float32(0.0), key)
        float(report.total)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, report = step(state, pools, table, jnp.float32(0.0), key)
        float(report.total)
        dt = (time.perf_counter() - t0) / args.iters
        rays_s = 2 * tcfg.n_rays * n_dev / dt
        results[n_dev] = {"ms_per_step": dt * 1000, "global_rays_per_s": rays_s}

    base = results[min(results)]["ms_per_step"]
    for n_dev, r in results.items():
        r["weak_scaling_efficiency"] = round(base / r["ms_per_step"], 3)
    print(json.dumps({"backend": jax.default_backend(), "results": results}))


if __name__ == "__main__":
    main()
