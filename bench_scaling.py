"""Weak-scaling efficiency of the data-parallel train step.

Runs the shard_map'd step on 1..N devices with a FIXED per-device ray
batch and reports steps/s and efficiency vs 1 device — the
BASELINE.json "scaling eff 1->N hosts" metric, emitted in that format
so the >=85%-to-2-hosts north star is one command away when a pod
slice exists.  On TPU the workload is the FLAGSHIP config (the bench.py
headline: Replica-scene 8x256 coarse+fine with fused kernel, 512
pairs/device at 240x320, 64+128 samples, full loss stack + live
cluster table); a single chip therefore produces the 1-device row of
the scaling table.  NOTE: on the virtual CPU mesh
(``xla_force_host_platform_device_count``) the "devices" share the same
physical cores, so efficiency numbers mostly measure core
oversubscription — the CPU run (shrunken model) only validates that the
sharded path executes.

Usage:
  python bench_scaling.py                       # TPU: flagship config
  python bench_scaling.py --cpu-mesh 8          # CPU: correctness mode
"""

import argparse
import json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--devices", type=int, nargs="+", default=None,
        help="device counts to run (default: powers of 2 up to the "
        "available count)",
    )
    parser.add_argument(
        "--n-rays", type=int, default=None,
        help="sampled pixels per device (default: 512 on TPU = the "
        "flagship config; 64 on CPU)",
    )
    parser.add_argument("--iters", type=int, default=None)
    parser.add_argument(
        "--cpu-mesh",
        type=int,
        default=0,
        metavar="N",
        help="force an N-device virtual CPU mesh (XLA_FLAGS alone comes "
        "too late when a sitecustomize imports jax at interpreter start)",
    )
    # multi-host rows.  --processes N self-spawns an N-process
    # jax.distributed rig on this machine (CPU devices; validates the
    # multi-host path + measures its overhead without a pod).  On a real
    # pod, instead run this script once per host with --coordinator /
    # --num_processes / --process_id (or TPU auto-detection) and the
    # per-host device count is discovered from the slice.
    parser.add_argument(
        "--processes", type=int, default=0, metavar="N",
        help="self-spawn N local processes (each with --cpu-mesh devices, "
        "default 2) and run the multi-host sharded step across them",
    )
    parser.add_argument("--coordinator", type=str, default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args()

    if args.processes:
        _spawn_rig(args)
        return

    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_mesh)
    multihost = args.coordinator is not None
    if multihost:
        jax.distributed.initialize(
            args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import numpy as np
    import jax.numpy as jnp
    import optax

    from bench_common import make_synthetic_pools, time_steps
    from intrinsicnerf_tpu.models.mlp import MLPConfig
    from intrinsicnerf_tpu.parallel.mesh import make_mesh, replicate, shard_pools
    from intrinsicnerf_tpu.parallel.sharded_step import make_sharded_train_step_for
    from intrinsicnerf_tpu.render.pipeline import RenderConfig
    from intrinsicnerf_tpu.train.step import TrainConfig, create_train_state

    on_cpu = jax.default_backend() == "cpu"
    if multihost:
        # one row: all global devices (subsets can't idle whole processes)
        args.devices = [jax.device_count()]
    elif args.devices is None:
        args.devices = sorted(
            {1 << k for k in range(8) if (1 << k) <= jax.device_count()}
        )
    if args.n_rays is None:
        args.n_rays = 64 if on_cpu else 512
    if args.iters is None:
        args.iters = 30 if on_cpu else 200

    h, w = (32, 32) if on_cpu else (240, 320)
    n_classes = 8 if on_cpu else 27
    mcfg = MLPConfig(
        depth=8 if not on_cpu else 4,
        width=256 if not on_cpu else 64,
        skips=(4,) if not on_cpu else (2,),
        pos_scalar_factor=10.0,
        enable_semantic=True,
        num_semantic_classes=n_classes,
        compute_dtype=jnp.bfloat16 if not on_cpu else jnp.float32,
        use_fused_kernel=not on_cpu,
    )
    rcfg = RenderConfig(
        n_coarse=64 if not on_cpu else 16,
        n_importance=128 if not on_cpu else 32,
        perturb=1.0,
        raw_noise_std=1.0,
    )
    tcfg = TrainConfig(n_rays=args.n_rays)
    max_dev = max(args.devices)
    # IDENTICAL workload to bench.py (r4 stamped 80.6k here vs 83.6k
    # there at "the same config" — the scaling rows were silently
    # lighter: no depth supervision, empty cluster table, w_c=0, one
    # step per dispatch.  A number that can't be compared to the
    # headline bench is a trap; now both time the full production step).
    pools_host = make_synthetic_pools(h, w, max_dev, n_classes, with_depth=True)
    from intrinsicnerf_tpu.cluster.manager import ClusterManager, build_cluster

    _rng = np.random.default_rng(0)
    _cluster = build_cluster(
        np.clip(_rng.uniform(0.1, 0.9, size=(2000, 3)), 0, 1), band_factor=1.0
    )
    table_host = ClusterManager(
        class_num=n_classes, clusters=[_cluster] * n_classes
    ).to_table(anchors_per_class=2048 if not on_cpu else 128)
    w_c_val = jnp.float32(0.01)
    steps_per_call = 1 if on_cpu else 8

    runnable = [n for n in args.devices if n <= jax.device_count()]
    if not runnable:
        raise SystemExit(
            f"no requested device count fits the {jax.device_count()} "
            f"available device(s); use --cpu-mesh N for a virtual mesh"
        )

    results = {}
    for n_dev in runnable:
        mesh = make_mesh(n_dev)
        opt = optax.adam(5e-4)
        # image count must divide the mesh: take the first n_dev images
        pools_n = jax.tree_util.tree_map(
            lambda x: None if x is None else x[:n_dev], pools_host
        )
        if multihost:
            # host-local loading path: this process contributes only its
            # image slice; make_global_pools assembles the global arrays
            from intrinsicnerf_tpu.parallel.distributed import (
                local_image_slice,
                make_global_pools,
            )

            sl = local_image_slice(n_dev)
            pools_local = jax.tree_util.tree_map(
                lambda x: None if x is None else np.asarray(x)[sl], pools_n
            )
            pools = make_global_pools(mesh, pools_local)
        else:
            pools = shard_pools(mesh, pools_n)
        state = replicate(
            mesh, create_train_state(jax.random.key(0), mcfg, tcfg, opt)
        )
        table = replicate(mesh, table_host)
        step = make_sharded_train_step_for(
            mcfg, rcfg, tcfg, opt, h, w, mesh, pools,
            jit_compile=steps_per_call == 1,
        )
        if steps_per_call > 1:
            from bench_common import make_multi_step

            step = jax.jit(
                make_multi_step(step, steps_per_call), donate_argnums=(0,)
            )
        calls = max(args.iters // steps_per_call, 1)
        total_s, _ = time_steps(
            step, state, pools, table, w_c_val, jax.random.key(1),
            calls, warmup=3,
        )
        dt = total_s / (calls * steps_per_call)
        rays_s = 2 * tcfg.n_rays * n_dev / dt
        results[n_dev] = {"ms_per_step": dt * 1000, "global_rays_per_s": rays_s}

    # weak scaling: fixed per-device batch -> ideal is constant ms/step.
    # efficiency is relative to the smallest device count that ran
    # (= 1 device when 1 is in --devices); record the base explicitly so
    # a 4-vs-8 ratio can't masquerade as "vs 1 device".
    base_dev = min(results)
    base = results[base_dev]["ms_per_step"]
    for n_dev, r in results.items():
        r["weak_scaling_efficiency"] = round(base / r["ms_per_step"], 3)
    if jax.process_index() == 0:
        print(
            json.dumps(
                {
                    "backend": jax.default_backend(),
                    "processes": jax.process_count(),
                    "efficiency_baseline_devices": base_dev,
                    "results": results,
                }
            )
        )


def _spawn_rig(args):
    """--processes N: run this script N times under jax.distributed on
    localhost (each process gets --cpu-mesh virtual CPU devices,
    default 2) and relay process 0's JSON."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    per_proc = args.cpu_mesh or 2
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # CPU rig: skip TPU plugin
    env["JAX_PLATFORMS"] = "cpu"
    cmd_base = [sys.executable, os.path.abspath(__file__),
                "--cpu-mesh", str(per_proc),
                "--coordinator", coord,
                "--num_processes", str(args.processes)]
    if args.n_rays is not None:
        cmd_base += ["--n-rays", str(args.n_rays)]
    if args.iters is not None:
        cmd_base += ["--iters", str(args.iters)]
    procs = [
        subprocess.Popen(
            cmd_base + ["--process_id", str(i)],
            env=env,
            stdout=None if i == 0 else subprocess.DEVNULL,
            stderr=subprocess.DEVNULL if i else None,
        )
        for i in range(args.processes)
    ]
    codes = [p.wait() for p in procs]
    if any(codes):
        raise SystemExit(f"multi-process rig failed: exit codes {codes}")


if __name__ == "__main__":
    main()
