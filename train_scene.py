"""Scene-level training entry (Replica / ScanNet / Replica-NYU-CNN).

Behavioral parity target: ``train_SSR_main.py``: YAML config + argparse
mode flags (sparse-view / pixel-noise / super-resolution / label
propagation experiments), every-5th train/test split for Replica,
then the training loop with periodic eval/cluster/ckpt work.

Usage:
  python train_scene.py --config_file SSR_room0_config.yaml
  python train_scene.py --config_file cfg.yaml --sparse_views --sparse_ratio 0.5
"""

import argparse

import numpy as np


def build_dataset(cfg, args):
    from intrinsicnerf_tpu.data import degradations
    from intrinsicnerf_tpu.data.replica import default_replica_split, load_replica

    dstype = cfg.experiment.dataset_type
    if dstype == "replica":
        total = args.total_frames
        train_ids, test_ids = default_replica_split(total, args.split_step)
        data = load_replica(
            cfg.experiment.dataset_dir,
            train_ids,
            test_ids,
            img_h=cfg.experiment.height,
            img_w=cfg.experiment.width,
        )
    elif dstype == "scannet":
        from intrinsicnerf_tpu.data.scannet import load_scannet

        data = load_scannet(
            cfg.experiment.dataset_dir,
            cfg.experiment.scene_name,
            mode=cfg.experiment.nyu_mode if cfg.experiment.nyu_mode != "nyu34" else "nyu40",
            img_h=cfg.experiment.height,
            img_w=cfg.experiment.width,
        )
    elif dstype == "replica_nyu_cnn":
        from intrinsicnerf_tpu.data.replica_nyu import load_replica_nyu_cnn

        train_ids, test_ids = default_replica_split(
            args.total_frames, args.split_step
        )
        data = load_replica_nyu_cnn(
            cfg.experiment.dataset_dir,
            train_ids,
            test_ids,
            nyu_mode=cfg.experiment.nyu_mode,
            img_h=cfg.experiment.height,
            img_w=cfg.experiment.width,
        )
    else:
        raise ValueError(f"unknown scene dataset_type: {dstype}")

    # experiment degradation modes (train_SSR_main.py:27-67)
    if args.sparse_views:
        degradations.sample_label_maps(
            data, sparse_ratio=args.sparse_ratio, random_sample=args.random_sample
        )
    if args.pixel_denoising:
        degradations.add_pixel_wise_noise_label(
            data, noise_ratio=args.pixel_noise_ratio
        )
    if args.region_denoising:
        inst = data.train_samples.get("instance")
        if inst is None:
            raise SystemExit(
                "--region_denoising requires the dataset's semantic_instance maps"
            )
        degradations.add_instance_wise_noise_label(
            data, inst, flip_ratio=args.region_noise_ratio
        )
    if args.super_resolution:
        degradations.super_resolve_label(data, down_scale_factor=args.dense_sr)
    if args.label_propagation:
        degradations.simulate_user_click_partial(data, perc=args.partial_perc)
    return data


def build_multihost_replica_bundle(cfg, args):
    """Multi-host (jax.process_count() > 1) data path: each host loads
    only its train-image shard (``local_train_ids``), the semantic class
    set is agreed by allgather so the dense label remap — and the model's
    semantic head — is identical everywhere, the eval/test GT images are
    read only on the lead host, and the vis/test RAY blocks (needed by
    every process: the sharded full-image render is a collective) are
    rebuilt from the full pose table, which is one small txt."""
    import dataclasses
    import os

    import jax
    import jax.numpy as jnp

    from intrinsicnerf_tpu.core.rays import create_rays
    from intrinsicnerf_tpu.data.replica import (
        default_replica_split,
        load_replica,
        rebuild_semantic_remap,
    )
    from intrinsicnerf_tpu.parallel.distributed import (
        allgather_semantic_classes,
        is_lead_process,
        local_train_ids,
    )
    from intrinsicnerf_tpu.train.prepare import (
        prepare_replica_bundle,
        replica_intrinsics,
    )

    if cfg.experiment.dataset_type != "replica":
        raise SystemExit(
            "multi-host data loading currently supports the replica "
            f"pipeline (got {cfg.experiment.dataset_type})"
        )
    for flag in ("sparse_views", "pixel_denoising", "region_denoising",
                 "super_resolution", "label_propagation"):
        if getattr(args, flag):
            raise SystemExit(
                f"--{flag} uses host-side randomness that would diverge "
                "across processes; run degradation experiments single-host"
            )

    train_ids, test_ids = default_replica_split(args.total_frames,
                                                args.split_step)
    local_ids, padded_n = local_train_ids(train_ids)
    lead = is_lead_process()
    data = load_replica(
        cfg.experiment.dataset_dir,
        local_ids,
        test_ids if lead else [],
        img_h=cfg.experiment.height,
        img_w=cfg.experiment.width,
    )
    rebuild_semantic_remap(
        data, allgather_semantic_classes(data.semantic_classes)
    )
    bundle = prepare_replica_bundle(cfg, data)

    # full-pose vis/test ray blocks, identical on every host
    traj = np.loadtxt(
        os.path.join(cfg.experiment.dataset_dir, "traj_w_c.txt"),
        delimiter=" ",
    ).reshape(-1, 4, 4)
    f = cfg.test_viz_factor
    hs = cfg.experiment.height // f
    ws = cfg.experiment.width // f
    fxs, fys, cxs, cys = replica_intrinsics(ws, hs)
    near, far = cfg.depth_range
    conv = cfg.experiment.convention
    rays_vis = create_rays(
        jnp.asarray(traj[train_ids], jnp.float32), hs, ws, fxs, fys, cxs,
        cys, near, far, convention=conv,
    )
    rays_test = create_rays(
        jnp.asarray(traj[test_ids], jnp.float32), hs, ws, fxs, fys, cxs,
        cys, near, far, convention=conv,
    )
    bundle = dataclasses.replace(
        bundle,
        rays_vis=rays_vis,
        rays_test=rays_test,
        # train-render metrics need all train images on one host; under
        # host-local loading they are skipped (eval metrics remain)
        train_gt={},
    )
    print(
        f"[host {jax.process_index()}/{jax.process_count()}] loaded "
        f"{len(local_ids)}/{padded_n} train frames (host-local shard)"
        + (", test GT on this host" if lead else "")
    )
    return bundle


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--gpu", type=str, default="")  # accepted for parity
    parser.add_argument("--n_iters", type=int, default=None)
    parser.add_argument("--total_frames", type=int, default=900)
    parser.add_argument("--split_step", type=int, default=5)
    # degradation experiment flags
    parser.add_argument("--sparse_views", action="store_true")
    parser.add_argument("--sparse_ratio", type=float, default=0.0)
    parser.add_argument("--random_sample", action="store_true")
    parser.add_argument("--pixel_denoising", action="store_true")
    parser.add_argument("--pixel_noise_ratio", type=float, default=0.0)
    parser.add_argument("--region_denoising", action="store_true")
    parser.add_argument("--region_noise_ratio", type=float, default=0.3)
    parser.add_argument("--super_resolution", action="store_true")
    parser.add_argument("--dense_sr", type=int, default=8)
    parser.add_argument("--label_propagation", action="store_true")
    parser.add_argument("--partial_perc", type=float, default=0.0)
    parser.add_argument("--no_progress", action="store_true")
    parser.add_argument(
        "--data_parallel", action="store_true",
        help="shard image pools over all devices (per-device ray batches, "
        "grad pmean); global batch = n_rays * n_devices",
    )
    # explicit multi-host rig (TPU pods auto-detect; CPU/GPU test rigs
    # pass these): each process loads ONLY its train-image shard
    parser.add_argument(
        "--seed", type=int, default=0,
        help="init/train RNG seed (the reference varies torch seeds per "
        "run; some (scene, config, seed) triples sit in NeRF's "
        "render-nothing local minimum - rerun with a different seed)",
    )
    parser.add_argument("--coordinator", type=str, default=None,
                        help="jax.distributed coordinator address host:port")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument(
        "--debug_nans", action="store_true",
        help="enable jax_debug_nans (the reference's autograd "
        "anomaly-mode analog, semantic_nerf.py:2)",
    )
    parser.add_argument(
        "--profile", type=int, default=0, metavar="N",
        help="trace N training steps with jax.profiler (written to "
        "<save_dir>/profile, viewable in TensorBoard/Perfetto)",
    )
    args = parser.parse_args()

    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    from intrinsicnerf_tpu.config import from_yaml
    from intrinsicnerf_tpu.train.prepare import (
        prepare_replica_bundle,
        prepare_scannet_bundle,
    )
    from intrinsicnerf_tpu.train.trainer import Trainer

    cfg = from_yaml(args.config_file)

    # distributed init must precede data loading: under multi-host each
    # process reads ONLY its train-image shard (local_train_ids)
    mesh = None
    n_proc = 1
    if args.data_parallel:
        from intrinsicnerf_tpu.parallel.distributed import initialize_distributed
        from intrinsicnerf_tpu.parallel.mesh import make_mesh

        _, n_proc = initialize_distributed(
            args.coordinator, args.num_processes, args.process_id
        )
        mesh = make_mesh()
        print(f"data-parallel over {mesh.devices.size} devices, "
              f"{n_proc} host(s)")

    if n_proc > 1:
        bundle = build_multihost_replica_bundle(cfg, args)
    else:
        data = build_dataset(cfg, args)
        if cfg.experiment.dataset_type == "scannet":
            bundle = prepare_scannet_bundle(cfg, data)
        else:
            bundle = prepare_replica_bundle(cfg, data)

    sample_fn = None
    if not cfg.raw.get("render", {}).get("no_batching", True):
        from intrinsicnerf_tpu.data.samplers import sample_ray_pairs_all_images

        def sample_fn(key, pools, step):
            return sample_ray_pairs_all_images(
                key, pools.rays, pools.rgb, bundle.h, bundle.w,
                cfg.train.n_rays, depth_pool=pools.depth,
                sem_pool=pools.semantic, mask_ids=pools.mask_ids,
            )

        print("batching mode: sampling pixels across all training images")

    with Trainer(cfg, bundle, seed=args.seed, mesh=mesh,
                 sample_fn=sample_fn) as trainer:
        trainer.profile_steps = args.profile
        trainer.maybe_resume()
        trainer.fit(n_iters=args.n_iters, progress=not args.no_progress)
    print("training complete")


if __name__ == "__main__":
    main()
