"""Colored/semantic mesh extraction CLI.

Behavioral parity target: ``SSR/extract_colour_mesh.py``: rebuild the
trained model from its checkpoint, query the fine MLP densities on a
``grid_dim^3`` grid inside the scene bounds, marching-cubes the
occupancy at ``--level``, clean small clusters, color vertices by
rendering along negative vertex normals (or by semantic argmax with
``--sem``), export PLY.

Usage (scene):
  python extract_mesh.py --config_file cfg.yaml --mesh_file scene/mesh.ply
Usage (object):
  python extract_mesh.py --config configs/lego.txt
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", type=str, default=None, help="scene YAML")
    parser.add_argument("--config", type=str, default=None, help="object txt")
    parser.add_argument("--mesh_file", type=str, default=None,
                        help="scene mesh PLY defining oriented bounds")
    parser.add_argument("--grid_dim", type=int, default=256)
    parser.add_argument("--level", type=float, default=0.45)
    parser.add_argument("--min_cluster", type=int, default=400,
                        help="drop components with fewer faces; pass -1 to "
                        "keep only the largest component "
                        "(open3d keep_single_cluster parity)")
    parser.add_argument("--near_t", type=float, default=1.0)
    parser.add_argument("--sem", action="store_true",
                        help="color by semantic class instead of rgb")
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--total_frames", type=int, default=900)
    parser.add_argument("--split_step", type=int, default=5)
    args = parser.parse_args()
    assert (args.config_file is None) != (args.config is None), (
        "pass exactly one of --config_file (scene) / --config (object)"
    )

    from intrinsicnerf_tpu.geometry.mesh import extract_colour_mesh, read_ply
    from intrinsicnerf_tpu.train.trainer import Trainer

    if args.config_file:
        import types

        from intrinsicnerf_tpu.config import from_yaml
        from intrinsicnerf_tpu.train.prepare import (
            prepare_replica_bundle,
            prepare_scannet_bundle,
        )
        from train_scene import build_dataset

        cfg = from_yaml(args.config_file)
        ds_args = types.SimpleNamespace(
            total_frames=args.total_frames, split_step=args.split_step,
            sparse_views=False, pixel_denoising=False, region_denoising=False,
            super_resolution=False, label_propagation=False,
        )
        data = build_dataset(cfg, ds_args)
        if cfg.experiment.dataset_type == "scannet":
            bundle = prepare_scannet_bundle(cfg, data)
        else:
            bundle = prepare_replica_bundle(cfg, data)
        trainer = Trainer(cfg, bundle)
    else:
        from intrinsicnerf_tpu.config import from_object_txt
        from intrinsicnerf_tpu.data.blender import load_blender_data
        from intrinsicnerf_tpu.train.prepare import prepare_blender_bundle

        cfg = from_object_txt(args.config)
        data = load_blender_data(
            cfg.experiment.dataset_dir, half_res=cfg.half_res,
            testskip=cfg.testskip,
        )
        bundle, _ = prepare_blender_bundle(cfg, data)
        trainer = Trainer(cfg, bundle)

    step = trainer.maybe_resume()
    if step == 0:
        print("WARNING: no checkpoint found — extracting from random init")

    scene_points = None
    if args.mesh_file:
        scene_points, _ = read_ply(args.mesh_file)

    out = args.out or os.path.join(
        cfg.experiment.save_dir,
        f"{'semantic' if args.sem else 'colour'}_mesh_dim{args.grid_dim}"
        f"_step{step}.ply",
    )
    extract_colour_mesh(
        trainer,
        scene_points=scene_points,
        grid_dim=args.grid_dim,
        level=args.level,
        min_cluster_faces=args.min_cluster,
        near_t=args.near_t,
        color_mode="semantic" if args.sem else "rgb",
        out_path=out,
    )


if __name__ == "__main__":
    main()
