"""Import a reference PyTorch checkpoint into this framework's format.

Maps the torch state_dicts inside a reference ``{:06d}.ckpt`` (scene,
``/root/reference/SSR/training/trainer.py:1036-1048``) or ``{:06d}.tar``
(object, ``object_level/run_nerf.py:1035-1043``) onto our parameter
pytree and writes an Orbax checkpoint under
``<save_dir>/checkpoints/<global_step>``.  After that, every native
path works on the imported model: ``train_scene.py`` /
``train_object.py`` auto-resume (continued training or
``--render_only``), ``extract_mesh.py``, and the editing/video tools.

Usage:
  python import_reference_ckpt.py 200000.ckpt --save_dir logs/room0
  python import_reference_ckpt.py 200000.tar  --save_dir logs/chair --object
  python import_reference_ckpt.py 200000.ckpt --config_file cfg.yaml

Architecture (depth/width/skips/PE bands/semantic classes) is inferred
from the checkpoint shapes; ``--config_file`` additionally supplies the
scene-scale factor, save_dir, and the compute-path knobs
(use_fused_kernel / compute_dtype) so the written checkpoint's pytree
structure matches what a Trainer configured from the same file builds.
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt", help="reference .ckpt/.tar path")
    ap.add_argument(
        "--save_dir",
        default=None,
        help="experiment dir to write <save_dir>/checkpoints into "
        "(default: the config's experiment.save_dir)",
    )
    ap.add_argument(
        "--config_file",
        default=None,
        help="scene YAML (or object txt with --object) to take "
        "save_dir + scalar_factor from",
    )
    ap.add_argument(
        "--object",
        action="store_true",
        help="object-level checkpoint (scalar_factor 1; txt config)",
    )
    ap.add_argument(
        "--scalar_factor",
        type=float,
        default=None,
        help="PE scene-scale divisor (default: 10 scene / 1 object, "
        "or the config's value)",
    )
    args = ap.parse_args()

    save_dir = args.save_dir
    scalar = args.scalar_factor
    # compute-path knobs must follow the config the Trainer will use:
    # a config with use_fused_kernel: false builds UNPACKED state, and a
    # packed import would fail auto-resume with an Orbax structure
    # mismatch (advisor r4)
    compute_dtype = None
    use_fused = None
    if args.config_file:
        from intrinsicnerf_tpu.config import from_object_txt, from_yaml

        cfg = (
            from_object_txt(args.config_file)
            if args.object
            else from_yaml(args.config_file)
        )
        save_dir = save_dir or cfg.experiment.save_dir
        if scalar is None:
            scalar = cfg.mlp.pos_scalar_factor
        compute_dtype = cfg.mlp.compute_dtype
        use_fused = cfg.mlp.use_fused_kernel
    if save_dir is None:
        raise SystemExit("need --save_dir or --config_file")
    if scalar is None:
        scalar = 1.0 if args.object else 10.0

    from intrinsicnerf_tpu.tools.import_ckpt import import_to_orbax

    step, mcfg = import_to_orbax(
        args.ckpt, save_dir, pos_scalar_factor=scalar,
        compute_dtype=compute_dtype, use_fused_kernel=use_fused,
    )
    print(
        f"imported {args.ckpt} -> {save_dir}/checkpoints @ step {step} "
        f"(D={mcfg.depth} W={mcfg.width} C={mcfg.num_semantic_classes} "
        f"scalar_factor={mcfg.pos_scalar_factor} "
        f"fused={'yes' if mcfg.use_fused_kernel else 'no'})"
    )


if __name__ == "__main__":
    main()
