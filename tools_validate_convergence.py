"""Convergence validation: train the full object pipeline on a
ray-traced synthetic cube and report held-out PSNR + decomposition
statistics.  Runs in ~2 minutes on one TPU chip (or slowly on CPU).

Usage: python tools_validate_convergence.py [--steps 3000] [--res 64]
"""

import argparse
import dataclasses
import json
import time

import numpy as np


def raytrace_cube_views(n_views, res, radius=4.0, half=0.8):
    """Lambertian-ish axis-aligned cube: face color by normal, simple
    head-on shading; white background.  Returns images [N,H,W,4] RGBA
    and opengl c2w poses."""
    from intrinsicnerf_tpu.data.blender import pose_spherical
    from intrinsicnerf_tpu.core.rays import camera_ray_dirs, rays_to_world

    import jax.numpy as jnp

    face_albedo = {
        0: (0.85, 0.25, 0.2), 1: (0.2, 0.7, 0.3), 2: (0.25, 0.35, 0.85),
    }
    h = w = res
    focal = res * 1.2
    dirs_cam = np.asarray(
        camera_ray_dirs(h, w, focal, focal, w / 2, h / 2, convention="opengl")
    ).reshape(-1, 3)
    images, poses = [], []
    for i in range(n_views):
        theta = 360.0 * i / n_views
        c2w = np.asarray(pose_spherical(theta, -25.0, radius), np.float32)
        o, d = rays_to_world(jnp.asarray(c2w), jnp.asarray(dirs_cam)[None])
        o = np.asarray(o)[0]
        d = np.asarray(d)[0]
        # slab intersection with [-half, half]^3
        with np.errstate(divide="ignore", invalid="ignore"):
            t0 = (-half - o) / d
            t1 = (half - o) / d
        tmin = np.nanmax(np.minimum(t0, t1), axis=1)
        tmax = np.nanmin(np.maximum(t0, t1), axis=1)
        hit = (tmax > tmin) & (tmax > 0)
        t_hit = np.where(hit, np.maximum(tmin, 0), np.inf)
        p_hit = o + d * t_hit[:, None]
        axis = np.argmax(np.abs(p_hit), axis=1)
        img = np.ones((h * w, 3), np.float32)
        for ax, alb in face_albedo.items():
            sel = hit & (axis == ax)
            # shade by how head-on the ray meets the face
            ndl = np.clip(np.abs(d[sel, ax]) / np.linalg.norm(d[sel], axis=1), 0.2, 1)
            img[sel] = np.asarray(alb) * ndl[:, None]
        alpha = hit.astype(np.float32)
        images.append(
            np.concatenate([img, alpha[:, None]], 1).reshape(h, w, 4)
        )
        poses.append(c2w)
    return np.stack(images), np.stack(poses)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--res", type=int, default=64)
    parser.add_argument("--views", type=int, default=60)
    # sample-count knobs (kept configurable for sampling A/Bs)
    parser.add_argument("--n_coarse", type=int, default=64)
    parser.add_argument("--n_importance", type=int, default=64)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from intrinsicnerf_tpu.config import ExperimentConfig, FrameworkConfig, LoggingConfig
    from intrinsicnerf_tpu.core.metrics import psnr_np
    from intrinsicnerf_tpu.data.blender import BlenderData, spherical_render_poses
    from intrinsicnerf_tpu.models.mlp import MLPConfig
    from intrinsicnerf_tpu.render.pipeline import RenderConfig
    from intrinsicnerf_tpu.train.prepare import prepare_blender_bundle
    from intrinsicnerf_tpu.train.step import TrainConfig
    from intrinsicnerf_tpu.train.trainer import Trainer, make_object_sample_fn

    images, poses = raytrace_cube_views(args.views, args.res)
    n_test = 2
    data = BlenderData(
        images=images,
        poses=poses,
        render_poses=spherical_render_poses(8, radius=4.0),
        h=args.res,
        w=args.res,
        focal=args.res * 1.2,
        i_split=[
            np.arange(args.views - n_test),
            np.arange(args.views - n_test, args.views),
            np.arange(args.views - n_test, args.views),
        ],
    )
    on_tpu = jax.default_backend() == "tpu"
    cfg = FrameworkConfig(
        experiment=ExperimentConfig(
            save_dir="logs/validate_cube", dataset_type="blender",
            enable_semantic=False, enable_depth=False, convention="opengl",
        ),
        mlp=MLPConfig(
            pos_scalar_factor=1.0,
            compute_dtype=jnp.bfloat16,
            use_fused_kernel=on_tpu,
        ),
        render=RenderConfig(
            n_coarse=args.n_coarse, n_importance=args.n_importance,
            perturb=1.0, raw_noise_std=0.0, white_bkgd=True,
        ),
        train=TrainConfig(n_rays=512, lrate=5e-4, lrate_decay=250e3,
                          n_iters=args.steps, mask_mode="mask"),
        logging=LoggingConfig(
            step_log_tfb=500, step_save_ckpt=10**9, step_vis_train=10**9,
            step_val=10**9,
        ),
        depth_range=(2.0, 6.0),
        precrop_iters=300,
    )
    bundle, _ = prepare_blender_bundle(cfg, data)
    trainer = Trainer(cfg, bundle, sample_fn=make_object_sample_fn(cfg, bundle))

    t0 = time.time()
    trainer.fit(progress=False)
    dt = time.time() - t0
    print(f"{args.steps} steps in {dt:.1f}s = {args.steps/dt:.1f} steps/s")

    gt = bundle.test_gt["image"]
    psnrs, accs, albedo_means = [], [], []
    for i, view in enumerate(trainer.render_views(bundle.rays_test)):
        psnrs.append(psnr_np(view["rgb"], gt[i]))
        accs.append(float(view["acc"].mean()))
        albedo_means.append(float(view["albedo"].mean()))
    result = {
        "psnr": float(np.mean(psnrs)),
        "steps": args.steps,
        "steps_per_s": args.steps / dt,
        "mean_acc": float(np.mean(accs)),
    }
    print(json.dumps(result))
    assert result["psnr"] > 20.0, f"convergence check failed: {result}"
    print("CONVERGENCE OK")


if __name__ == "__main__":
    main()
