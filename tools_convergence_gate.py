"""Gated convergence regression (VERDICT r2 item 7).

Trains the *unmodified scene CLI* (`train_scene.py`, fused Pallas path
on TPU) on the synthetic Replica cube room for a few thousand steps and
asserts quality thresholds:

- held-out PSNR / mIoU / total-acc above floors calibrated from the
  recorded HEAD runs (README: PSNR 24.3 / mIoU 0.885 / acc 0.956 at
  160x120 x 3k steps),
- reflectance cluster palettes are sane (per-class dirs, centers in
  [0,1], non-degenerate count),
- an ablation arm (`no_intrinsic_loss: true`) degenerates exactly the
  way the intrinsic priors are supposed to prevent: its rendered
  residual absorbs the scene (mean |residual| jumps >5x; measured 72x)
  — i.e. the priors are load-bearing for the decomposition, not
  decorative.

Writes CONVERGENCE_r{N}.json at the repo root with every number and
threshold so the artifact is judgeable at HEAD.

Usage: python tools_convergence_gate.py [--steps 3000] [--out CONVERGENCE_r03.json]
"""

import argparse
import csv
import glob
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

THRESHOLDS = {
    "psnr": 22.0,
    "miou": 0.75,
    "total_acc": 0.90,
    # ablation mean|residual| / main mean|residual| must exceed this:
    # with the priors the residual decays to ~0.004; without them it
    # absorbs the scene (~0.28 measured)
    "residual_ratio": 5.0,
}


def run_scene(cfg_path, workdir, tag):
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "train_scene.py"),
            "--config_file",
            str(cfg_path),
            "--total_frames",
            "60",
            "--split_step",
            "5",
            "--no_progress",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
    )
    sys.stderr.write(out.stdout[-2000:] + "\n")
    if out.returncode != 0:
        raise RuntimeError(f"{tag} run failed:\n{out.stderr[-4000:]}")
    return out.stdout


def read_test_metrics(save_dir):
    """Final Test/* scalars from the trainer's CSV log."""
    metrics = {}
    with open(os.path.join(save_dir, "tfb_logs", "scalars.csv")) as f:
        for step, name, val in csv.reader(f):
            if name.startswith("Test/"):
                metrics[name[5:]] = float(val)  # last write wins
    return metrics


def decomposition_stats(save_dir):
    """Mean |residual| and albedo TV of the rendered test views."""
    import imageio.v2 as imageio

    dirs = sorted(glob.glob(os.path.join(save_dir, "test_render", "step_*")))
    assert dirs, f"no test renders under {save_dir}"
    res = [
        float(imageio.imread(p).astype(np.float32).mean() / 255.0)
        for p in sorted(glob.glob(os.path.join(dirs[-1], "residual_*.png")))
    ]
    tvs = []
    for p in sorted(glob.glob(os.path.join(dirs[-1], "albedo_*.png"))):
        a = imageio.imread(p).astype(np.float32) / 255.0
        tvs.append(
            float(
                np.abs(np.diff(a, axis=0)).mean()
                + np.abs(np.diff(a, axis=1)).mean()
            )
        )
    assert res and tvs, f"missing decomposition renders in {dirs[-1]}"
    return float(np.mean(res)), float(np.mean(tvs))


def check_cluster_palette(save_dir):
    """Reference-format cluster JSON sanity for the last rebuild."""
    dirs = sorted(glob.glob(os.path.join(save_dir, "train_render", "step_*")))
    assert dirs, f"no train renders under {save_dir}"
    cj = os.path.join(dirs[-1], "cluster", "clusters.json")
    assert os.path.exists(cj), f"missing {cj}"
    data = json.loads(open(cj).read())
    n_cls = int(data["class_num"])
    assert n_cls >= 2, f"degenerate class_num {n_cls}"
    n_centers = 0
    for c in range(n_cls):
        cfg = os.path.join(dirs[-1], "cluster", f"c{c}", "config.json")
        assert os.path.exists(cfg), f"missing {cfg}"
        cc = json.loads(open(cfg).read())
        centers = np.asarray(cc.get("rgb_centers", []), np.float32)
        if centers.size:
            assert centers.min() >= -1e-6 and centers.max() <= 1 + 1e-6, (
                f"class {c} centers outside [0,1]"
            )
            n_centers += len(centers)
    assert n_centers >= n_cls, f"too few cluster centers ({n_centers})"
    return {"class_num": n_cls, "total_centers": n_centers}


def make_cfg(workdir, data_dir, tag, steps, ablation=False):
    import yaml

    save_dir = os.path.join(workdir, f"logs_{tag}")
    cfg = {
        "experiment": {
            "save_dir": save_dir,
            "dataset_dir": data_dir,
            "dataset_type": "replica",
            "convention": "opencv",
            "width": 160,
            "height": 120,
            "enable_semantic": True,
            "enable_depth": True,
        },
        "model": {
            "netdepth": 8, "netwidth": 256,
            "netdepth_fine": 8, "netwidth_fine": 256,
            "chunk": "1024*32", "netchunk": "1024*32",
        },
        "render": {
            "N_rays": "32*16", "N_samples": 64, "N_importance": 128,
            "perturb": 1, "use_viewdirs": True, "multires": 10,
            "multires_views": 4, "raw_noise_std": 1, "test_viz_factor": 1,
            "depth_range": [0.1, 10.0], "white_bkgd": False,
        },
        "train": {
            "lrate": "5e-4", "lrate_decay": "250e3", "N_iters": steps,
            "wgt_sem": 0.04, "w_n": 0.01, "w_f": 0.005, "w_i1": 0.1,
            "w_i2": 0.01, "no_cluster": bool(ablation),
            "no_semantic_tree": False, "no_intrinsic_loss": bool(ablation),
        },
        "logging": {
            "step_log_print": 1000, "step_log_tfb": 1000,
            "step_save_ckpt": steps, "step_val": steps,
            "step_vis_train": max(steps // 2, 1),
        },
    }
    path = os.path.join(workdir, f"cfg_{tag}.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path, save_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--out", type=str, default="CONVERGENCE_r03.json")
    parser.add_argument("--workdir", type=str, default=None)
    parser.add_argument(
        "--reuse", action="store_true",
        help="re-stamp the artifact from existing --workdir runs",
    )
    args = parser.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="convergence_gate_")
    data_dir = os.path.join(workdir, "data")
    if not args.reuse:
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools_make_synthetic_replica.py"),
                data_dir, "--frames", "60", "--width", "160", "--height", "120",
            ],
            check=True,
            cwd=REPO,
            capture_output=True,
        )

    cfg_main, dir_main = make_cfg(workdir, data_dir, "main", args.steps)
    if not args.reuse:
        run_scene(cfg_main, workdir, "main")
    metrics = read_test_metrics(dir_main)
    palette = check_cluster_palette(dir_main)
    res_main, tv_main = decomposition_stats(dir_main)

    cfg_abl, dir_abl = make_cfg(
        workdir, data_dir, "ablation", args.steps, ablation=True
    )
    if not args.reuse:
        run_scene(cfg_abl, workdir, "ablation")
    res_abl, tv_abl = decomposition_stats(dir_abl)

    import jax

    dev = jax.devices()[0]
    # Recompute the MLP-path decision from the config on both paths: a
    # stdout substring grep would flip on unrelated log lines containing
    # "fused" (or on wording changes), making the stamped field
    # unreliable (advisor r3).
    from intrinsicnerf_tpu.config import from_yaml
    from intrinsicnerf_tpu.train.step import packs_state

    fused_active = packs_state(from_yaml(cfg_main).mlp)
    result = {
        "steps": args.steps,
        "device": f"{dev.platform}:{dev.device_kind}",
        "fused_kernel_active": fused_active,
        "metrics": {k: round(v, 4) for k, v in metrics.items()},
        "cluster_palette": palette,
        "residual_mean_main": round(res_main, 5),
        "residual_mean_no_intrinsic": round(res_abl, 5),
        "residual_ratio": round(res_abl / max(res_main, 1e-6), 2),
        "albedo_tv_main": round(tv_main, 5),
        "albedo_tv_no_intrinsic": round(tv_abl, 5),
        "thresholds": THRESHOLDS,
    }
    checks = {
        "psnr": metrics.get("psnr", 0.0) > THRESHOLDS["psnr"],
        "miou": metrics.get("miou", 0.0) > THRESHOLDS["miou"],
        "total_acc": metrics.get("total_acc", 0.0) > THRESHOLDS["total_acc"],
        "residual_ratio": res_abl / max(res_main, 1e-6)
        > THRESHOLDS["residual_ratio"],
    }
    result["checks"] = checks
    result["pass"] = all(checks.values())
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result, indent=2))
    assert result["pass"], f"convergence gate FAILED: {checks}"
    print("CONVERGENCE GATE OK")


if __name__ == "__main__":
    main()
