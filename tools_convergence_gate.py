"""Gated convergence regression (VERDICT r2 item 7; hardened r4 item 3).

Trains the *unmodified scene CLI* (`train_scene.py`, fused Pallas path
on TPU) on the synthetic **multi-object textured room** (10 semantic
classes, ~38 flat albedos, thin table legs + pillar, spheres with
smooth shading — ``tools_make_synthetic_replica.py``) and asserts
quality thresholds, plus two ablation arms that must each *fail* a
check the corresponding loss is supposed to carry:

- **main** (full loss stack): held-out PSNR / mIoU / total-acc floors,
  reflectance palette sanity + **palette recall** (every albedo color
  actually observed in the GT images must have a mean-shift center
  within ``drgb_tol`` in the reference's d_rgb space), and **albedo
  fidelity** (rendered albedo vs the generator's ground-truth albedo,
  scale-aligned MAE — intrinsic decomposition is only defined up to a
  global albedo/shading scale, which the intensity prior anchors).
- **no_intrinsic** (`no_intrinsic_loss` + `no_cluster`): the rendered
  residual must absorb the scene (mean |residual| ratio vs main above
  ``residual_ratio``) — the priors, not the photometric loss, keep the
  decomposition non-degenerate.
- **no_cluster** (intrinsic priors on, cluster loss off): its rendered
  albedo must be measurably less piecewise-constant (higher TV) — the
  adaptive clustering stage's actual promise is flattening albedo onto
  the palette (it trades a little GT-MAE for constancy, so MAE is the
  wrong axis to gate it on; both MAEs are still recorded).

Writes CONVERGENCE_r{N}.json at the repo root with every number and
threshold so the artifact is judgeable at HEAD.

Usage: python tools_convergence_gate.py [--steps 10000] [--out CONVERGENCE_r04.json]
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
    # calibrated on the r4 hard scene at 10k steps (see CONVERGENCE_r04)
    "psnr": 28.0,
    "miou": 0.85,
    "total_acc": 0.93,
    "residual_ratio": 5.0,
    "palette_centers": 40,
    "palette_recall": 0.60,
    "drgb_tol": 0.08,
    # measured 0.128 at 10k steps: global scale alignment cannot remove
    # local albedo<->shading shifts the priors only partially constrain;
    # the load-bearing check is the ratio vs the no_intrinsic arm below
    "albedo_mae": 0.16,
    # the intrinsic priors must be what carries albedo fidelity
    "albedo_mae_ablation_ratio": 1.5,
}

TOTAL_FRAMES = 60
SPLIT_STEP = 5  # test ids = every 5th frame offset 2 (train_scene default)


def run_scene(cfg_path, workdir, tag):
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "train_scene.py"),
            "--config_file",
            str(cfg_path),
            "--total_frames",
            str(TOTAL_FRAMES),
            "--split_step",
            str(SPLIT_STEP),
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


def _last_test_dir(save_dir):
    dirs = sorted(glob.glob(os.path.join(save_dir, "test_render", "step_*")))
    assert dirs, f"no test renders under {save_dir}"
    return dirs[-1]


def decomposition_stats(save_dir):
    """Mean |residual| and albedo TV of the rendered test views."""
    import imageio.v2 as imageio

    d = _last_test_dir(save_dir)
    res = [
        float(imageio.imread(p).astype(np.float32).mean() / 255.0)
        for p in sorted(glob.glob(os.path.join(d, "residual_*.png")))
    ]
    tvs = []
    for p in sorted(glob.glob(os.path.join(d, "albedo_*.png"))):
        a = imageio.imread(p).astype(np.float32) / 255.0
        tvs.append(
            float(
                np.abs(np.diff(a, axis=0)).mean()
                + np.abs(np.diff(a, axis=1)).mean()
            )
        )
    assert res and tvs, f"missing decomposition renders in {d}"
    return float(np.mean(res)), float(np.mean(tvs))


def albedo_fidelity(save_dir, data_dir):
    """Scale-aligned MAE between rendered test albedo and the
    generator's ground truth.  Intrinsic decomposition is defined up to
    a global albedo<->shading scale, so each view is aligned by the
    median per-pixel ratio before the error is taken."""
    import imageio.v2 as imageio

    d = _last_test_dir(save_dir)
    test_ids = [
        i for i in range(TOTAL_FRAMES) if i % SPLIT_STEP == 2
    ]  # data/replica.default_replica_split
    maes = []
    for k, p in enumerate(sorted(glob.glob(os.path.join(d, "albedo_*.png")))):
        got = imageio.imread(p).astype(np.float32) / 255.0
        gt = (
            imageio.imread(
                os.path.join(data_dir, "gt_albedo", f"albedo_{test_ids[k]}.png")
            ).astype(np.float32)
            / 255.0
        )
        assert got.shape == gt.shape, (got.shape, gt.shape)
        m = gt.mean(-1) > 0.05
        scale = float(np.median(gt[m].sum(-1) / np.maximum(got[m].sum(-1), 1e-6)))
        scale = float(np.clip(scale, 0.25, 4.0))
        maes.append(float(np.abs(got * scale - gt)[m].mean()))
    assert maes, f"missing albedo renders in {d}"
    return float(np.mean(maes))


def _map_drgb(rgb):
    """Reference d_rgb color space (cluster.py:316-330) in numpy."""
    s = rgb.sum(-1)
    s = np.maximum(s, 1e-6)
    return np.stack([s / 3.0 * 0.5, rgb[..., 1] / s, rgb[..., 2] / s], -1)


def check_cluster_palette(save_dir, data_dir):
    """Reference-format cluster JSON sanity + palette recall: every GT
    albedo color observed in the training images must be represented by
    a mean-shift center within ``drgb_tol``."""
    import imageio.v2 as imageio

    dirs = sorted(glob.glob(os.path.join(save_dir, "train_render", "step_*")))
    assert dirs, f"no train renders under {save_dir}"
    cj = os.path.join(dirs[-1], "cluster", "clusters.json")
    assert os.path.exists(cj), f"missing {cj}"
    data = json.loads(open(cj).read())
    n_cls = int(data["class_num"])
    assert n_cls >= 2, f"degenerate class_num {n_cls}"
    centers_all = []
    for c in range(n_cls):
        cfg = os.path.join(dirs[-1], "cluster", f"c{c}", "config.json")
        assert os.path.exists(cfg), f"missing {cfg}"
        cc = json.loads(open(cfg).read())
        centers = np.asarray(cc.get("rgb_centers", []), np.float32)
        if centers.size:
            assert centers.min() >= -1e-6 and centers.max() <= 1 + 1e-6, (
                f"class {c} centers outside [0,1]"
            )
            centers_all.append(centers)
    n_centers = int(sum(len(c) for c in centers_all))
    assert n_centers >= n_cls, f"too few cluster centers ({n_centers})"

    # observed GT colors: palette entries covering >=0.2% of GT-albedo
    # pixels across the train frames (hidden faces can't be recovered)
    palette = np.asarray(
        json.loads(open(os.path.join(data_dir, "albedo_colors.json")).read())[
            "albedos"
        ],
        np.float32,
    )
    train_ids = [
        i for i in range(TOTAL_FRAMES) if i % SPLIT_STEP != 2
    ]
    counts = np.zeros(len(palette), np.int64)
    total_px = 0
    for i in train_ids[:: max(len(train_ids) // 12, 1)]:  # 12 frames suffice
        a = (
            imageio.imread(
                os.path.join(data_dir, "gt_albedo", f"albedo_{i}.png")
            ).astype(np.float32)
            / 255.0
        ).reshape(-1, 3)
        total_px += len(a)
        d2 = ((a[:, None, :] - palette[None, :, :]) ** 2).sum(-1)
        nearest = np.argmin(d2, axis=1)
        ok = d2[np.arange(len(a)), nearest] < 1e-3  # quantization tol
        np.add.at(counts, nearest[ok], 1)
    observed = palette[counts / max(total_px, 1) >= 0.002]

    cen = np.concatenate(centers_all) if centers_all else np.zeros((0, 3))
    d_obs = _map_drgb(observed)
    d_cen = _map_drgb(cen)
    dist = np.sqrt(
        ((d_obs[:, None, :] - d_cen[None, :, :]) ** 2).sum(-1)
    ).min(axis=1)
    recall = float((dist < THRESHOLDS["drgb_tol"]).mean())
    return {
        "class_num": n_cls,
        "total_centers": n_centers,
        "observed_gt_colors": int(len(observed)),
        "palette_recall": round(recall, 4),
        "recall_mean_dist": round(float(dist.mean()), 4),
    }


def make_cfg(workdir, data_dir, tag, steps, ablation="none"):
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
            "w_i2": 0.01,
            "no_cluster": ablation in ("no_intrinsic", "no_cluster"),
            "no_semantic_tree": False,
            "no_intrinsic_loss": ablation == "no_intrinsic",
        },
        "logging": {
            "step_log_print": 1000, "step_log_tfb": 1000,
            "step_save_ckpt": steps, "step_val": steps,
            "step_vis_train": max(steps // 4, 1),
        },
    }
    path = os.path.join(workdir, f"cfg_{tag}.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path, save_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=10000)
    parser.add_argument("--out", type=str, default="CONVERGENCE_r04.json")
    parser.add_argument("--workdir", type=str, default=None)
    parser.add_argument(
        "--reuse", action="store_true",
        help="re-stamp the artifact from existing --workdir runs",
    )
    args = parser.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="convergence_gate_")
    print(f"workdir: {workdir}")
    data_dir = os.path.join(workdir, "data")
    if not args.reuse:
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools_make_synthetic_replica.py"),
                data_dir, "--frames", str(TOTAL_FRAMES),
                "--width", "160", "--height", "120",
            ],
            check=True,
            cwd=REPO,
            capture_output=True,
        )

    cfg_main, dir_main = make_cfg(workdir, data_dir, "main", args.steps)
    if not args.reuse:
        run_scene(cfg_main, workdir, "main")
    metrics = read_test_metrics(dir_main)
    palette = check_cluster_palette(dir_main, data_dir)
    res_main, tv_main = decomposition_stats(dir_main)
    mae_main = albedo_fidelity(dir_main, data_dir)

    cfg_abl, dir_abl = make_cfg(
        workdir, data_dir, "no_intrinsic", args.steps, ablation="no_intrinsic"
    )
    if not args.reuse:
        run_scene(cfg_abl, workdir, "no_intrinsic")
    res_abl, tv_abl = decomposition_stats(dir_abl)
    mae_abl = albedo_fidelity(dir_abl, data_dir)

    cfg_nc, dir_nc = make_cfg(
        workdir, data_dir, "no_cluster", args.steps, ablation="no_cluster"
    )
    if not args.reuse:
        run_scene(cfg_nc, workdir, "no_cluster")
    mae_nc = albedo_fidelity(dir_nc, data_dir)
    _res_nc, tv_nc = decomposition_stats(dir_nc)

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
        "scene": "hard multi-object room (10 classes, 38 albedos, thin structures)",
        "device": f"{dev.platform}:{dev.device_kind}",
        "fused_kernel_active": fused_active,
        "metrics": {k: round(v, 4) for k, v in metrics.items()},
        "cluster_palette": palette,
        "albedo_mae_main": round(mae_main, 5),
        "albedo_mae_no_intrinsic": round(mae_abl, 5),
        "albedo_mae_no_cluster": round(mae_nc, 5),
        "albedo_tv_no_cluster": round(tv_nc, 5),
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
        "palette_centers": palette["total_centers"]
        >= THRESHOLDS["palette_centers"],
        "palette_recall": palette["palette_recall"]
        >= THRESHOLDS["palette_recall"],
        "albedo_mae": mae_main < THRESHOLDS["albedo_mae"],
        # the intrinsic priors must be load-bearing for albedo fidelity:
        # without them the decomposition degenerates and albedo-vs-GT
        # error must jump by at least the ablation ratio
        "intrinsic_improves_albedo": mae_abl
        > mae_main * THRESHOLDS["albedo_mae_ablation_ratio"],
        # the cluster stage's promise is piecewise-CONSTANCY, not GT-MAE
        # (it pulls albedo onto mean-shift centers, which can move it
        # slightly off GT while flattening it): removing it must leave
        # the rendered albedo measurably less flat
        "cluster_flattens_albedo": tv_main < tv_nc,
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
