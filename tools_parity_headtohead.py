"""Head-to-head trained-parity A/B vs the live PyTorch reference
(VERDICT r3 missing #1 / next-round item 1).

Trains BOTH implementations on the same synthetic Replica-format scene
at the same config — the reference's own ``SSRTrainer`` loop
(``/root/reference/SSR/training/trainer.py:851-1009``) run unmodified
on CPU (with the same dependency stubs the parity tests use), and our
``train_scene.py`` CLI — evaluating held-out PSNR / mIoU at the same
step cadence, and gates on ours matching or beating the reference's
final numbers at equal steps.  This is the trained-quality half of the
north star made directly observable: not op-level parity, an actual
side-by-side training run of the reference code.

The config is scaled to what 2 CPU cores can train in ~30 min
(80x60, 256 sampled rays -> 512 paired, 32+64 samples, default 1500
steps) — both sides use EXACTLY the same scene, schedule, loss weights
and cluster-rebuild cadence (every 500 steps, so the adaptive
clustering stage engages on both sides).

Phases can run separately (the reference side is CPU/torch-only and
can run concurrently with TPU work):

  python tools_parity_headtohead.py --phase data
  python tools_parity_headtohead.py --phase ref      # ~30 min, CPU
  python tools_parity_headtohead.py --phase ours     # ~2 min, TPU
  python tools_parity_headtohead.py --phase stamp    # writes PARITY_r04.json
  python tools_parity_headtohead.py                  # all of the above

The reference checkout is used READ-ONLY as the oracle (imported from
/root/reference, never copied).
"""

import argparse
import csv
import glob
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference"

# matched experiment config (both sides)
H, W = 60, 80
N_RAYS = 256  # sampled pixels; 2x after pairing (64 collapses: see PARITY notes)
N_SAMPLES, N_IMPORTANCE = 32, 64
FRAMES = 100  # standard Replica split: train = every 5th (20), test = +2 (20)
VIS_EVERY = 500  # cluster-rebuild cadence (both sides)
TEST_VIZ_FACTOR = 2  # eval at 40x30 (CPU render cost)
# white_bkgd on BOTH sides: at this scale some rays are still empty at
# the first cluster rebuild, and the reference's d_rgb mapping
# (cluster.py:316-330) divides by sum(albedo)==0 for black empty rays,
# NaN-crashing sklearn's estimate_bandwidth.  White-background
# compensation (raw2outputs, model_utils.py:109-114) makes empty albedo
# (1,1,1) — a reference-supported code path, identical on both sides.
GATE = {
    "psnr_margin": 0.25,
    "miou_margin": 0.02,
    # decomposition margins (VERDICT r4 missing #2): held-out albedo
    # vs the generator's GT albedo (scale-aligned MAE, same alignment
    # applied to both sides) and the rendered residual magnitude
    "albedo_mae_margin": 0.02,
    "residual_mean_margin": 0.02,
}
# NOTE on the sample counts: 32+64 rather than a cheaper 16+32 —
# at 16+32 the "render nothing" local minimum is close enough that the
# reference itself collapsed into it at batch 128 (it recovers from
# shallow dips at batch 512).  Full-step loss+gradient parity between
# the implementations is EXACT (loss rel diff 0.0, all grads allclose —
# tests/test_reference_parity.py::test_full_step_loss_and_grad_parity),
# so that basin is a property of the configuration, not either
# implementation; 32+64 keeps both sides comfortably in the stable
# regime at ~4x less CPU than the reference's published 64+128.


def workdir_of(args):
    d = args.workdir or os.path.join("/tmp", "parity_headtohead")
    os.makedirs(d, exist_ok=True)
    return d


def phase_data(wd):
    data_dir = os.path.join(wd, "data")
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools_make_synthetic_replica.py"),
            data_dir, "--frames", str(FRAMES),
            "--width", str(W), "--height", str(H),
        ],
        check=True, cwd=REPO, capture_output=True,
    )
    # fake Replica semantic_info dir (the reference's prepare_data needs
    # info_semantic.json with exactly 101 classes, trainer.py:169-175)
    scene_file = os.path.join(wd, "semantic_info")
    os.makedirs(scene_file, exist_ok=True)
    with open(os.path.join(scene_file, "info_semantic.json"), "w") as f:
        json.dump(
            {
                "classes": [
                    {"id": i + 1, "name": f"class_{i + 1}"} for i in range(101)
                ],
                "id_to_label": list(range(102)),
            },
            f,
        )
    print(f"data ready under {wd}")


# ------------------------------------------------------------- reference side


def _install_ref_stubs():
    """Same read-only shim set as tests/test_reference_parity.py, plus a
    *functional* imgviz stub (label_colormap / depth2rgb are used on the
    data path, not just for pretty pictures)."""
    import types

    import torch

    sys.path.insert(0, REF)
    def _stub_getattr(name):
        # dunders must raise: torch._dynamo inspects every imported
        # module at import time and chokes on a callable __file__
        if name.startswith("__"):
            raise AttributeError(name)
        return lambda *a, **k: None

    for mod in ("open3d", "trimesh"):
        if mod not in sys.modules:
            try:
                __import__(mod)
            except ImportError:
                stub = types.ModuleType(mod)
                stub.__getattr__ = _stub_getattr
                sys.modules[mod] = stub

    if "skimage" not in sys.modules:
        try:
            __import__("skimage")
        except ImportError:
            # replica_datasets only does `from skimage.io import imread`
            # (the actual reads go through cv2); imageio backs the stub
            import imageio.v2 as imageio

            skimage = types.ModuleType("skimage")
            skio = types.ModuleType("skimage.io")
            skio.imread = imageio.imread
            skimage.io = skio
            sys.modules["skimage"] = skimage
            sys.modules["skimage.io"] = skio

    if "imgviz" not in sys.modules:
        try:
            __import__("imgviz")
        except ImportError:
            imgviz = types.ModuleType("imgviz")

            def label_colormap(n_label=256):
                # the standard PASCAL-VOC bit-twiddling colormap
                cmap = np.zeros((n_label, 3), np.uint8)
                for i in range(n_label):
                    r = g = b = 0
                    c = i
                    for j in range(8):
                        r |= ((c >> 0) & 1) << (7 - j)
                        g |= ((c >> 1) & 1) << (7 - j)
                        b |= ((c >> 2) & 1) << (7 - j)
                        c >>= 3
                    cmap[i] = (r, g, b)
                return cmap

            def depth2rgb(depth, min_value=None, max_value=None):
                d = np.asarray(depth, np.float32)
                lo = float(d.min() if min_value is None else min_value)
                hi = float(d.max() if max_value is None else max_value)
                x = np.clip((d - lo) / max(hi - lo, 1e-6), 0, 1)
                return (np.stack([x, x, x], -1) * 255).astype(np.uint8)

            imgviz.label_colormap = label_colormap
            imgviz.depth2rgb = depth2rgb
            draw = types.ModuleType("imgviz.draw")
            draw.text_size = lambda *a, **k: (10, 10)
            draw.rectangle = lambda *a, **k: None
            draw.text = lambda *a, **k: None
            imgviz.draw = draw
            sys.modules["imgviz"] = imgviz
            sys.modules["imgviz.draw"] = draw

    torch.Tensor.cuda = lambda self, *a, **k: self
    # the reference targets numpy<1.24 (`np.float` in
    # training_utils.py:70); restore the alias for this process
    if not hasattr(np, "float"):
        np.float = float
    if not hasattr(np, "int"):
        np.int = int


def _ref_eval(trainer, torch):
    """Held-out PSNR / mIoU exactly as our evaluate() computes them:
    per-view PSNR averaged, confusion-matrix mIoU with void==-1."""
    import torch.nn.functional as F

    from SSR.training.training_utils import calculate_segmentation_metrics

    trainer.training = False
    trainer.ssr_net_coarse.eval()
    trainer.ssr_net_fine.eval()
    psnrs, sem_preds = [], []
    with torch.no_grad():
        for i in range(trainer.num_test):
            out = trainer.render_rays(trainer.rays_test[i])
            rgb = (
                out["rgb_fine"]
                .cpu()
                .numpy()
                .reshape(trainer.H_scaled, trainer.W_scaled, 3)
            )
            gt = trainer.test_image_scaled[i].cpu().numpy()
            mse = float(np.mean((rgb - gt) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
            sem_preds.append(
                torch.argmax(F.softmax(out["sem_logits_fine"], dim=-1), dim=-1)
                .cpu()
                .numpy()
                .reshape(trainer.H_scaled, trainer.W_scaled)
            )
    trainer.training = True
    trainer.ssr_net_coarse.train()
    trainer.ssr_net_fine.train()
    miou, miou_valid, acc, cls_acc, _ = calculate_segmentation_metrics(
        trainer.test_semantic_scaled,
        np.stack(sem_preds),
        trainer.num_valid_semantic_class,
        ignore_label=-1,
    )
    return {
        "psnr": float(np.mean(psnrs)),
        "miou": float(miou),
        "total_acc": float(acc),
    }


def _ref_decomposition(trainer, torch):
    """Final-state decomposition renders of the held-out views through
    the reference's own ``render_rays``: fine albedo / shading /
    residual as float arrays (``trainer.py:773-796``)."""
    trainer.training = False
    trainer.ssr_net_coarse.eval()
    trainer.ssr_net_fine.eval()
    h, w = trainer.H_scaled, trainer.W_scaled
    alb, sha, res = [], [], []
    with torch.no_grad():
        for i in range(trainer.num_test):
            out = trainer.render_rays(trainer.rays_test[i])
            alb.append(out["albedo_fine"].cpu().numpy().reshape(h, w, 3))
            sha.append(
                out["shading_fine"].cpu().numpy().reshape(h, w, -1)[..., 0]
            )
            res.append(out["residual_fine"].cpu().numpy().reshape(h, w, 3))
    trainer.training = True
    trainer.ssr_net_coarse.train()
    trainer.ssr_net_fine.train()
    return np.stack(alb), np.stack(sha), np.stack(res)


def phase_ref(wd, steps, eval_every):
    """Train the unmodified reference SSRTrainer on CPU."""
    import time

    import torch

    _install_ref_stubs()
    from SSR.datasets.replica import replica_datasets
    from SSR.training import trainer as ref_trainer_mod
    from SSR.utils import image_utils

    # the legend plotter needs imgviz.draw text rendering; visualization
    # only, so neutralize it
    image_utils.plot_semantic_legend = lambda *a, **k: np.zeros(
        (8, 8, 3), np.uint8
    )
    ref_trainer_mod.image_utils.plot_semantic_legend = (
        image_utils.plot_semantic_legend
    )
    # the reference globally enables autograd anomaly mode
    # (semantic_nerf.py:2) — prohibitive on CPU
    torch.autograd.set_detect_anomaly(False)
    # Cluster() defaults to device('cuda') at class-definition time
    # (cluster.py:102); rebind the default to CPU for this process
    from SSR.training import cluster as ref_cluster_mod

    d = list(ref_cluster_mod.Cluster.__init__.__defaults__)
    d[0] = torch.device("cpu")
    ref_cluster_mod.Cluster.__init__.__defaults__ = tuple(d)

    # the trainer writes visualization mp4s via imageio.mimwrite, which
    # needs the absent imageio-ffmpeg backend; make those writes
    # best-effort (visualization only — the PNGs/metrics still happen)
    import imageio

    _orig_mimwrite = imageio.mimwrite

    def _safe_mimwrite(*a, **k):
        try:
            return _orig_mimwrite(*a, **k)
        except Exception:
            return None

    imageio.mimwrite = _safe_mimwrite
    torch.manual_seed(20220414)
    np.random.seed(20220414)

    data_dir = os.path.join(wd, "data")
    save_dir = os.path.join(wd, "logs_ref")
    os.makedirs(save_dir, exist_ok=True)
    # the reference's own split convention (train_SSR_main.py:84-87),
    # identical to our CLI's default_replica_split: train = every 5th
    # frame, test = train + 2.  (An earlier draft used a custom 16/4
    # split here while our CLI used the standard one -> our side
    # trained on FOUR views and sat in fog forever.  Splits must match.)
    train_ids = list(range(0, FRAMES, 5))
    test_ids = [x + 2 for x in train_ids]
    config = {
        "experiment": {
            "dataset_type": "replica",
            "scene_file": os.path.join(wd, "semantic_info"),
            "save_dir": save_dir,
            "dataset_dir": data_dir,
            "convention": "opencv",
            "width": W,
            "height": H,
            "enable_semantic": True,
            "endpoint_feat": False,
        },
        "model": {
            "netdepth": 8, "netwidth": 256, "netdepth_fine": 8,
            "netwidth_fine": 256, "chunk": 1024 * 32, "netchunk": 1024 * 32,
        },
        "render": {
            "N_rays": N_RAYS, "N_samples": N_SAMPLES,
            "N_importance": N_IMPORTANCE, "perturb": 1, "use_viewdirs": True,
            "i_embed": 0, "multires": 10, "multires_views": 4,
            "raw_noise_std": 1, "test_viz_factor": TEST_VIZ_FACTOR,
            "no_batching": True, "depth_range": [0.1, 10.0],
            "white_bkgd": True,
        },
        "train": {
            "lrate": 5e-4, "lrate_decay": 250e3, "N_iters": steps,
            "wgt_sem": 4e-2, "w_n": 0.01, "w_f": 0.005, "w_i1": 0.1,
            "w_i2": 0.01, "no_cluster": False, "no_semantic_tree": False,
            "no_intrinsic_loss": False,
        },
        "logging": {
            "step_log_print": 1000, "step_log_tfb": 10 ** 9,
            "step_save_ckpt": steps, "step_val": 10 ** 9,
            "step_vis_train": VIS_EVERY,
        },
    }

    data = replica_datasets.ReplicaDatasetCache(
        data_dir=data_dir, train_ids=train_ids, test_ids=test_ids,
        img_h=H, img_w=W,
    )
    trainer = ref_trainer_mod.SSRTrainer(config)
    trainer.set_params_replica()
    trainer.prepare_data_replica(data, gpu=True)  # .cuda() shimmed to CPU
    trainer.create_ssr()
    trainer.init_rays()

    traj = []
    tic = time.time()
    for i in range(1, steps + 1):
        trainer.step(i)
        if i % eval_every == 0 or i == steps:
            m = _ref_eval(trainer, torch)
            m["step"] = i
            m["wall_s"] = round(time.time() - tic, 1)
            traj.append(m)
            print(f"[ref] step {i}: {m}", flush=True)
    with open(os.path.join(wd, "ref_trajectory.json"), "w") as f:
        json.dump(
            {
                "trajectory": traj,
                "num_valid_classes": int(trainer.num_valid_semantic_class),
                "wall_s": round(time.time() - tic, 1),
                "torch_threads": torch.get_num_threads(),
            },
            f, indent=2,
        )
    # final decomposition state through the reference's own renderer
    # (VERDICT r4 missing #2: the gate must compare the thing
    # IntrinsicNeRF exists for, not just PSNR/mIoU).  After the
    # trajectory write so a failure here cannot lose the training run.
    alb, sha, res = _ref_decomposition(trainer, torch)
    np.savez_compressed(
        os.path.join(wd, "ref_decomp.npz"),
        albedo=alb, shading=sha, residual=res,
    )
    print(f"[ref] done in {time.time() - tic:.0f}s "
          f"(decomp: albedo {alb.shape}, |res| {np.abs(res).mean():.4f})")


# ------------------------------------------------------------------ our side


def phase_ours(wd, steps, eval_every, seed=0):
    import yaml

    data_dir = os.path.join(wd, "data")
    save_dir = os.path.join(wd, f"logs_ours_s{seed}")
    cfg = {
        "experiment": {
            "save_dir": save_dir, "dataset_dir": data_dir,
            "dataset_type": "replica", "convention": "opencv",
            "width": W, "height": H,
            "enable_semantic": True, "enable_depth": True,
        },
        "model": {
            "netdepth": 8, "netwidth": 256, "netdepth_fine": 8,
            "netwidth_fine": 256, "chunk": "1024*32", "netchunk": "1024*32",
        },
        "render": {
            "N_rays": N_RAYS, "N_samples": N_SAMPLES,
            "N_importance": N_IMPORTANCE, "perturb": 1, "use_viewdirs": True,
            "multires": 10, "multires_views": 4, "raw_noise_std": 1,
            "test_viz_factor": TEST_VIZ_FACTOR, "depth_range": [0.1, 10.0],
            "white_bkgd": True,
        },
        "train": {
            "lrate": "5e-4", "lrate_decay": "250e3", "N_iters": steps,
            "wgt_sem": 0.04, "w_n": 0.01, "w_f": 0.005, "w_i1": 0.1,
            "w_i2": 0.01, "no_cluster": False, "no_semantic_tree": False,
            "no_intrinsic_loss": False,
        },
        "logging": {
            "step_log_print": 1000, "step_log_tfb": 1000,
            "step_save_ckpt": steps, "step_val": eval_every,
            "step_vis_train": VIS_EVERY,
        },
    }
    cfg_path = os.path.join(wd, "cfg_ours.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "train_scene.py"),
            "--config_file", cfg_path,
            "--total_frames", str(FRAMES), "--split_step", "5",
            "--seed", str(seed),
            "--no_progress",
        ],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    sys.stderr.write(out.stdout[-1500:] + "\n")
    if out.returncode != 0:
        raise RuntimeError(f"ours run failed:\n{out.stderr[-4000:]}")


def read_ours_trajectory(wd, seed=0):
    save_dir = os.path.join(wd, f"logs_ours_s{seed}")
    per_step = {}
    with open(os.path.join(save_dir, "tfb_logs", "scalars.csv")) as f:
        for step, name, val in csv.reader(f):
            if name in ("Test/psnr", "Test/miou", "Test/total_acc"):
                per_step.setdefault(int(step), {})[name[5:]] = float(val)
    return [dict(step=s, **m) for s, m in sorted(per_step.items())]


# ------------------------------------------------- decomposition metrics


def _map_drgb(rgb):
    """Reference d_rgb color space (cluster.py:316-330) in numpy."""
    s = np.maximum(rgb.sum(-1), 1e-6)
    return np.stack([s / 3.0 * 0.5, rgb[..., 1] / s, rgb[..., 2] / s], -1)


def _load_gt_albedo_scaled(wd):
    """Generator GT albedo for the held-out views at eval resolution."""
    import cv2
    import imageio.v2 as imageio

    hs, ws = H // TEST_VIZ_FACTOR, W // TEST_VIZ_FACTOR
    test_ids = [x + 2 for x in range(0, FRAMES, 5)]
    out = []
    for i in test_ids:
        a = (
            imageio.imread(
                os.path.join(wd, "data", "gt_albedo", f"albedo_{i}.png")
            ).astype(np.float32)
            / 255.0
        )
        out.append(cv2.resize(a, (ws, hs), interpolation=cv2.INTER_LINEAR))
    return np.stack(out)


def _albedo_mae(albedo, gt):
    """Scale-aligned MAE (intrinsic decomposition is defined up to a
    global albedo<->shading scale) — identical alignment for both sides."""
    maes = []
    for got, g in zip(albedo, gt):
        m = g.mean(-1) > 0.05
        scale = float(
            np.median(g[m].sum(-1) / np.maximum(got[m].sum(-1), 1e-6))
        )
        scale = float(np.clip(scale, 0.25, 4.0))
        maes.append(float(np.abs(got * scale - g)[m].mean()))
    return float(np.mean(maes))


def _palette_stats(cluster_dir, wd):
    """Center count + d_rgb recall of the GT palette, from the
    reference-format cluster JSON both implementations write."""
    import imageio.v2 as imageio

    data = json.loads(
        open(os.path.join(cluster_dir, "clusters.json")).read()
    )
    centers = []
    for c in range(int(data["class_num"])):
        p = os.path.join(cluster_dir, f"c{c}", "config.json")
        if os.path.exists(p):
            arr = np.asarray(
                json.loads(open(p).read()).get("rgb_centers", []), np.float32
            )
            if arr.size:
                centers.append(arr.reshape(-1, 3))
    cen = np.concatenate(centers) if centers else np.zeros((0, 3), np.float32)

    palette = np.asarray(
        json.loads(
            open(os.path.join(wd, "data", "albedo_colors.json")).read()
        )["albedos"],
        np.float32,
    )
    train_ids = list(range(0, FRAMES, 5))
    counts = np.zeros(len(palette), np.int64)
    total_px = 0
    for i in train_ids[:: max(len(train_ids) // 8, 1)]:
        a = (
            imageio.imread(
                os.path.join(wd, "data", "gt_albedo", f"albedo_{i}.png")
            ).astype(np.float32)
            / 255.0
        ).reshape(-1, 3)
        total_px += len(a)
        d2 = ((a[:, None, :] - palette[None, :, :]) ** 2).sum(-1)
        nearest = np.argmin(d2, axis=1)
        ok = d2[np.arange(len(a)), nearest] < 1e-3
        np.add.at(counts, nearest[ok], 1)
    observed = palette[counts / max(total_px, 1) >= 0.002]
    if len(cen) == 0 or len(observed) == 0:
        return {"total_centers": int(len(cen)), "palette_recall": 0.0,
                "observed_gt_colors": int(len(observed))}
    dist = np.sqrt(
        ((_map_drgb(observed)[:, None, :] - _map_drgb(cen)[None, :, :]) ** 2)
        .sum(-1)
    ).min(axis=1)
    return {
        "total_centers": int(len(cen)),
        "observed_gt_colors": int(len(observed)),
        "palette_recall": round(float((dist < 0.08).mean()), 4),
        "recall_mean_dist": round(float(dist.mean()), 4),
    }


def _ours_final_decomposition(wd, seed, steps):
    """Render the held-out views' decomposition from OUR final
    checkpoint in float (no PNG quantization — the reference side is
    measured from in-memory arrays, so ours must be too)."""
    import dataclasses

    import jax.numpy as jnp

    from intrinsicnerf_tpu.config import from_yaml
    from intrinsicnerf_tpu.data.replica import load_replica
    from intrinsicnerf_tpu.render.pipeline import render_rays_chunked
    from intrinsicnerf_tpu.train.checkpoint import restore_checkpoint
    from intrinsicnerf_tpu.train.prepare import prepare_replica_bundle
    from intrinsicnerf_tpu.train.schedules import make_lr_schedule
    from intrinsicnerf_tpu.train.step import create_train_state

    import jax
    import optax

    cfg = from_yaml(os.path.join(wd, "cfg_ours.yaml"))
    train_ids = list(range(0, FRAMES, 5))
    test_ids = [x + 2 for x in train_ids]
    data = load_replica(
        os.path.join(wd, "data"), train_ids, test_ids, img_h=H, img_w=W
    )
    bundle = prepare_replica_bundle(cfg, data)
    mcfg = dataclasses.replace(
        cfg.mlp, num_semantic_classes=bundle.num_valid_classes
    )
    opt = optax.adam(make_lr_schedule(cfg.train.lrate, cfg.train.lrate_decay))
    template = create_train_state(jax.random.key(0), mcfg, cfg.train, opt)
    state = restore_checkpoint(
        os.path.join(wd, f"logs_ours_s{seed}", "checkpoints"), template
    )
    assert state is not None, f"no checkpoint for seed {seed}"
    assert int(state.step) == steps, (int(state.step), steps)
    hs, ws = bundle.h_scaled, bundle.w_scaled
    alb, sha, res = [], [], []
    for i in range(bundle.rays_test.shape[0]):
        out = render_rays_chunked(
            state.params_coarse, state.params_fine, mcfg,
            bundle.rays_test[i], dataclasses.replace(cfg.render), chunk=4096,
        )
        alb.append(np.asarray(out.fine.albedo, np.float32).reshape(hs, ws, 3))
        sha.append(np.asarray(out.fine.shading, np.float32).reshape(hs, ws))
        res.append(np.asarray(out.fine.residual, np.float32).reshape(hs, ws, 3))
    return np.stack(alb), np.stack(sha), np.stack(res)


# --------------------------------------------------------------------- stamp


def _imported_ckpt_render(wd, steps):
    """Interop proof: import the reference's final .ckpt with
    tools/import_ckpt and render it through OUR pipeline on the same
    test views — the PSNR should match the reference's own final eval."""
    import dataclasses

    from intrinsicnerf_tpu.config import from_yaml
    from intrinsicnerf_tpu.core.metrics import psnr_np
    from intrinsicnerf_tpu.data.replica import load_replica
    from intrinsicnerf_tpu.render.pipeline import render_rays_chunked
    from intrinsicnerf_tpu.tools.import_ckpt import import_reference_checkpoint
    from intrinsicnerf_tpu.train.prepare import prepare_replica_bundle

    ckpt = os.path.join(wd, "logs_ref", "checkpoints", f"{steps:06d}.ckpt")
    if not os.path.exists(ckpt):
        return None
    cfg = from_yaml(os.path.join(wd, "cfg_ours.yaml"))
    train_ids = list(range(0, FRAMES, 5))
    test_ids = [x + 2 for x in train_ids]
    data = load_replica(os.path.join(wd, "data"), train_ids, test_ids,
                        img_h=H, img_w=W)
    bundle = prepare_replica_bundle(cfg, data)
    state, mcfg = import_reference_checkpoint(ckpt, pos_scalar_factor=10.0)
    rcfg = dataclasses.replace(cfg.render)
    psnrs = []
    for i in range(bundle.rays_test.shape[0]):
        out = render_rays_chunked(state.params_coarse, state.params_fine,
                                  mcfg, bundle.rays_test[i], rcfg, chunk=4096)
        rgb = np.asarray(out.fine.rgb).reshape(
            bundle.h_scaled, bundle.w_scaled, 3)
        psnrs.append(psnr_np(rgb, bundle.test_gt["image"][i]))
    return round(float(np.mean(psnrs)), 3)


def phase_stamp(wd, steps, out_name, seeds):
    ref = json.loads(open(os.path.join(wd, "ref_trajectory.json")).read())
    ref_traj = ref["trajectory"]
    ref_final = ref_traj[-1]

    # multi-seed ours side (VERDICT r4 weak #2): the reference side is
    # n=1 (it costs ~85 min of 2-core CPU per run); ours re-runs at
    # several seeds for ~2 min each, so the stamp carries a spread
    per_seed = {}
    for s in seeds:
        traj = read_ours_trajectory(wd, s)
        assert traj[-1]["step"] == ref_final["step"], (
            f"step mismatch: seed {s} {traj[-1]['step']} vs ref "
            f"{ref_final['step']}"
        )
        per_seed[s] = traj
    finals = [per_seed[s][-1] for s in seeds]
    agg = {
        k: {
            "mean": round(float(np.mean([f[k] for f in finals])), 4),
            "min": round(float(min(f[k] for f in finals)), 4),
            "max": round(float(max(f[k] for f in finals)), 4),
        }
        for k in ("psnr", "miou", "total_acc")
    }

    # decomposition head-to-head: both sides' fine albedo vs GT (scale-
    # aligned MAE) and mean |residual|, from in-memory float renders
    rd = np.load(os.path.join(wd, "ref_decomp.npz"))
    gt_albedo = _load_gt_albedo_scaled(wd)
    ref_mae = _albedo_mae(rd["albedo"], gt_albedo)
    ref_res = float(np.abs(rd["residual"]).mean())
    ours_maes, ours_res = [], []
    for s in seeds:
        alb, sha, res = _ours_final_decomposition(wd, s, steps)
        ours_maes.append(_albedo_mae(alb, gt_albedo))
        ours_res.append(float(np.abs(res).mean()))
    step_dir = f"step_{steps:06d}"
    ref_palette = _palette_stats(
        os.path.join(wd, "logs_ref", "train_render", step_dir, "cluster"), wd
    )
    ours_palette = _palette_stats(
        os.path.join(
            wd, f"logs_ours_s{seeds[0]}", "train_render", step_dir, "cluster"
        ),
        wd,
    )
    decomposition = {
        "ref_albedo_mae": round(ref_mae, 5),
        "ours_albedo_mae_mean": round(float(np.mean(ours_maes)), 5),
        "ours_albedo_mae_per_seed": [round(m, 5) for m in ours_maes],
        "ref_residual_mean": round(ref_res, 5),
        "ours_residual_mean_mean": round(float(np.mean(ours_res)), 5),
        "ours_residual_mean_per_seed": [round(r, 5) for r in ours_res],
        "ref_palette": ref_palette,
        "ours_palette": ours_palette,
    }

    import jax

    dev = jax.devices()[0]
    checks = {
        "psnr": agg["psnr"]["mean"]
        >= ref_final["psnr"] - GATE["psnr_margin"],
        "miou": agg["miou"]["mean"]
        >= ref_final["miou"] - GATE["miou_margin"],
        "albedo_mae": float(np.mean(ours_maes))
        <= ref_mae + GATE["albedo_mae_margin"],
        "residual_mean": float(np.mean(ours_res))
        <= ref_res + GATE["residual_mean_margin"],
    }
    result = {
        "config": {
            "resolution": f"{W}x{H}", "n_rays": N_RAYS,
            "samples": [N_SAMPLES, N_IMPORTANCE], "frames": FRAMES,
            "steps": steps, "cluster_rebuild_every": VIS_EVERY,
            "eval_scale": TEST_VIZ_FACTOR,
        },
        "reference": {
            "impl": "SSRTrainer (live PyTorch, /root/reference)",
            "device": f"cpu ({ref.get('torch_threads')} threads)",
            "trajectory": ref_traj,
            "wall_s": ref.get("wall_s"),
            "n_runs": 1,
        },
        "ours": {
            "impl": "train_scene.py (fused Pallas path)",
            "device": f"{dev.platform}:{dev.device_kind}",
            "seeds": list(seeds),
            "trajectories": {str(s): per_seed[s] for s in seeds},
            "final_spread": agg,
        },
        "final": {
            "ref_psnr": round(ref_final["psnr"], 3),
            "ours_psnr_mean": agg["psnr"]["mean"],
            "ours_psnr_range": [agg["psnr"]["min"], agg["psnr"]["max"]],
            "ref_miou": round(ref_final["miou"], 4),
            "ours_miou_mean": agg["miou"]["mean"],
            "ours_miou_range": [agg["miou"]["min"], agg["miou"]["max"]],
            "ref_total_acc": round(ref_final["total_acc"], 4),
            "ours_total_acc_mean": agg["total_acc"]["mean"],
        },
        "decomposition": decomposition,
        "gate_margins": GATE,
        "checks": checks,
        "pass": all(checks.values()),
    }
    imported = _imported_ckpt_render(wd, steps)
    if imported is not None:
        # reference-trained weights imported via tools/import_ckpt and
        # rendered by OUR pipeline: should match the reference's own
        # final eval (checkpoint interop, VERDICT r3 missing #2)
        result["imported_ref_ckpt_psnr_via_our_renderer"] = imported
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result["final"], indent=2))
    print(json.dumps(decomposition, indent=2))
    assert result["pass"], f"parity gate FAILED: {checks}"
    print("PARITY GATE OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--phase", default="all", choices=["all", "data", "ref", "ours", "stamp"]
    )
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--out", default="PARITY_r05.json")
    ap.add_argument("--seeds", default="0,1,2",
                    help="comma-separated seeds for the ours side")
    args = ap.parse_args()
    wd = workdir_of(args)
    seeds = [int(s) for s in args.seeds.split(",")]

    if args.phase in ("all", "data"):
        phase_data(wd)
    if args.phase in ("all", "ref"):
        phase_ref(wd, args.steps, args.eval_every)
    if args.phase in ("all", "ours"):
        for s in seeds:
            phase_ours(wd, args.steps, args.eval_every, seed=s)
    if args.phase in ("all", "stamp"):
        phase_stamp(wd, args.steps, args.out, seeds)


if __name__ == "__main__":
    main()
