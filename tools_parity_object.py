"""Object-level trained head-to-head vs the live PyTorch reference
(VERDICT r4 next-round item 4).

Trains BOTH object pipelines on the same synthetic Blender-intrinsic
object (``tools_make_synthetic_blender.py``) at the same config — the
reference's ``object_level/run_nerf.py`` ``train()`` run unmodified on
CPU (same read-only stub technique as the SSR-side A/B), and our
``train_object.py`` CLI — and gates held-out PSNR plus the
decomposition (albedo-vs-GT MAE, mean |residual|).

This covers the object-pipeline-specific machinery end to end:
object-mask pair weighting (``run_nerf_helpers.py:27-36`` — the mask
multiplies the chroma pair weights), the precrop warmup
(``run_nerf.py:902-911``), pose-based neighbor-pair sampling
(``run_nerf.py:918-930``), and the test-view cluster rebuild
(``run_nerf.py:1071``).  Both sides run the reference's *own* anneal
denominator (``N_iters`` stays at the reference's hardcoded
200000+1, ``run_nerf.py:853``; the A/B trains the first
``--steps`` of that schedule on each side) so w_c / b_f trajectories
are identical; the b_f 0.5 cap itself is schedule-level
(``run_nerf.py:1063-1064`` vs ``train/schedules.py``) and unit-tested.

Phases (the ref side is CPU/torch-only, ~1h on 2 cores):
  python tools_parity_object.py --phase data
  python tools_parity_object.py --phase ref
  python tools_parity_object.py --phase ours     # ~2 min, TPU
  python tools_parity_object.py --phase stamp    # writes PARITY_OBJ_r05.json
"""

import argparse
import csv
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
REF_OBJ = "/root/reference/object_level"

W = H = 64
N_RAND = 256  # sampled pixels; reference doubles via neighbor concat
N_SAMPLES, N_IMPORTANCE = 32, 64
PRECROP_ITERS, PRECROP_FRAC = 300, 0.5
I_TESTSET = 250  # cluster rebuild + eval cadence (both sides)
I_WEIGHTS = 500
# identical loss weights on both sides (the reference's parser
# defaults, run_nerf.py:600-614)
WEIGHTS = dict(w_r=0.04, w_f=0.004, w_s=1.0, w_res1=1.0, w_res2=0.01,
               w_i1=1.0, w_i2=0.01)
GATE = {"psnr_margin": 0.25, "albedo_mae_margin": 0.02,
        "residual_mean_margin": 0.02}


def workdir_of(args):
    d = args.workdir or os.path.join("/tmp", "parity_object")
    os.makedirs(d, exist_ok=True)
    return d


def phase_data(wd):
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools_make_synthetic_blender.py"),
            os.path.join(wd, "data"),
            "--width", str(W), "--height", str(H),
            "--train", "24", "--test", "5", "--val", "1",
        ],
        check=True, cwd=REPO, capture_output=True,
    )
    print(f"data ready under {wd}")


# ------------------------------------------------------------- reference side


def _install_obj_stubs(steps):
    """Read-only shims so the unmodified reference object stack runs on
    CPU: a configargparse stand-in (argparse is enough — we pass every
    flag on argv), torch.cuda neutralized, numpy<1.24 aliases, and the
    training loop bounded to ``steps`` by replacing the module-level
    ``trange`` import (the reference hardcodes N_iters = 200000+1,
    ``run_nerf.py:853``; bounding the iterator trains the first
    ``steps`` of that exact schedule without touching reference code)."""
    import types

    import torch

    sys.path.insert(0, REF_OBJ)
    torch.cuda.set_device = lambda *a, **k: None  # module-level call, line 10
    torch.Tensor.cuda = lambda self, *a, **k: self
    if not hasattr(np, "float"):
        np.float = float
    if not hasattr(np, "int"):
        np.int = int

    if "configargparse" not in sys.modules:
        try:
            __import__("configargparse")
        except ImportError:
            import argparse as _ap

            mod = types.ModuleType("configargparse")

            class ArgumentParser(_ap.ArgumentParser):
                def add_argument(self, *a, **k):
                    k.pop("is_config_file", None)
                    return super().add_argument(*a, **k)

            mod.ArgumentParser = ArgumentParser
            sys.modules["configargparse"] = mod

    import imageio

    _orig_mimwrite = imageio.mimwrite

    def _safe_mimwrite(*a, **k):
        try:
            return _orig_mimwrite(*a, **k)
        except Exception:
            return None

    imageio.mimwrite = _safe_mimwrite

    # Cluster() defaults to device('cuda') at class-definition time
    # (object_level/cluster.py:98); rebind the default to CPU
    import cluster as ref_cluster_mod  # noqa: E402

    d = list(ref_cluster_mod.Cluster.__init__.__defaults__)
    d[0] = torch.device("cpu")
    ref_cluster_mod.Cluster.__init__.__defaults__ = tuple(d)

    import run_nerf  # noqa: E402  (the reference module, read-only)

    _real_trange = run_nerf.trange

    def bounded_trange(start, stop, *a, **k):
        return _real_trange(start, min(stop, start + steps), *a, **k)

    run_nerf.trange = bounded_trange
    return run_nerf


def _ref_argv(wd):
    argv = [
        "run_nerf.py",
        "--expname", "obj",
        "--basedir", os.path.join(wd, "logs_ref"),
        "--datadir", os.path.join(wd, "data"),
        "--dataset_type", "blender_intrinsic",
        "--no_batching",
        "--use_viewdirs",
        "--white_bkgd",
        "--lrate", "5e-4",
        "--lrate_decay", "250",
        "--N_rand", str(N_RAND),
        "--N_samples", str(N_SAMPLES),
        "--N_importance", str(N_IMPORTANCE),
        "--precrop_iters", str(PRECROP_ITERS),
        "--precrop_frac", str(PRECROP_FRAC),
        "--testskip", "1",
        "--i_print", "100",
        "--i_weights", str(I_WEIGHTS),
        "--i_testset", str(I_TESTSET),
        "--i_video", "1000000",
        "--i_img", "1000000",
    ]
    for k, v in WEIGHTS.items():
        argv += [f"--{k}", str(v)]
    return argv


def phase_ref(wd, steps):
    import time

    import torch

    run_nerf = _install_obj_stubs(steps)
    torch.manual_seed(20220414)
    np.random.seed(20220414)
    sys.argv = _ref_argv(wd)
    # the final save at loop index i == steps is named '{i:06d}.tar'
    # (run_nerf.py:1035-1043); if it exists the training already ran to
    # completion (e.g. a previous invocation died in the eval below) and
    # create_nerf()'s auto-resume makes retraining both wasteful and
    # wrong (it would train `steps` further), so skip straight to eval
    final_tar = os.path.join(wd, "logs_ref", "obj", f"{steps:06d}.tar")
    if os.path.exists(final_tar):
        print(f"[ref-obj] {final_tar} exists; skipping training")
        wall = None  # trained by a previous invocation; see its log
    else:
        tic = time.time()
        run_nerf.train()
        wall = time.time() - tic
        print(f"[ref-obj] trained {steps} steps in {wall:.0f}s")

    # post-train eval through the reference's own stack: a fresh
    # create_nerf() auto-reloads the newest .tar (run_nerf.py:313-330).
    # The reference saves 'global_step' BEFORE the end-of-loop increment
    # (run_nerf.py:1038 vs :1125) and reloads it without +1 (the '#+1'
    # at :324 is commented out upstream), so the checkpoint written at
    # loop index i == steps records global_step == steps-1 even though
    # its weights are post-step-`steps`; accept steps-1.
    parser = run_nerf.config_parser()
    args = parser.parse_args(sys.argv[1:])
    _, render_kwargs_test, start, _, _ = run_nerf.create_nerf(args)
    assert start >= steps - 1, f"ckpt reload got step {start}, want {steps}"
    render_kwargs_test.update({"near": 2.0, "far": 6.0})

    from load_blender import load_blender_data

    images, poses, _, hwf, i_split = load_blender_data(
        os.path.join(wd, "data"), False, 1
    )
    i_train, i_val, i_test = i_split
    gt = images[..., :3] * images[..., -1:] + (1.0 - images[..., -1:])
    h, w, focal = int(hwf[0]), int(hwf[1]), hwf[2]
    K = np.array(
        [[focal, 0, 0.5 * w], [0, focal, 0.5 * h], [0, 0, 1]], np.float32
    )
    psnrs, albs, ress = [], [], []
    with torch.no_grad():
        for i in i_test:
            rgb, disp, acc, albedo, shading, residual, _ = run_nerf.render(
                h, w, K, chunk=args.chunk,
                c2w=torch.Tensor(poses[i, :3, :4]), **render_kwargs_test
            )
            mse = float(np.mean((rgb.cpu().numpy() - gt[i]) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
            albs.append(albedo.cpu().numpy())
            ress.append(residual.cpu().numpy())
    np.savez_compressed(
        os.path.join(wd, "ref_obj_decomp.npz"),
        albedo=np.stack(albs), residual=np.stack(ress),
        psnr=np.asarray(psnrs),
    )
    out = {
        "psnr": float(np.mean(psnrs)),
        "per_view_psnr": [round(p, 3) for p in psnrs],
        "wall_s": round(wall, 1) if wall is not None else None,
        "final_ckpt_step": int(start),
        "torch_threads": torch.get_num_threads(),
    }
    with open(os.path.join(wd, "ref_obj_result.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"[ref-obj] eval: {out}")


# ------------------------------------------------------------------ our side


def _ours_cfg_txt(wd, seed=0):
    lines = [
        "expname = obj",
        f"basedir = {os.path.join(wd, f'logs_ours_obj_s{seed}')}",
        f"datadir = {os.path.join(wd, 'data')}",
        "dataset_type = blender_intrinsic",
        "no_batching = True",
        "use_viewdirs = True",
        "white_bkgd = True",
        "lrate = 5e-4",
        "lrate_decay = 250",
        f"N_rand = {N_RAND}",
        f"N_samples = {N_SAMPLES}",
        f"N_importance = {N_IMPORTANCE}",
        # the reference hardcodes N_iters = 200000+1 (run_nerf.py:853);
        # keeping it here makes the w_c/b_f anneal denominators equal,
        # and --n_iters bounds the actual trained steps like the ref
        # side's bounded iterator
        "N_iters = 200001",
        f"precrop_iters = {PRECROP_ITERS}",
        f"precrop_frac = {PRECROP_FRAC}",
        "half_res = False",
        "testskip = 1",
        "perturb = 1.0",
        "raw_noise_std = 0.0",
        "i_print = 100",
        f"i_weights = {I_WEIGHTS}",
        f"i_testset = {I_TESTSET}",
    ] + [f"{k} = {v}" for k, v in WEIGHTS.items()]
    path = os.path.join(wd, f"cfg_ours_obj_s{seed}.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def phase_ours(wd, steps, seed=0):
    cfg = _ours_cfg_txt(wd, seed)
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "train_object.py"),
            "--config", cfg,
            "--n_iters", str(steps),
            "--seed", str(seed),
            "--no_progress",
        ],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    sys.stderr.write(out.stdout[-1500:] + "\n")
    if out.returncode != 0:
        raise RuntimeError(f"ours object run failed:\n{out.stderr[-4000:]}")


def _ours_obj_eval(wd, steps, seed=0):
    """Held-out PSNR + float decomposition renders from OUR final
    object checkpoint (no PNG quantization, matching the ref side)."""
    import dataclasses

    import jax
    import optax

    from intrinsicnerf_tpu.config import from_object_txt
    from intrinsicnerf_tpu.data.blender import load_blender_intrinsic_data
    from intrinsicnerf_tpu.render.pipeline import render_rays_chunked
    from intrinsicnerf_tpu.train.checkpoint import restore_checkpoint
    from intrinsicnerf_tpu.train.prepare import prepare_blender_bundle
    from intrinsicnerf_tpu.train.schedules import make_lr_schedule
    from intrinsicnerf_tpu.train.step import create_train_state

    cfg = from_object_txt(os.path.join(wd, f"cfg_ours_obj_s{seed}.txt"))
    data = load_blender_intrinsic_data(
        cfg.experiment.dataset_dir, half_res=cfg.half_res,
        testskip=cfg.testskip,
    )
    bundle, _ = prepare_blender_bundle(cfg, data)
    mcfg = dataclasses.replace(cfg.mlp, num_semantic_classes=0)
    opt = optax.adam(make_lr_schedule(cfg.train.lrate, cfg.train.lrate_decay))
    template = create_train_state(jax.random.key(0), mcfg, cfg.train, opt)
    state = restore_checkpoint(
        os.path.join(cfg.experiment.save_dir, "checkpoints"), template
    )
    assert state is not None, "no object checkpoint found"
    assert int(state.step) == steps, (int(state.step), steps)
    hs, ws = bundle.h_scaled, bundle.w_scaled
    psnrs, albs, ress = [], [], []
    for i in range(bundle.rays_test.shape[0]):
        out = render_rays_chunked(
            state.params_coarse, state.params_fine, mcfg,
            bundle.rays_test[i], dataclasses.replace(cfg.render), chunk=4096,
        )
        rgb = np.asarray(out.fine.rgb, np.float32).reshape(hs, ws, 3)
        mse = float(np.mean((rgb - bundle.test_gt["image"][i]) ** 2))
        psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
        albs.append(
            np.asarray(out.fine.albedo, np.float32).reshape(hs, ws, 3)
        )
        ress.append(
            np.asarray(out.fine.residual, np.float32).reshape(hs, ws, 3)
        )
    return np.asarray(psnrs), np.stack(albs), np.stack(ress)


# --------------------------------------------------------------------- stamp


def _gt_albedo_and_mask(wd):
    import imageio.v2 as imageio

    meta = json.loads(
        open(os.path.join(wd, "data", "transforms_test.json")).read()
    )
    gts, masks = [], []
    for fr in meta["frames"]:
        name = os.path.basename(fr["file_path"])
        a = (
            imageio.imread(
                os.path.join(
                    wd, "data", "test", "albedo", name + "_albedo_0001.png"
                )
            ).astype(np.float32)
            / 255.0
        )
        gts.append(a[..., :3])
        masks.append(a[..., 3] > 0.5)
    return np.stack(gts), np.stack(masks)


def _albedo_mae_masked(albedo, gt, mask):
    """Scale-aligned MAE inside the GT object mask (identical alignment
    both sides; decomposition is defined up to a global scale)."""
    maes = []
    for got, g, m in zip(albedo, gt, mask):
        if m.sum() == 0:
            continue
        scale = float(
            np.median(g[m].sum(-1) / np.maximum(got[m].sum(-1), 1e-6))
        )
        scale = float(np.clip(scale, 0.25, 4.0))
        maes.append(float(np.abs(got * scale - g)[m].mean()))
    return float(np.mean(maes))


def read_ours_psnr_trajectory(wd, seed=0):
    save_dir = os.path.join(wd, f"logs_ours_obj_s{seed}", "obj")
    traj = {}
    with open(os.path.join(save_dir, "tfb_logs", "scalars.csv")) as f:
        for step, name, val in csv.reader(f):
            if name == "Test/psnr":
                traj[int(step)] = float(val)
    return traj


def phase_stamp(wd, steps, out_name, seeds=(0,)):
    ref = json.loads(open(os.path.join(wd, "ref_obj_result.json")).read())
    rd = np.load(os.path.join(wd, "ref_obj_decomp.npz"))
    gt_albedo, gt_mask = _gt_albedo_and_mask(wd)
    # both sides trained with white_bkgd: compare albedo inside the GT
    # object mask only (background albedo is undefined)
    ref_mae = _albedo_mae_masked(rd["albedo"], gt_albedo, gt_mask)
    ref_res = float(np.abs(rd["residual"][gt_mask]).mean())

    # ours at N seeds (the ref side is n=1: ~45 min of 2-core CPU per
    # run; ours costs ~2 min of TPU, so the stamp carries a spread —
    # same rationale as the scene-side A/B)
    per_seed_psnr, per_seed_mae, per_seed_res, per_view = {}, {}, {}, {}
    trajs = {}
    for s in seeds:
        psnrs, alb, res_maps = _ours_obj_eval(wd, steps, seed=s)
        per_seed_psnr[s] = float(np.mean(psnrs))
        per_seed_mae[s] = _albedo_mae_masked(alb, gt_albedo, gt_mask)
        per_seed_res[s] = float(np.abs(res_maps[gt_mask]).mean())
        per_view[s] = [round(float(p), 3) for p in psnrs]
        trajs[s] = read_ours_psnr_trajectory(wd, seed=s)
    ours_psnr_mean = float(np.mean(list(per_seed_psnr.values())))
    ours_mae = float(np.mean(list(per_seed_mae.values())))
    ours_res = float(np.mean(list(per_seed_res.values())))

    import jax

    dev = jax.devices()[0]
    checks = {
        "psnr": ours_psnr_mean >= ref["psnr"] - GATE["psnr_margin"],
        "albedo_mae": ours_mae <= ref_mae + GATE["albedo_mae_margin"],
        "residual_mean": ours_res <= ref_res + GATE["residual_mean_margin"],
    }
    result = {
        "config": {
            "resolution": f"{W}x{H}", "n_rand": N_RAND,
            "samples": [N_SAMPLES, N_IMPORTANCE], "steps": steps,
            "precrop": [PRECROP_ITERS, PRECROP_FRAC],
            "rebuild_every": I_TESTSET, "weights": WEIGHTS,
            "anneal_denominator_n_iters": 200001,
            "white_bkgd": True,
        },
        "covers": [
            "object-mask pair weighting (run_nerf_helpers.py:27-36)",
            "precrop warmup (run_nerf.py:902-911)",
            "pose-based neighbor-pair sampling (run_nerf.py:918-930)",
            "test-view cluster rebuild, class_num=1 (run_nerf.py:1071)",
        ],
        "reference": {
            "impl": "object_level/run_nerf.py train() (live PyTorch)",
            "device": f"cpu ({ref.get('torch_threads')} threads)",
            "psnr": round(ref["psnr"], 3),
            "per_view_psnr": ref["per_view_psnr"],
            "wall_s": ref["wall_s"],
        },
        "ours": {
            "impl": "train_object.py (fused Pallas path)",
            "device": f"{dev.platform}:{dev.device_kind}",
            "seeds": list(seeds),
            "psnr_mean": round(ours_psnr_mean, 3),
            "psnr_per_seed": {
                str(s): round(per_seed_psnr[s], 3) for s in seeds
            },
            "psnr_range": [
                round(min(per_seed_psnr.values()), 3),
                round(max(per_seed_psnr.values()), 3),
            ],
            "per_view_psnr": {str(s): per_view[s] for s in seeds},
            "psnr_trajectory": {str(s): trajs[s] for s in seeds},
        },
        "decomposition": {
            "ref_albedo_mae": round(ref_mae, 5),
            "ours_albedo_mae_mean": round(ours_mae, 5),
            "ours_albedo_mae_per_seed": {
                str(s): round(per_seed_mae[s], 5) for s in seeds
            },
            "ref_residual_mean": round(ref_res, 5),
            "ours_residual_mean_mean": round(ours_res, 5),
            "ours_residual_mean_per_seed": {
                str(s): round(per_seed_res[s], 5) for s in seeds
            },
        },
        "gate_margins": GATE,
        "checks": checks,
        "pass": all(checks.values()),
    }
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result, indent=2))
    assert result["pass"], f"object parity gate FAILED: {checks}"
    print("OBJECT PARITY GATE OK")


def main():
    global I_TESTSET, I_WEIGHTS, PRECROP_ITERS

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--phase", default="all",
        choices=["all", "data", "ref", "ours", "stamp"],
    )
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--out", default="PARITY_OBJ_r05.json")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny cadences for rig testing (use --steps 40)")
    ap.add_argument("--seeds", default="0,1,2",
                    help="comma-separated seeds for the ours side")
    args = ap.parse_args()
    if args.smoke:
        I_TESTSET, I_WEIGHTS, PRECROP_ITERS = 10, 20, 8
    wd = workdir_of(args)
    seeds = [int(s) for s in args.seeds.split(",")]
    if args.phase in ("all", "data"):
        phase_data(wd)
    if args.phase in ("all", "ref"):
        phase_ref(wd, args.steps)
    if args.phase in ("all", "ours"):
        for s in seeds:
            phase_ours(wd, args.steps, seed=s)
    if args.phase in ("all", "stamp"):
        phase_stamp(wd, args.steps, args.out, seeds)


if __name__ == "__main__":
    main()
