"""Full-length 200k-step reference-schedule endurance run (VERDICT r4
next-round item 1) with a mid-run SIGKILL + auto-resume proof.

The reference always trains 200k iterations
(``/root/reference/object_level/run_nerf.py:853``;
``SSR/configs/SSR_room0_config.yaml`` train.N_iters) and three schedule
mechanisms only engage deep into that range: the residual weight switch
1 -> 0.02 after 100k (``SSR/training/trainer.py:965-968``), the
intensity switch 0.1 -> 0.01 after 50k (``trainer.py:970-973``), and
the w_c / b_f cluster anneal's upper half (``trainer.py:1051-1056`` —
b_f only reaches its cap near the end).  This driver runs the
*unmodified* ``train_scene.py`` CLI on the hard synthetic room at the
flagship train config (320x240 pools, 512 sampled pairs, 64+128
samples, fused Pallas path, steps_per_call=8) through the full
reference cadence (TB @1k, ckpt @10k, cluster rebuild @10k, eval @50k),
SIGKILLs the process once mid-run (default @95k, a non-multiple of the
rebuild cadence), relaunches it and lets the Trainer auto-resume —
including the round-5 cluster-palette restore — then stamps
``FULLRUN_r05.json`` with:

- the w_residual / w_intensity switch engaging at 100k / 50k (from the
  run's own scalars.csv),
- the w_c / b_f anneal trajectory reaching its caps,
- >= 20 completed cluster rebuilds and every scalar finite,
- zero NaN-alarm lines in either process segment,
- the resume evidence (resumed step + restored palette line),
- final eval metrics gated at the 10k convergence-gate thresholds,
- the 200k artifacts feeding ``extract_mesh.py`` and an
  ``EditSession`` recompose end-to-end.

Usage:
  python tools_fullrun.py                         # full ~1h TPU run
  python tools_fullrun.py --steps 2000 --kill-at 1100 --smoke  # rig test
  python tools_fullrun.py --phase stamp           # re-stamp from workdir
"""

import argparse
import csv
import glob
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

TOTAL_FRAMES = 60
SPLIT_STEP = 5
W, H = 320, 240

# final-eval gates: the 10k convergence gate's thresholds (a 200k run
# must do at least as well as the 10k gate; see CONVERGENCE_r04.json)
GATES = {"psnr": 28.0, "miou": 0.85, "total_acc": 0.93}


def make_cfg(workdir, data_dir, steps, smoke=False):
    import yaml

    save_dir = os.path.join(workdir, "logs_fullrun")
    cadence = dict(
        step_log_print=1000, step_log_tfb=1000, step_save_ckpt=10000,
        step_val=50000, step_vis_train=10000,
    )
    if smoke:  # scaled cadence for rig testing, same structure
        # (all divisible by steps_per_call=8, like the full cadences)
        cadence = dict(
            step_log_print=200, step_log_tfb=200, step_save_ckpt=400,
            step_val=1000, step_vis_train=400,
        )
    cfg = {
        "experiment": {
            "save_dir": save_dir, "dataset_dir": data_dir,
            "dataset_type": "replica", "convention": "opencv",
            "width": W, "height": H,
            "enable_semantic": True, "enable_depth": True,
        },
        "model": {
            "netdepth": 8, "netwidth": 256,
            "netdepth_fine": 8, "netwidth_fine": 256,
            "chunk": "1024*32", "netchunk": "1024*32",
        },
        "render": {
            # flagship: 512 sampled pixels -> 1024 paired rays, 64+128
            "N_rays": 512, "N_samples": 64, "N_importance": 128,
            "perturb": 1, "use_viewdirs": True, "multires": 10,
            "multires_views": 4, "raw_noise_std": 1,
            # full renders at half res: the reference-supported
            # test_viz_factor path; keeps the 20 rebuilds' mean-shift
            # input at the calibrated ~230k pixels on this 2-core host
            "test_viz_factor": 2,
            "depth_range": [0.1, 10.0], "white_bkgd": False,
        },
        "train": {
            "lrate": "5e-4", "lrate_decay": "250e3", "N_iters": steps,
            "wgt_sem": 0.04, "w_n": 0.01, "w_f": 0.005, "w_i1": 0.1,
            "w_i2": 0.01, "no_cluster": False, "no_semantic_tree": False,
            "no_intrinsic_loss": False,
            "steps_per_call": 8,
        },
        "logging": cadence,
    }
    path = os.path.join(workdir, "cfg_fullrun.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path, save_dir, cadence


def _last_logged_step(save_dir):
    p = os.path.join(save_dir, "tfb_logs", "scalars.csv")
    if not os.path.exists(p):
        return 0
    last = 0
    try:
        with open(p) as f:
            for row in csv.reader(f):
                if row:
                    last = max(last, int(row[0]))
    except Exception:
        pass
    return last


def _launch(cfg_path, log_path):
    logf = open(log_path, "a")
    proc = subprocess.Popen(
        [
            sys.executable, "-u", os.path.join(REPO, "train_scene.py"),
            "--config_file", cfg_path,
            "--total_frames", str(TOTAL_FRAMES),
            "--split_step", str(SPLIT_STEP),
            "--no_progress",
        ],
        stdout=logf, stderr=subprocess.STDOUT, cwd=REPO,
        start_new_session=True,  # own pgid: we can SIGKILL the whole group
    )
    return proc, logf


def _wait_for_step(proc, save_dir, target, timeout_s, stall_s=1800):
    """Poll scalars.csv until the run reaches ``target`` (returns True),
    exits (returns False), or stalls/overruns (raises)."""
    t0 = time.time()
    last, t_last = _last_logged_step(save_dir), time.time()
    while True:
        if proc.poll() is not None:
            return False
        s = _last_logged_step(save_dir)
        if s > last:
            last, t_last = s, time.time()
        if s >= target:
            return True
        if time.time() - t_last > stall_s:
            raise RuntimeError(
                f"run stalled: no new scalars for {stall_s}s (at step {last})"
            )
        if time.time() - t0 > timeout_s:
            raise RuntimeError(f"run overran {timeout_s}s (at step {last})")
        time.sleep(10)


def phase_run(workdir, steps, kill_at, smoke):
    data_dir = os.path.join(workdir, "data")
    if not os.path.isdir(os.path.join(data_dir, "rgb")):
        print("generating scene data ...", flush=True)
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools_make_synthetic_replica.py"),
                data_dir, "--frames", str(TOTAL_FRAMES),
                "--width", str(W), "--height", str(H),
            ],
            check=True, cwd=REPO, capture_output=True,
        )
    cfg_path, save_dir, _ = make_cfg(workdir, data_dir, steps, smoke)
    log_path = os.path.join(workdir, "train_log.txt")
    events = {"wall_start": time.time()}

    # segment 1: train until kill_at, then SIGKILL the process group
    proc, logf = _launch(cfg_path, log_path)
    print(f"segment 1 launched (pid {proc.pid}); killing at step {kill_at}",
          flush=True)
    budget = 3600 * 4 if not smoke else 3600
    reached = _wait_for_step(proc, save_dir, kill_at, budget)
    if not reached:
        logf.close()
        raise RuntimeError(
            f"segment 1 exited rc={proc.returncode} before step {kill_at}; "
            f"see {log_path}"
        )
    os.killpg(proc.pid, signal.SIGKILL)
    proc.wait()
    logf.close()
    events["killed_at_logged_step"] = _last_logged_step(save_dir)
    print(f"SIGKILL at logged step {events['killed_at_logged_step']}",
          flush=True)
    with open(log_path, "a") as f:
        f.write(f"\n=== SIGKILL by tools_fullrun @~{kill_at} ===\n")

    # give the TPU grant time to release before the relaunch; retry if
    # the fresh process can't make progress (stuck grant)
    time.sleep(30 if not smoke else 5)
    for attempt in range(3):
        proc, logf = _launch(cfg_path, log_path)
        print(f"segment 2 launched (pid {proc.pid}, attempt {attempt + 1})",
              flush=True)
        try:
            done = not _wait_for_step(
                proc, save_dir, steps + 1, budget,
                stall_s=1800 if not smoke else 900,
            )
        except RuntimeError as e:
            print(f"segment 2 attempt {attempt + 1}: {e}; retrying",
                  flush=True)
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
            logf.close()
            time.sleep(120 if not smoke else 10)
            continue
        logf.close()
        if done and proc.returncode == 0:
            break
        raise RuntimeError(
            f"segment 2 exited rc={proc.returncode}; see {log_path}"
        )
    else:
        raise RuntimeError("segment 2 never completed after 3 attempts")
    events["wall_s"] = round(time.time() - events["wall_start"], 1)
    with open(os.path.join(workdir, "events.json"), "w") as f:
        json.dump(events, f)
    print(f"run complete in {events['wall_s']}s", flush=True)


# --------------------------------------------------------------------- stamp


def read_scalars(save_dir):
    """scalars.csv -> {name: {step: value}} (last write wins)."""
    out = {}
    with open(os.path.join(save_dir, "tfb_logs", "scalars.csv")) as f:
        for row in csv.reader(f):
            if len(row) != 3:
                continue
            step, name, val = int(row[0]), row[1], float(row[2])
            out.setdefault(name, {})[step] = val
    return out


def _feed_mesh(workdir, cfg_path, out_dir):
    """200k checkpoint -> extract_mesh.py -> a real mesh file."""
    mesh_path = os.path.join(out_dir, "mesh_200k.ply")
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "extract_mesh.py"),
            "--config_file", cfg_path,
            "--grid_dim", "128",
            "--out", mesh_path,
            "--total_frames", str(TOTAL_FRAMES),
            "--split_step", str(SPLIT_STEP),
        ],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
    )
    if r.returncode != 0:
        raise RuntimeError(f"extract_mesh failed:\n{r.stderr[-3000:]}")
    size = os.path.getsize(mesh_path)
    assert size > 10_000, f"suspiciously small mesh ({size} bytes)"
    return {"mesh_file": mesh_path, "mesh_bytes": size}


def _feed_editor(save_dir):
    """Final train_render dir + palette -> EditSession recompose."""
    sys.path.insert(0, REPO)
    from intrinsicnerf_tpu.tools.editing import EditSession

    d = sorted(glob.glob(os.path.join(save_dir, "train_render", "step_*")))[-1]
    s = EditSession(d, os.path.join(d, "cluster"))
    ids = s.frame_ids()
    assert ids, f"no albedo frames in {d}"
    img = s.compose(ids[0])
    assert np.isfinite(img).all() and img.ndim == 3
    # recolor one cluster and recompose (the GUI's core loop)
    sem, cid = s.pick(ids[0], img.shape[0] // 2, img.shape[1] // 2)
    if s.get_cluster_color(sem, cid) is not None:
        s.set_cluster_color(sem, cid, np.array([0.9, 0.1, 0.1], np.float32))
    img2 = s.compose(ids[0])
    assert np.isfinite(img2).all()
    return {
        "edit_dir": d,
        "edit_frames": len(ids),
        "edit_recompose_changed": bool(np.abs(img2 - img).max() > 1e-3),
    }


def phase_stamp(workdir, steps, out_name, smoke):
    save_dir = os.path.join(workdir, "logs_fullrun")
    cfg_path = os.path.join(workdir, "cfg_fullrun.yaml")
    scal = read_scalars(save_dir)
    log = open(os.path.join(workdir, "train_log.txt")).read()
    events = {}
    ev_path = os.path.join(workdir, "events.json")
    if os.path.exists(ev_path):
        events = json.loads(open(ev_path).read())

    def series(name):
        return scal.get(name, {})

    w_res = series("Train/w_residual")
    w_int = series("Train/w_intensity")
    w_c = series("Train/w_c_eff")
    b_f = series("Train/b_f")
    spc = series("Train/steps_per_call_effective")

    # switch points (smoke runs don't reach them; gate only full runs)
    res_sw = int_sw = None
    if steps > 100_000:
        res_sw = {
            "at_100k": w_res.get(100_000), "at_101k": w_res.get(101_000)
        }
        int_sw = {
            "at_50k": w_int.get(50_000), "at_51k": w_int.get(51_000)
        }

    rebuild_dirs = sorted(
        glob.glob(os.path.join(save_dir, "train_render", "step_*"))
    )
    palettes = [
        d for d in rebuild_dirs
        if os.path.exists(os.path.join(d, "cluster", "clusters.json"))
    ]
    ckpts = sorted(
        int(os.path.basename(p))
        for p in glob.glob(os.path.join(save_dir, "checkpoints", "[0-9]*"))
        if os.path.basename(p).isdigit()
    )

    # every logged scalar must be finite (the run's own NaN evidence)
    n_vals = 0
    all_finite = True
    for name, by_step in scal.items():
        for v in by_step.values():
            n_vals += 1
            if not np.isfinite(v):
                all_finite = False
                print(f"NON-FINITE scalar: {name}")

    test_psnr = series("Test/psnr")
    test_miou = series("Test/miou")
    test_acc = series("Test/total_acc")
    final_step = max(test_psnr) if test_psnr else None
    final = {
        "step": final_step,
        "psnr": test_psnr.get(final_step),
        "miou": test_miou.get(final_step),
        "total_acc": test_acc.get(final_step),
    }

    resumed_steps = [
        int(x) for x in
        __import__("re").findall(r"resumed from step (\d+)", log)
    ]
    palette_restores = __import__("re").findall(
        r"cluster palette restored from rebuild @(\d+)", log
    )
    nan_alarms = log.count("[Numerical Error]")

    feeds = {}
    feeds.update(_feed_editor(save_dir))
    feeds.update(_feed_mesh(workdir, cfg_path, workdir))

    import jax

    dev = jax.devices()[0]
    checks = {
        "residual_switch_engaged": (
            res_sw is None
            or (res_sw["at_100k"] == 1.0 and res_sw["at_101k"] == 0.02)
        ),
        "intensity_switch_engaged": (
            int_sw is None
            or (int_sw["at_50k"] == 0.1 and int_sw["at_51k"] == 0.01)
        ),
        "anneal_reaches_caps": (
            max(w_c.values() or [0]) >= 0.999
            and max(b_f.values() or [0]) >= 0.999
        ) if steps > 100_000 else True,
        "rebuilds_completed": len(rebuild_dirs)
        >= (20 if steps >= 200_000 else max(len(rebuild_dirs), 1)),
        # the SIGKILL may land mid-rebuild, leaving exactly one dir
        # without its palette (the resume then restores the previous
        # complete one — that's the recovery being proven); the FINAL
        # rebuild must always have one
        "palettes_complete": len(palettes) >= len(rebuild_dirs) - 1
        and bool(rebuild_dirs)
        and os.path.exists(
            os.path.join(rebuild_dirs[-1], "cluster", "clusters.json")
        ),
        "steps_per_call_8_both_segments": sorted(
            set(spc.values())
        ) == [8.0],
        "all_scalars_finite": all_finite,
        "no_nan_alarm": nan_alarms == 0,
        "killed_and_resumed": len(resumed_steps) >= 1,
        "palette_restored_on_resume": len(palette_restores) >= 1,
        "final_metrics_beat_10k_gate": (
            steps < 200_000
            or (
                final["psnr"] is not None
                and final["psnr"] > GATES["psnr"]
                and final["miou"] > GATES["miou"]
                and final["total_acc"] > GATES["total_acc"]
            )
        ),
        "mesh_and_editor_fed": feeds["mesh_bytes"] > 10_000
        and feeds["edit_frames"] > 0,
    }
    result = {
        "steps": steps,
        "schedule": {
            "ckpt_every": 10000, "rebuild_every": 10000, "eval_every": 50000,
            "steps_per_call": 8,
        } if not smoke else "smoke-scaled",
        "scene": "hard synthetic room, 320x240, 60 frames (48 train)",
        "device": f"{dev.platform}:{dev.device_kind}",
        "wall_s": events.get("wall_s"),
        "killed_at_logged_step": events.get("killed_at_logged_step"),
        "resumed_from_steps": resumed_steps,
        "palette_restored_from": [int(x) for x in palette_restores],
        "residual_switch": res_sw,
        "intensity_switch": int_sw,
        "w_c_trajectory": {s: w_c[s] for s in sorted(w_c)[:: max(len(w_c) // 12, 1)]},
        "b_f_trajectory": {s: b_f[s] for s in sorted(b_f)[:: max(len(b_f) // 12, 1)]},
        "n_rebuilds": len(rebuild_dirs),
        "n_checkpoints": len(ckpts),
        "latest_checkpoint": ckpts[-1] if ckpts else None,
        "n_scalar_values": n_vals,
        "nan_alarm_lines": nan_alarms,
        "final_eval": final,
        "final_gates": GATES,
        "feeds": feeds,
        "checks": checks,
        "pass": all(checks.values()),
    }
    with open(os.path.join(REPO, out_name), "w") as f:
        json.dump(result, f, indent=2, default=str)
        f.write("\n")
    print(json.dumps({k: v for k, v in result.items()
                      if k in ("final_eval", "checks", "pass", "wall_s")},
                     indent=2))
    assert result["pass"], f"FULLRUN gate FAILED: {checks}"
    print("FULLRUN GATE OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all", choices=["all", "run", "stamp"])
    ap.add_argument("--steps", type=int, default=200000)
    ap.add_argument("--kill-at", type=int, default=95000)
    ap.add_argument("--workdir", default="/tmp/fullrun_r05")
    ap.add_argument("--out", default="FULLRUN_r05.json")
    ap.add_argument("--smoke", action="store_true",
                    help="scaled cadences for rig testing")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    if args.phase in ("all", "run"):
        phase_run(args.workdir, args.steps, args.kill_at, args.smoke)
    if args.phase in ("all", "stamp"):
        phase_stamp(args.workdir, args.steps, args.out, args.smoke)


if __name__ == "__main__":
    main()
