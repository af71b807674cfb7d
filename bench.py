"""Benchmark: training-step throughput in rays/s/chip (fwd+bwd).

Workload = the reference's Replica-scene headline config
(SSR_room0_config.yaml / BASELINE.md): 512 sampled pixels x2 neighbor
pairing = 1024 rays/step, 64 coarse + 128 fine samples/ray, 8x256
coarse+fine MLPs with 27-class semantic head, full loss stack (image +
semantic CE + 6 intrinsic priors + cluster term against a live anchor
table), Adam with exp LR decay — i.e. the complete fused train step,
not a bare forward.

Dispatch amortization: host->device dispatch costs ~0.7 ms *serialized*
on this backend (tools_fwd_probe.py), so the bench — like the Trainer's
``steps_per_call`` and any production TPU loop — scans 8 steps per
dispatch inside one executable (``bench_common.make_multi_step``).  The
per-step semantics (RNG folding, LR schedule, loss stack) are identical
and covered by ``test_multi_step_matches_single_dispatch``.

Baseline: the reference publishes no throughput numbers (BASELINE.md).
Anchor: its inherited nerf-pytorch README reports fern 200k iters in
~8h on an RTX 2080 Ti at N_rand=1024 -> ~6.9 steps/s; at the scene
config's 1024 rays/step that is ~7.1k rays/s, and IntrinsicNeRF adds
heads/losses on top, so 7111 rays/s is a *generous* reference-GPU
anchor.  vs_baseline = measured / 7111.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys

import numpy as np

BASELINE_RAYS_PER_S = 7111.0


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from bench_common import make_multi_step, make_synthetic_pools, time_steps
    from intrinsicnerf_tpu.cluster.manager import ClusterManager, build_cluster
    from intrinsicnerf_tpu.models.mlp import MLPConfig
    from intrinsicnerf_tpu.render.pipeline import RenderConfig
    from intrinsicnerf_tpu.train.schedules import make_lr_schedule
    from intrinsicnerf_tpu.train.step import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    h, w = 240, 320
    n_classes = 27
    n_img = 16  # sampler cost is independent of pool image count
    mcfg = MLPConfig(
        pos_scalar_factor=10.0,
        enable_semantic=True,
        num_semantic_classes=n_classes,
        compute_dtype=jnp.bfloat16,  # trunk in bf16; heads/losses fp32
        use_fused_kernel=True,  # Pallas fused trunk+heads w/ custom VJP
    )
    rcfg = RenderConfig(n_coarse=64, n_importance=128, perturb=1.0, raw_noise_std=1.0)
    tcfg = TrainConfig(n_rays=512)
    opt = optax.adam(make_lr_schedule(tcfg.lrate, tcfg.lrate_decay))

    rng = np.random.default_rng(0)
    pools = make_synthetic_pools(h, w, n_img, n_classes)
    # realistic cluster table: one real cluster per class
    cluster = build_cluster(
        np.clip(rng.uniform(0.1, 0.9, size=(2000, 3)), 0, 1), band_factor=1.0
    )
    table = ClusterManager(
        class_num=n_classes, clusters=[cluster] * n_classes
    ).to_table(anchors_per_class=2048)

    state = create_train_state(jax.random.key(0), mcfg, tcfg, opt)
    # K steps per dispatch: host->device dispatch is ~0.7 ms and
    # serialized on this backend (see bench_common.make_multi_step);
    # production loops scan steps inside one executable, so the bench
    # does too.  K=8 keeps per-call latency ~100 ms (interactivity) while
    # making dispatch <1% of the measurement.
    steps_per_call = 8
    step = jax.jit(
        make_multi_step(
            make_train_step(mcfg, rcfg, tcfg, opt, h, w), steps_per_call
        ),
        donate_argnums=(0,),
    )

    # N timed windows -> median + spread (VERDICT r4 weak #1: a single
    # 200-step window has ~4% run-to-run spread, so one number cannot
    # distinguish regression from noise).  Sync per the bench_common
    # caveat: host readback, NOT block_until_ready.
    import time

    w_c = jnp.float32(0.01)
    key = jax.random.key(7)
    iters = 25  # x steps_per_call = 200 steps per window
    windows = 5
    for _ in range(5):  # compile + steady-state warmup
        state, rep = step(state, pools, table, w_c, key)
    float(rep.total)
    rays_per_step = 2 * tcfg.n_rays
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, rep = step(state, pools, table, w_c, key)
        float(rep.total)
        dt = time.perf_counter() - t0
        rates.append(rays_per_step * steps_per_call * iters / dt)
    rates_sorted = sorted(rates)
    median = float(np.median(rates))
    spread = {
        "windows": windows,
        "steps_per_window": iters * steps_per_call,
        "min": round(rates_sorted[0], 1),
        "max": round(rates_sorted[-1], 1),
        "iqr": round(
            float(
                np.percentile(rates, 75) - np.percentile(rates, 25)
            ),
            1,
        ),
    }

    # regression check vs the previous round's stamped median: >5% drop
    # fails the stamp (exit nonzero) instead of hiding in the noise
    prev = _previous_round_value()
    regressed = prev is not None and median < 0.95 * prev

    print(
        json.dumps(
            {
                "metric": "train_rays_per_s_per_chip",
                "value": round(median, 1),
                "unit": "rays/s (fwd+bwd, 192 samples/ray, full loss stack; median of 5 windows)",
                "vs_baseline": round(median / BASELINE_RAYS_PER_S, 2),
                "spread": spread,
            }
        )
    )
    print(
        f"# median {median:.0f} rays/s over {windows} windows of "
        f"{iters*steps_per_call} steps (min {spread['min']}, max "
        f"{spread['max']}, iqr {spread['iqr']}) on "
        f"{jax.devices()[0].platform}:{jax.devices()[0].device_kind}"
        + (f"; prev round {prev:.0f}" if prev is not None else ""),
        file=sys.stderr,
    )
    if regressed:
        print(
            f"# REGRESSION: median {median:.0f} is >5% below the previous "
            f"round's {prev:.0f}",
            file=sys.stderr,
        )
        sys.exit(1)


def _previous_round_value():
    """Stamped value from the newest BENCH_r*.json at the repo root."""
    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m:
            continue
        n = int(m.group(1))
        try:
            data = json.loads(open(p).read())
        except Exception:
            continue
        val = (data.get("parsed") or {}).get("value", data.get("value"))
        if val is None:
            continue
        if best is None or n > best[0]:
            best = (n, float(val))
    return best[1] if best else None


if __name__ == "__main__":
    main()
