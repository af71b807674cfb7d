"""A/B harness for step-time experiments (VERDICT r2 item 3).

Times the full bench-config train step under toggled optimizations
(monkeypatched) and prints ms/step per variant.  Winners get promoted
into the source; this file records the methodology and keeps the A/Bs
reproducible at HEAD: after the round-3 promotions the sorted-draw +
rank-merge path IS the default, so 'base' now patches the historical
unsorted-draw + jnp.sort path back in, and 'sortmerge' is a no-op alias
for the default.

Usage: python tools_perf_ab.py [variant ...]
Variants: base rbg bf16save tile2048 sortmerge all
"""

import sys
import time

import numpy as np


def unsorted_sample_pdf(bins, weights, n_samples, key=None, det=False, u=None):
    """Historical-baseline sample_pdf: *unsorted* iid uniform draws (the
    pre-promotion behavior).  ``sampling.sample_pdf`` itself now draws
    sorted uniforms via exponential spacings, so reconstructing the
    pre-sortmerge baseline requires overriding ``u`` here — otherwise
    the 'base' arm would silently measure the promoted path."""
    import jax
    from intrinsicnerf_tpu.core import sampling

    if u is None and not det:
        assert key is not None
        u = jax.random.uniform(
            key, (*weights.shape[:-1], n_samples), dtype=bins.dtype
        )
        return sampling.sample_pdf(bins, weights, n_samples, u=u)
    return sampling.sample_pdf(bins, weights, n_samples, key=key, det=det, u=u)


def log_exclusive_transmittance(alpha, eps: float = 1e-10):
    """cumprod -> exp(cumsum(log)) rewrite: cumsum's backward is a
    reversed cumsum (cheap, parallel) vs cumprod's scan."""
    import jax.numpy as jnp

    lg = jnp.log(1.0 - alpha + eps)
    c = jnp.cumsum(lg, axis=-1)
    excl = jnp.concatenate([jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)
    return jnp.exp(excl)


def make_packed_sampler(pools, h, w, n_rays):
    """Single-gather sampler: all per-pixel leaves packed into one
    [I, HW, 16] pool so the batch gather issues once."""
    import jax
    import jax.numpy as jnp
    from intrinsicnerf_tpu.data.samplers import RayBatch

    packed = jnp.concatenate(
        [
            pools.rays,
            pools.rgb,
            pools.depth[..., None],
            pools.semantic[..., None].astype(jnp.float32),
        ],
        axis=-1,
    )
    mask_ids = pools.mask_ids

    def sample_fn(key, _pools, step):
        num_img = packed.shape[0]
        k_img, k_pix, k_bh, k_bw = jax.random.split(key, 4)
        img = jax.random.randint(k_img, (), 0, num_img)
        idx_hw = jax.random.randint(k_pix, (n_rays,), 0, h * w)
        idx_h, idx_w = idx_hw // w, idx_hw % w
        nei_h = jnp.clip(idx_h + jax.random.randint(k_bh, (n_rays,), -1, 2), 0, h - 1)
        nei_w = jnp.clip(idx_w + jax.random.randint(k_bw, (n_rays,), -1, 2), 0, w - 1)
        idx = jnp.concatenate([idx_hw, nei_h * w + nei_w], axis=0)
        per_img = jax.lax.dynamic_index_in_dim(packed, img, 0, keepdims=False)
        rows = jnp.take(per_img, idx, axis=0)  # [2N, 16]
        return RayBatch(
            rays=rows[:, 0:11],
            rgb=rows[:, 11:14],
            depth=rows[:, 14],
            semantic=rows[:, 15].astype(jnp.int32),
            sem_flag=mask_ids[img].astype(jnp.float32),
            image_idx=img,
        )

    return sample_fn


def run_variant(name):
    import jax
    import jax.numpy as jnp
    import optax

    from bench_common import make_synthetic_pools, time_steps
    from intrinsicnerf_tpu.cluster.manager import ClusterManager, build_cluster
    from intrinsicnerf_tpu.models.mlp import MLPConfig
    from intrinsicnerf_tpu.ops import fused_mlp
    from intrinsicnerf_tpu.render import pipeline
    from intrinsicnerf_tpu.train.schedules import make_lr_schedule
    from intrinsicnerf_tpu.train.step import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    # reset monkeypatches.  NOTE on arm semantics after the round-3
    # promotions: sorted-uniform draws + rank merge are now the *default*
    # pipeline, so 'sortmerge' is a no-op and 'base' actively patches the
    # historical unsorted-draw + jnp.sort path back in so the recorded
    # A/B stays reproducible at HEAD (advisor r3).
    from intrinsicnerf_tpu.core import sampling, compositing

    pipeline.sample_pdf = sampling.sample_pdf
    pipeline.merge_sorted_z_vals = sampling.merge_sorted_z_vals
    fused_mlp.SAVE_DTYPE = jnp.float32
    fused_mlp.TILE_BWD = 1024
    if not hasattr(compositing, "_orig_excl_trans"):
        compositing._orig_excl_trans = compositing.exclusive_transmittance
    compositing.exclusive_transmittance = compositing._orig_excl_trans
    key_impl = None
    use_packed_sampler = False

    toks = name.split("+")
    for t in toks:
        if t in ("base",):
            # reconstruct the pre-sortmerge baseline (unsorted iid draws
            # + full-sort merge), since the optimized path is now default
            pipeline.sample_pdf = unsorted_sample_pdf
            pipeline.merge_sorted_z_vals = sampling.merge_z_vals
        elif t == "rbg":
            key_impl = "rbg"
        elif t == "bf16save":
            fused_mlp.SAVE_DTYPE = jnp.bfloat16
        elif t == "tile2048":
            fused_mlp.TILE_BWD = 2048
        elif t == "sortmerge":
            pass  # promoted: this is the default pipeline now
        elif t == "logtrans":
            compositing.exclusive_transmittance = log_exclusive_transmittance
        elif t == "packsampler":
            use_packed_sampler = True
        elif t in ("nonoise", "nocluster", "nointr"):
            pass  # handled below (config tweaks)
        else:
            raise ValueError(t)

    h, w = 240, 320
    n_classes = 27
    n_img = 16
    mcfg = MLPConfig(
        pos_scalar_factor=10.0,
        enable_semantic=True,
        num_semantic_classes=n_classes,
        compute_dtype=jnp.bfloat16,
        use_fused_kernel=True,
    )
    from intrinsicnerf_tpu.render.pipeline import RenderConfig

    rcfg = RenderConfig(
        n_coarse=64,
        n_importance=128,
        perturb=1.0,
        raw_noise_std=0.0 if "nonoise" in toks else 1.0,
    )
    tcfg = TrainConfig(
        n_rays=512,
        no_cluster="nocluster" in toks,
        no_intrinsic_loss="nointr" in toks,
    )
    opt = optax.adam(make_lr_schedule(tcfg.lrate, tcfg.lrate_decay))

    rng = np.random.default_rng(0)
    pools = make_synthetic_pools(h, w, n_img, n_classes)
    cluster = build_cluster(
        np.clip(rng.uniform(0.1, 0.9, size=(2000, 3)), 0, 1), band_factor=1.0
    )
    table = ClusterManager(
        class_num=n_classes, clusters=[cluster] * n_classes
    ).to_table(anchors_per_class=2048)

    state = create_train_state(jax.random.key(0), mcfg, tcfg, opt)
    sample_fn = (
        make_packed_sampler(pools, h, w, tcfg.n_rays)
        if use_packed_sampler
        else None
    )
    step = jax.jit(
        make_train_step(mcfg, rcfg, tcfg, opt, h, w, sample_fn=sample_fn),
        donate_argnums=(0,),
    )
    key = (
        jax.random.key(7, impl=key_impl) if key_impl else jax.random.key(7)
    )
    iters = 200
    dt, state = time_steps(step, state, pools, table, jnp.float32(0.01), key, iters)
    ms = dt / iters * 1e3
    rays = 2 * tcfg.n_rays * iters / dt
    print(f"{name:28s} {ms:7.3f} ms/step   {rays:9.1f} rays/s", flush=True)
    return ms


def main():
    variants = sys.argv[1:] or [
        "base",
        "rbg",
        "bf16save",
        "bf16save+tile2048",
        "sortmerge",
        "rbg+bf16save+sortmerge",
    ]
    if variants == ["all"]:
        variants = [
            "base",
            "rbg",
            "bf16save",
            "bf16save+tile2048",
            "sortmerge",
            "rbg+bf16save+sortmerge",
            "rbg+bf16save+tile2048+sortmerge",
        ]
    for v in variants:
        run_variant(v)


if __name__ == "__main__":
    main()
