"""Sampler and train-step tests, including a tiny end-to-end training
run on a synthetic scene (SURVEY.md §4: loss-decrease integration test)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from intrinsicnerf_tpu.cluster.assign import empty_cluster_table
from intrinsicnerf_tpu.core.rays import create_rays
from intrinsicnerf_tpu.data.samplers import sample_ray_pairs
from intrinsicnerf_tpu.models.mlp import MLPConfig
from intrinsicnerf_tpu.render.pipeline import RenderConfig
from intrinsicnerf_tpu.train.schedules import (
    cluster_anneal,
    loss_weight_schedule,
    make_lr_schedule,
)
from intrinsicnerf_tpu.train.step import (
    DataPools,
    TrainConfig,
    create_train_state,
    make_train_step,
)


H = W = 16


def make_pools(n_img=3, semantic=True, seed=0):
    rng = np.random.default_rng(seed)
    c2ws = []
    for i in range(n_img):
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = -3.0 - 0.1 * i
        c2ws.append(c2w)
    rays = create_rays(
        jnp.asarray(np.stack(c2ws)), H, W, 8.0, 8.0, (W - 1) / 2, (H - 1) / 2,
        1.0, 6.0,
    )
    rgb = jnp.asarray(rng.uniform(size=(n_img, H * W, 3)).astype(np.float32))
    sem = (
        jnp.asarray(rng.integers(0, 4, size=(n_img, H * W)))
        if semantic
        else None
    )
    depth = jnp.asarray(rng.uniform(1, 5, size=(n_img, H * W)).astype(np.float32))
    mask_ids = jnp.asarray(np.ones(n_img, np.int32))
    return DataPools(rays=rays, rgb=rgb, depth=depth, semantic=sem, mask_ids=mask_ids)


def test_sampler_pairing_contract():
    pools = make_pools()
    n = 64
    batch = sample_ray_pairs(
        jax.random.key(0), pools.rays, pools.rgb, H, W, n,
        depth_pool=pools.depth, sem_pool=pools.semantic, mask_ids=pools.mask_ids,
    )
    assert batch.rays.shape == (2 * n, 11)
    assert batch.rgb.shape == (2 * n, 3)
    assert batch.semantic.shape == (2 * n,)
    assert float(batch.sem_flag) == 1.0
    # all rays share one image origin
    np.testing.assert_allclose(
        np.asarray(batch.rays[:, 0:3]),
        np.tile(np.asarray(batch.rays[:1, 0:3]), (2 * n, 1)),
    )
    # pair i and i+n are 8-neighbors: recover pixel indices from ray dirs
    # by matching against the per-image pool
    img = int(batch.image_idx)
    pool = np.asarray(pools.rays[img])
    d = np.asarray(batch.rays[:, 3:6])
    idx = np.argmin(
        np.linalg.norm(pool[None, :, 3:6] - d[:, None, :], axis=-1), axis=1
    )
    r, c = idx // W, idx % W
    dr = np.abs(r[:n] - r[n:])
    dc = np.abs(c[:n] - c[n:])
    assert np.all(dr <= 1) and np.all(dc <= 1)


def test_sampler_keys_differ():
    pools = make_pools()
    b1 = sample_ray_pairs(jax.random.key(1), pools.rays, pools.rgb, H, W, 32)
    b2 = sample_ray_pairs(jax.random.key(2), pools.rays, pools.rgb, H, W, 32)
    assert not np.allclose(np.asarray(b1.rays), np.asarray(b2.rays))


def test_schedules():
    w_res, w_i = loss_weight_schedule(jnp.asarray(0), 1.0, 0.02, 0.1, 0.01)
    assert float(w_res) == 1.0 and float(w_i) == pytest.approx(0.1)
    w_res, w_i = loss_weight_schedule(jnp.asarray(150_000), 1.0, 0.02, 0.1, 0.01)
    assert float(w_res) == pytest.approx(0.02) and float(w_i) == pytest.approx(0.01)

    lr = make_lr_schedule(5e-4, 250e3)
    assert float(lr(0)) == pytest.approx(5e-4)
    assert float(lr(250_000)) == pytest.approx(5e-5, rel=1e-3)

    # anneal: first rebuild at 10k of 200k total -> w_c=0.01, b_f=0.25
    w_c, b_f = cluster_anneal(10_000, 10_000, 200_000)
    assert w_c == pytest.approx(0.01) and b_f == pytest.approx(0.25)
    # last rebuild approaches 1 (scene cap) / 0.5 (object cap)
    w_c, b_f = cluster_anneal(190_000, 10_000, 200_000)
    assert w_c == pytest.approx(1.0) and b_f == pytest.approx(1.0)
    _, b_f = cluster_anneal(190_000, 10_000, 200_000, b_f_cap=0.5)
    assert b_f == pytest.approx(0.5)


def _build_step(semantic=True, n_rays=32):
    mcfg = MLPConfig(
        depth=3, width=32, skips=(1,),
        n_freqs_pos=4, n_freqs_dir=2,
        enable_semantic=semantic, num_semantic_classes=4 if semantic else 0,
    )
    rcfg = RenderConfig(n_coarse=8, n_importance=8, raw_noise_std=1.0)
    tcfg = TrainConfig(n_rays=n_rays)
    opt = optax.adam(learning_rate=make_lr_schedule(tcfg.lrate, tcfg.lrate_decay))
    state = create_train_state(jax.random.key(0), mcfg, tcfg, opt)
    step = make_train_step(mcfg, rcfg, tcfg, opt, H, W)
    return mcfg, state, jax.jit(step)


def test_train_step_runs_and_learns():
    pools = make_pools(semantic=True)
    _, state, step = _build_step()
    table = empty_cluster_table(4, 64)
    key = jax.random.key(42)
    first = None
    for i in range(60):
        state, report = step(state, pools, table, jnp.float32(0.0), key)
        if i == 0:
            first = float(report.total)
            for name, v in report._asdict().items():
                assert np.isfinite(float(v)), f"{name} not finite"
    assert int(state.step) == 60
    assert float(report.total) < first * 0.8, (first, float(report.total))
    assert float(report.psnr_fine) > 0


def test_train_step_cluster_loss_active():
    """With a real cluster table and w_c>0 the cluster term contributes."""
    from intrinsicnerf_tpu.cluster.manager import ClusterManager, build_cluster

    pools = make_pools(semantic=True)
    _, state, step = _build_step()
    rng = np.random.default_rng(0)
    cluster = build_cluster(
        np.clip(rng.uniform(0.2, 0.8, size=(300, 3)), 0, 1), band_factor=1.0
    )
    table = ClusterManager(class_num=4, clusters=[cluster] * 4).to_table(64)
    state, report = step(state, pools, table, jnp.float32(0.5), jax.random.key(1))
    assert float(report.reflect_cluster) > 0
    # with the empty (passthrough) table the target IS the fine albedo, so
    # the fine term vanishes and only the coarse-vs-fine gap remains —
    # the reported sum must shrink vs the real table
    state2, report2 = step(
        state, pools, empty_cluster_table(4, 64), jnp.float32(0.5), jax.random.key(1)
    )
    assert float(report2.reflect_cluster) < float(report.reflect_cluster)


def test_train_step_object_mode():
    """Object pipeline: no semantics, mask pairing, white bkgd."""
    mcfg = MLPConfig(depth=3, width=32, skips=(1,), n_freqs_pos=4, n_freqs_dir=2)
    rcfg = RenderConfig(n_coarse=8, n_importance=8, white_bkgd=True)
    tcfg = TrainConfig(n_rays=16, mask_mode="mask")
    opt = optax.adam(5e-4)
    state = create_train_state(jax.random.key(0), mcfg, tcfg, opt)
    step = jax.jit(make_train_step(mcfg, rcfg, tcfg, opt, H, W))
    pools = make_pools(semantic=False)
    # mask stored in the semantic pool slot as float 0/1
    mask = jnp.asarray(
        (np.random.default_rng(0).uniform(size=(3, H * W)) > 0.3).astype(np.float32)
    )
    pools = pools._replace(semantic=mask)
    table = empty_cluster_table(1, 16)
    state, report = step(state, pools, table, jnp.float32(0.0), jax.random.key(3))
    assert np.isfinite(float(report.total))


def test_all_image_sampler():
    from intrinsicnerf_tpu.data.samplers import sample_ray_pairs_all_images

    pools = make_pools(n_img=3)
    n = 64
    batch = sample_ray_pairs_all_images(
        jax.random.key(0), pools.rays, pools.rgb, H, W, n,
        depth_pool=pools.depth, sem_pool=pools.semantic,
    )
    assert batch.rays.shape == (2 * n, 11)
    # multiple distinct image origins appear in one batch
    origins = np.unique(np.round(np.asarray(batch.rays[:, 2]), 4))
    assert len(origins) > 1
    # pair i and i+n share an image (same origin)
    np.testing.assert_allclose(
        np.asarray(batch.rays[:n, 0:3]), np.asarray(batch.rays[n:, 0:3])
    )


def test_all_image_sampler_mask_ids_void_labels():
    from intrinsicnerf_tpu.data.samplers import sample_ray_pairs_all_images

    pools = make_pools(n_img=3)
    # only image 0 keeps semantic supervision
    mask_ids = jnp.asarray([1, 0, 0])
    sem = jnp.ones((3, H * W), jnp.int32) * 2  # all labeled class 2
    batch = sample_ray_pairs_all_images(
        jax.random.key(5), pools.rays, pools.rgb, H, W, 128,
        sem_pool=sem, mask_ids=mask_ids,
    )
    labels = np.asarray(batch.semantic)
    # rays from masked images were voided; supervised ones keep label 2
    assert set(np.unique(labels)) <= {0, 2}
    assert (labels == 0).any() and (labels == 2).any()


def test_multi_step_matches_single_dispatch():
    """make_multi_step (TrainConfig.steps_per_call): scanning K steps in
    one executable must reproduce K separate dispatches exactly — the
    step folds its RNG key by state.step, so the scanned sequence sees
    the same keys."""
    from intrinsicnerf_tpu.train.step import make_multi_step

    mcfg = MLPConfig(depth=3, width=32, skips=(1,), n_freqs_pos=4,
                     n_freqs_dir=2, enable_semantic=True,
                     num_semantic_classes=4)
    rcfg = RenderConfig(n_coarse=6, n_importance=6, perturb=1.0,
                        raw_noise_std=1.0)
    tcfg = TrainConfig(n_rays=8)
    opt = optax.adam(5e-4)
    pools = make_pools(n_img=3)
    table = empty_cluster_table(4, 16)
    key = jax.random.key(5)
    w_c = jnp.float32(0.1)

    base = make_train_step(mcfg, rcfg, tcfg, opt, H, W)
    single = jax.jit(base)
    s1 = create_train_state(jax.random.key(0), mcfg, tcfg, opt)
    reports = []
    for _ in range(4):
        s1, rep = single(s1, pools, table, w_c, key)
        reports.append(rep)

    multi = jax.jit(make_multi_step(base, 4))
    s2 = create_train_state(jax.random.key(0), mcfg, tcfg, opt)
    s2, rep_last = multi(s2, pools, table, w_c, key)

    assert int(s2.step) == int(s1.step) == 4
    np.testing.assert_allclose(
        float(rep_last.total), float(reports[-1].total), rtol=1e-6
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(s1.params_coarse),
        jax.tree_util.tree_leaves_with_path(s2.params_coarse),
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5,
            err_msg=f"params{jax.tree_util.keystr(pa)} diverge under scan",
        )


def test_trainer_steps_per_call_fit(tmp_path):
    """Trainer.fit with steps_per_call > 1: strides the loop, lands on
    logging-cadence boundaries, and falls back to 1 when the block size
    does not divide the cadences."""
    from intrinsicnerf_tpu.config import (
        ExperimentConfig,
        FrameworkConfig,
        LoggingConfig,
    )
    from intrinsicnerf_tpu.train.trainer import SceneBundle, Trainer

    pools = make_pools(n_img=3)
    bundle = SceneBundle(
        pools=pools,
        rays_vis=pools.rays[:1],
        rays_test=pools.rays[:1],
        h=H, w=W, h_scaled=H, w_scaled=W,
        num_valid_classes=4,
        test_gt={},
    )

    def make(spc, save_dir):
        return FrameworkConfig(
            experiment=ExperimentConfig(save_dir=save_dir, enable_semantic=True),
            mlp=MLPConfig(depth=3, width=32, skips=(1,), n_freqs_pos=4,
                          n_freqs_dir=2, enable_semantic=True,
                          num_semantic_classes=4),
            render=RenderConfig(n_coarse=6, n_importance=6),
            train=TrainConfig(n_rays=8, n_iters=8, steps_per_call=spc),
            logging=LoggingConfig(step_log_tfb=4, step_save_ckpt=10**9,
                                  step_vis_train=10**9, step_val=10**9),
        )

    trainer = Trainer(make(4, str(tmp_path / "spc")), bundle)
    assert trainer._steps_per_call(8, 0) == 4
    report = trainer.fit(n_iters=8, progress=False)
    assert int(trainer.state.step) == 8
    assert np.isfinite(float(report.total))
    trainer.close()

    # 3 does not divide step_log_tfb=4 -> fallback to 1
    trainer2 = Trainer(make(3, str(tmp_path / "spc_bad")), bundle)
    assert trainer2._steps_per_call(8, 0) == 1
    trainer2.close()


def test_resume_restores_cluster_palette(tmp_path):
    """A restart from a checkpoint at a non-multiple of step_vis_train
    must reload the newest on-disk palette: the resumed trainer's first
    block runs with nonzero cluster weight instead of silently training
    with w_c_eff=0 until the next rebuild (VERDICT r4 missing #4; the
    reference restarts with cluster=None, run_nerf.py:862)."""
    from intrinsicnerf_tpu.config import (
        ExperimentConfig,
        FrameworkConfig,
        LoggingConfig,
    )
    from intrinsicnerf_tpu.train.trainer import SceneBundle, Trainer

    pools = make_pools(n_img=3)
    bundle = SceneBundle(
        pools=pools,
        rays_vis=pools.rays[:1],
        rays_test=pools.rays[:1],
        h=H, w=W, h_scaled=H, w_scaled=W,
        num_valid_classes=4,
        test_gt={},
    )
    cfg = FrameworkConfig(
        experiment=ExperimentConfig(
            save_dir=str(tmp_path / "run"), enable_semantic=True
        ),
        mlp=MLPConfig(depth=3, width=32, skips=(1,), n_freqs_pos=4,
                      n_freqs_dir=2, enable_semantic=True,
                      num_semantic_classes=4),
        render=RenderConfig(n_coarse=6, n_importance=6),
        train=TrainConfig(n_rays=8, n_iters=12),
        # rebuild @4,8,...; ckpt @2,4,6,...: stopping at 6 leaves the
        # newest ckpt (6) PAST the newest palette (4) — the mid-cadence
        # kill the reference recovers from with cluster loss OFF
        logging=LoggingConfig(step_log_tfb=2, step_save_ckpt=2,
                              step_vis_train=4, step_val=10**9),
    )
    with Trainer(cfg, bundle) as t1:
        t1.fit(n_iters=6, progress=False)
        assert t1.cluster_manager is not None
        w_c_before, table_before = t1.w_c, jax.device_get(t1.table)

    with Trainer(cfg, bundle) as t2:
        assert t2.cluster_manager is None  # fresh object: no palette yet
        assert t2.maybe_resume() == 6
        # palette restored from the rebuild @4, anneal weights rederived
        assert t2.cluster_manager is not None
        assert t2.w_c == w_c_before and t2.w_c > 0
        np.testing.assert_allclose(
            np.asarray(t2.table.colors), np.asarray(table_before.colors)
        )
        np.testing.assert_allclose(
            np.asarray(t2.table.anchors), np.asarray(table_before.anchors)
        )
        # the resumed block trains WITH the cluster term live
        state, report = t2.step_fn(
            t2.state, t2.bundle.pools, t2.table, jnp.float32(t2.w_c), t2.key
        )
        assert float(report.reflect_cluster) > 0.0
