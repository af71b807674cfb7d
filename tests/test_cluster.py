"""Tests for the reflectance-clustering subsystem: our mean-shift vs
sklearn, voxel anchor filter semantics, jitted assignment, and JSON
persistence compatibility (reference: SSR/training/cluster.py)."""

import json
import os

import numpy as np
import jax.numpy as jnp

from intrinsicnerf_tpu.cluster.meanshift import estimate_bandwidth, mean_shift
from intrinsicnerf_tpu.cluster.manager import (
    Cluster,
    ClusterManager,
    build_cluster,
    inv_map_drgb_np,
    map_drgb_np,
    voxel_anchor_filter,
)
from intrinsicnerf_tpu.cluster.assign import (
    dest_class,
    dest_color,
    dest_color_chunked,
    empty_cluster_table,
    map_drgb,
    inv_map_drgb,
)


def three_blobs(rng, n=600):
    centers = np.array([[0.2, 0.2, 0.2], [0.7, 0.3, 0.5], [0.4, 0.8, 0.6]])
    pts = np.concatenate(
        [c + rng.normal(scale=0.02, size=(n // 3, 3)) for c in centers]
    )
    return np.clip(pts, 0.01, 0.99), centers


def test_estimate_bandwidth_vs_sklearn(rng):
    from sklearn.cluster import estimate_bandwidth as sk_bw

    x, _ = three_blobs(rng)
    ours = estimate_bandwidth(x, quantile=0.3, n_samples=None)
    theirs = sk_bw(x, quantile=0.3)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_mean_shift_recovers_blobs(rng):
    x, true_centers = three_blobs(rng)
    centers, labels = mean_shift(x, bandwidth=0.1, bin_seeding=True)
    assert 3 <= len(centers) <= 4
    # each true center has a recovered center within 0.03
    for c in true_centers:
        assert np.min(np.linalg.norm(centers - c, axis=1)) < 0.03
    assert labels.shape == (len(x),)
    assert labels.max() == len(centers) - 1


def test_mean_shift_vs_sklearn_labels(rng):
    from sklearn.cluster import MeanShift

    x, _ = three_blobs(rng)
    ours_c, ours_l = mean_shift(x, bandwidth=0.1, bin_seeding=True)
    ms = MeanShift(bandwidth=0.1, bin_seeding=True).fit(x)
    assert len(ours_c) == len(ms.cluster_centers_)
    # centers agree up to permutation
    for c in ms.cluster_centers_:
        assert np.min(np.linalg.norm(ours_c - c, axis=1)) < 5e-3
    # label partitions agree (up to relabeling)
    from scipy.stats import mode

    agree = 0
    for k in range(len(ours_c)):
        mask = ours_l == k
        if mask.sum():
            agree += (ms.labels_[mask] == mode(ms.labels_[mask]).mode).sum()
    assert agree / len(x) > 0.99


def test_drgb_roundtrip(rng):
    rgb = rng.uniform(0.05, 1.0, size=(64, 3)).astype(np.float32)
    d = map_drgb_np(rgb)
    back = inv_map_drgb_np(d)
    np.testing.assert_allclose(back, rgb, rtol=1e-4, atol=1e-5)
    # jax version matches numpy version
    np.testing.assert_allclose(
        np.asarray(map_drgb(jnp.asarray(rgb))), d, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(inv_map_drgb(jnp.asarray(d))), back, rtol=1e-4, atol=1e-5
    )


def test_voxel_anchor_nearest_wins():
    # two points in the same voxel: the one nearer the voxel center wins
    pts = np.array([[0.0151, 0.015, 0.015], [0.011, 0.011, 0.011]], np.float32)
    labels = np.array([7, 3])
    anchors, links = voxel_anchor_filter(pts, labels)
    assert len(anchors) == 1
    np.testing.assert_allclose(anchors[0], pts[0])
    assert links[0] == 7


def test_build_cluster_and_assign(rng):
    rgb, _ = three_blobs(rng)
    cluster = build_cluster(rgb, band_factor=1.0)
    assert cluster.rgb_centers.shape[1] == 3
    assert len(cluster.anchors) > 0
    assert cluster.links.max() < len(cluster.rgb_centers)

    mgr = ClusterManager(class_num=1, clusters=[cluster])
    table = mgr.to_table(anchors_per_class=1024)
    labels = jnp.zeros(len(rgb), jnp.int32)
    out = np.asarray(dest_color(table, jnp.asarray(rgb, jnp.float32), labels))
    # every output is one of the cluster center colors
    d = np.linalg.norm(out[:, None, :] - cluster.rgb_centers[None], axis=-1)
    assert np.all(d.min(axis=1) < 1e-5)
    # assignment maps each pixel to a nearby center (same blob)
    assert np.mean(np.linalg.norm(out - rgb, axis=1) < 0.2) > 0.95

    cls = np.asarray(dest_class(table, jnp.asarray(rgb, jnp.float32), labels))
    assert cls.min() >= 0 and cls.max() < len(cluster.rgb_centers)

    chunked = np.asarray(
        dest_color_chunked(table, jnp.asarray(rgb, jnp.float32), labels, chunk=128)
    )
    np.testing.assert_allclose(chunked, out, atol=1e-6)


def test_empty_table_passthrough(rng):
    table = empty_cluster_table(num_classes=3, anchors_per_class=16)
    rgb = jnp.asarray(rng.uniform(0.1, 0.9, size=(10, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, size=10))
    out = np.asarray(dest_color(table, rgb, labels))
    np.testing.assert_allclose(out, np.asarray(rgb))
    assert np.all(np.asarray(dest_class(table, rgb, labels)) == -1)


def test_multiclass_table(rng):
    rgb, centers = three_blobs(rng)
    c0 = build_cluster(rgb[:200], band_factor=1.0)
    c2 = build_cluster(rgb[400:], band_factor=1.0)
    mgr = ClusterManager(class_num=3, clusters=[c0, None, c2])
    table = mgr.to_table(anchors_per_class=512)
    # class 1 is empty -> passthrough
    x = jnp.asarray(rgb[:10].astype(np.float32))
    out1 = np.asarray(dest_color(table, x, jnp.ones(10, jnp.int32)))
    np.testing.assert_allclose(out1, np.asarray(x))
    # class 0 maps to c0's single center
    out0 = np.asarray(dest_color(table, x, jnp.zeros(10, jnp.int32)))
    d = np.linalg.norm(out0[:, None] - c0.rgb_centers[None], axis=-1)
    assert np.all(d.min(1) < 1e-5)


def test_json_persistence_reference_format(tmp_path, rng):
    rgb, _ = three_blobs(rng)
    mgr = ClusterManager(class_num=2)
    mgr.update_centers(
        labels=np.concatenate([np.zeros(300), np.ones(300)]),
        pixels=rgb,
        band_factor=1.0,
    )
    mgr.save(str(tmp_path / "cluster"))
    # reference layout: clusters.json + c{i}/config.json + swatch pngs
    with open(tmp_path / "cluster" / "clusters.json") as f:
        data = json.load(f)
    assert data["class_num"] == 2
    assert len(data["cluster_dirs"]) == 2
    with open(tmp_path / "cluster" / "c0" / "config.json") as f:
        cfg = json.load(f)
    assert set(cfg) == {
        "batch_size",
        "intensity_factor",
        "rgb_centers",
        "anchors",
        "links",
    }
    # links are [A, 1] nested lists as in the reference's tolist()
    assert isinstance(cfg["links"][0], list)
    assert os.path.exists(tmp_path / "cluster" / "c0" / "0.png")

    loaded = ClusterManager.load(str(tmp_path / "cluster"))
    assert loaded.class_num == 2
    np.testing.assert_allclose(
        loaded.clusters[0].anchors, mgr.clusters[0].anchors, rtol=1e-6
    )
    np.testing.assert_allclose(
        loaded.clusters[1].rgb_centers, mgr.clusters[1].rgb_centers, rtol=1e-6
    )
