"""Dataset loader tests over synthetic on-disk fixtures matching the
reference directory layouts."""

import json
import os

import numpy as np
import pytest

from intrinsicnerf_tpu.data.blender import (
    composite_white_background,
    load_blender_data,
    load_blender_intrinsic_data,
    pose_spherical,
    spherical_render_poses,
)
from intrinsicnerf_tpu.data.replica import default_replica_split, load_replica
from intrinsicnerf_tpu.data import degradations


def _write_png(path, arr):
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path), exist_ok=True)
    imageio.imwrite(path, arr)


@pytest.fixture
def blender_dir(tmp_path, rng):
    h = w = 8
    for split, n in (("train", 3), ("val", 2), ("test", 2)):
        frames = []
        for i in range(n):
            name = f"r_{i}"
            img = rng.integers(0, 255, size=(h, w, 4)).astype(np.uint8)
            _write_png(str(tmp_path / split / f"{name}.png"), img)
            pose = np.eye(4)
            pose[2, 3] = 4.0 + i
            frames.append(
                {"file_path": f"./{split}/{name}", "transform_matrix": pose.tolist()}
            )
        meta = {"camera_angle_x": 0.6911, "frames": frames}
        (tmp_path / f"transforms_{split}.json").write_text(json.dumps(meta))
    return str(tmp_path)


def test_load_blender(blender_dir):
    data = load_blender_data(blender_dir, testskip=1)
    assert data.images.shape == (7, 8, 8, 4)
    assert data.images.dtype == np.float32
    assert data.images.max() <= 1.0
    assert [len(s) for s in data.i_split] == [3, 2, 2]
    assert data.render_poses.shape == (40, 4, 4)
    np.testing.assert_allclose(
        data.focal, 0.5 * 8 / np.tan(0.5 * 0.6911), rtol=1e-5
    )
    white = composite_white_background(data.images)
    assert white.shape == (7, 8, 8, 3)


def test_pose_spherical_radius():
    for th in (0.0, 45.0, 120.0):
        p = pose_spherical(th, -30.0, 4.0)
        np.testing.assert_allclose(np.linalg.norm(p[:3, 3]), 4.0, rtol=1e-5)
    poses = spherical_render_poses(8)
    assert poses.shape == (8, 4, 4)
    # distinct azimuths
    assert not np.allclose(poses[0], poses[4])


@pytest.fixture
def blender_intrinsic_dir(tmp_path, rng):
    h = w = 8
    for split, n in (("train", 2), ("val", 1), ("test", 1)):
        frames = []
        for i in range(n):
            name = f"r_{i}"
            img = rng.integers(0, 255, size=(h, w, 4)).astype(np.uint8)
            _write_png(str(tmp_path / split / "color" / f"{name}.png"), img)
            _write_png(
                str(tmp_path / split / "albedo" / f"{name}_albedo_0001.png"), img
            )
            pose = np.eye(4)
            frames.append(
                {"file_path": f"./{split}/{name}", "transform_matrix": pose.tolist()}
            )
        meta = {"camera_angle_x": 0.6911, "frames": frames}
        (tmp_path / f"transforms_{split}.json").write_text(json.dumps(meta))
    return str(tmp_path)


def test_load_blender_intrinsic(blender_intrinsic_dir):
    data = load_blender_intrinsic_data(blender_intrinsic_dir)
    assert data.images.shape == (4, 8, 8, 4)
    assert data.albedo_images.shape == (4, 8, 8, 4)
    assert data.render_poses.shape == (80, 4, 4)


@pytest.fixture
def replica_dir(tmp_path, rng):
    h, w, n = 12, 16, 10
    traj = []
    for i in range(n):
        rgb = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        depth = rng.integers(500, 5000, size=(h, w)).astype(np.uint16)
        sem = rng.choice([0, 3, 7, 12], size=(h, w)).astype(np.uint8)
        _write_png(str(tmp_path / "rgb" / f"rgb_{i}.png"), rgb)
        _write_png(str(tmp_path / "depth" / f"depth_{i}.png"), depth)
        _write_png(str(tmp_path / "semantic_class" / f"semantic_class_{i}.png"), sem)
        pose = np.eye(4)
        pose[0, 3] = i * 0.1
        traj.append(pose.reshape(-1))
    np.savetxt(str(tmp_path / "traj_w_c.txt"), np.stack(traj), delimiter=" ")
    return str(tmp_path)


def test_default_split():
    train, test = default_replica_split(900, 5)
    assert len(train) == 180
    assert train[:3] == [0, 5, 10]
    assert test[:3] == [2, 7, 12]
    assert set(train).isdisjoint(test)


def test_load_replica(replica_dir):
    data = load_replica(replica_dir, train_ids=[0, 2, 4, 6], test_ids=[1, 3])
    assert data.train_num == 4 and data.test_num == 2
    assert data.train_samples["image"].shape == (4, 12, 16, 3)
    # depth converted mm -> m
    assert data.train_samples["depth"].max() <= 5.0
    # remap: labels dense in [0, C)
    remap = data.train_samples["semantic_remap"]
    assert remap.min() >= 0 and remap.max() < data.num_semantic_class
    # void (0) stays class 0
    assert 0 in data.semantic_classes
    assert data.semantic_classes[0] == 0
    # pose from traj row
    np.testing.assert_allclose(data.train_samples["T_wc"][1][0, 3], 0.2, rtol=1e-5)
    # resize path
    data_s = load_replica(
        replica_dir, train_ids=[0], test_ids=[1], img_h=6, img_w=8
    )
    assert data_s.train_samples["image"].shape == (1, 6, 8, 3)


def test_degradation_sparse(replica_dir):
    data = load_replica(replica_dir, train_ids=list(range(8)), test_ids=[1])
    ids = degradations.sample_label_maps(data, sparse_ratio=0.5)
    assert data.mask_ids.sum() == len(ids) == 4


def test_degradation_pixel_noise(replica_dir):
    data = load_replica(replica_dir, train_ids=[0, 2], test_ids=[1])
    clean = data.train_samples["semantic_remap_clean"].copy()
    degradations.add_pixel_wise_noise_label(data, noise_ratio=0.5)
    noisy = data.train_samples["semantic_remap"]
    valid = clean > 0
    changed = (noisy != clean) & valid
    frac = changed.sum() / valid.sum()
    assert 0.4 < frac < 0.6
    # flips always land on a different valid class
    assert np.all(noisy[changed] > 0)
    assert np.all(noisy[changed] < data.num_semantic_class)
    # void pixels untouched
    assert np.all(noisy[~valid] == clean[~valid])


def test_degradation_super_resolve(replica_dir):
    data = load_replica(replica_dir, train_ids=[0], test_ids=[1])
    degradations.super_resolve_label(data, down_scale_factor=4)
    sem = data.train_samples["semantic_remap"]
    # blocks of 4x4 are constant
    assert np.all(sem[0, :4, :4] == sem[0, 0, 0])


def test_degradation_click_partial(replica_dir):
    data = load_replica(replica_dir, train_ids=[0], test_ids=[1])
    before_nonvoid = (data.train_samples["semantic_remap"] > 0).sum()
    degradations.simulate_user_click_partial(data, perc=0.01)
    after_nonvoid = (data.train_samples["semantic_remap"] > 0).sum()
    assert 0 < after_nonvoid < before_nonvoid


def test_scannet_nyu13_reduction():
    from intrinsicnerf_tpu.data.scannet import NYU40_TO_NYU13

    assert NYU40_TO_NYU13.shape == (41,)
    assert NYU40_TO_NYU13[0] == 0  # void maps to void
    assert NYU40_TO_NYU13.max() <= 13


def test_dv_intrinsics_parse(tmp_path):
    from intrinsicnerf_tpu.data.deepvoxels import parse_dv_intrinsics

    f = tmp_path / "intrinsics.txt"
    f.write_text("525.0 256.0 256.0\n0 0 0\n0.8\n1.0\n512 512\n0\n")
    focal, cx, cy, near = parse_dv_intrinsics(str(f), 512)
    assert focal == 525.0 and cx == 256.0 and cy == 256.0 and near == 0.8
    # rescaling to a different target sidelength
    focal2, cx2, _, _ = parse_dv_intrinsics(str(f), 256)
    assert focal2 == 262.5 and cx2 == 128.0


def test_load_linemod(tmp_path, rng):
    import json

    from intrinsicnerf_tpu.data.deepvoxels import load_linemod_data

    h = w = 8
    for split, n in (("train", 2), ("val", 1), ("test", 1)):
        frames = []
        for i in range(n):
            name = f"{split}_{i}.png"
            img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
            _write_png(str(tmp_path / "frames" / name), img)
            frames.append(
                {
                    "file_path": f"frames/{name}",
                    "transform_matrix": np.eye(4).tolist(),
                    "intrinsic_matrix": [[50.0, 0, 4], [0, 50.0, 4], [0, 0, 1]],
                }
            )
        (tmp_path / f"transforms_{split}.json").write_text(
            json.dumps({"frames": frames})
        )
    data = load_linemod_data(str(tmp_path))
    assert data.images.shape == (4, 8, 8, 4)  # alpha synthesized
    assert data.focal == 50.0
    assert [len(s) for s in data.i_split] == [2, 1, 1]


def test_load_replica_nyu_cnn(tmp_path, rng):
    from intrinsicnerf_tpu.data.replica_nyu import load_replica_nyu_cnn

    h, w, n = 8, 10, 4
    traj = []
    for i in range(n):
        rgb = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        depth = rng.integers(500, 5000, size=(h, w)).astype(np.uint16)
        cnn = rng.integers(0, 5, size=(h, w)).astype(np.uint8)
        gt = rng.integers(0, 5, size=(h, w)).astype(np.uint8)
        _write_png(str(tmp_path / "rgb" / f"rgb_{i}.png"), rgb)
        _write_png(str(tmp_path / "depth" / f"depth_{i}.png"), depth)
        _write_png(
            str(tmp_path / "CNN_semantic_class_nyu13" / f"semantic_class_{i}.png"),
            cnn,
        )
        _write_png(
            str(tmp_path / "semantic_class_nyu13_remap" / f"semantic_class_{i}.png"),
            gt,
        )
        traj.append(np.eye(4).reshape(-1))
    np.savetxt(str(tmp_path / "traj_w_c.txt"), np.stack(traj), delimiter=" ")

    data = load_replica_nyu_cnn(
        str(tmp_path), train_ids=[0, 2], test_ids=[1], nyu_mode="nyu13"
    )
    # trains on CNN labels, keeps GT for eval
    np.testing.assert_array_equal(
        data.train_samples["semantic_remap"], data.train_samples["cnn_semantic"]
    )
    np.testing.assert_array_equal(
        data.test_samples["semantic_remap_clean"], data.test_samples["gt_semantic"]
    )
    assert data.num_semantic_class >= 1
