"""Tests for the editing core, video tooling, and mesh extraction
pipeline pieces."""

import os

import numpy as np
import jax
import pytest

from intrinsicnerf_tpu.cluster.manager import ClusterManager, build_cluster
from intrinsicnerf_tpu.tools.editing import EditSession
from intrinsicnerf_tpu.tools.video import frames_matching, pngs_to_video, write_video


def _imsave(path, arr):
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path), exist_ok=True)
    imageio.imwrite(path, arr)


@pytest.fixture
def render_dir(tmp_path, rng):
    """Fake render dir: two frames of decompositions + a 2-class cluster
    palette."""
    h = w = 16
    d = tmp_path / "render"
    d.mkdir()
    # two-tone albedo: left red-ish, right blue-ish
    albedo = np.zeros((h, w, 3), np.float32)
    albedo[:, : w // 2] = [0.7, 0.2, 0.2]
    albedo[:, w // 2 :] = [0.2, 0.3, 0.7]
    label = np.zeros((h, w), np.uint8)
    label[:, w // 2 :] = 1
    for i in range(2):
        _imsave(str(d / f"albedo_{i:03d}.png"), (albedo * 255).astype(np.uint8))
        _imsave(
            str(d / f"shading_{i:03d}.png"),
            np.full((h, w), 128, np.uint8),
        )
        _imsave(str(d / f"residual_{i:03d}.png"), np.zeros((h, w, 3), np.uint8))
        _imsave(str(d / f"label_{i:03d}.png"), label)

    mgr = ClusterManager(class_num=2)
    pixels = albedo.reshape(-1, 3)
    labels = label.reshape(-1)
    mgr.update_centers(labels, pixels, band_factor=1.0)
    mgr.save(str(d / "cluster"))
    return d


def test_edit_session_pick_and_recolor(render_dir):
    s = EditSession(str(render_dir), str(render_dir / "cluster"))
    assert s.frame_ids() == [0, 1]
    sem_l, cid_l = s.pick(0, 8, 2)  # left half
    sem_r, cid_r = s.pick(0, 8, 13)  # right half
    assert sem_l == 0 and sem_r == 1

    base = s.compose(0)
    assert base.shape == (16, 16, 3)
    # shading 0.5, residual 0 -> edit ~ albedo/2 (quantized to palette)
    np.testing.assert_allclose(base[8, 2], [0.35, 0.1, 0.1], atol=0.06)

    # recolor the left cluster to green
    s.set_cluster_color(sem_l, cid_l, [0.0, 1.0, 0.0])
    edited = s.compose(0)
    np.testing.assert_allclose(edited[8, 2], [0.0, 0.5, 0.0], atol=0.06)
    # right half untouched
    np.testing.assert_allclose(edited[8, 13], base[8, 13], atol=1e-5)

    # reset restores
    s.reset_palette()
    np.testing.assert_allclose(s.compose(0), base, atol=1e-6)


def test_edit_session_scales(render_dir):
    s = EditSession(str(render_dir), str(render_dir / "cluster"))
    s.shading_scale = 2.0
    bright = s.compose(0)
    s.shading_scale = 1.0
    base = s.compose(0)
    assert bright.mean() > base.mean() * 1.5
    s.shading_gamma = 2.0  # shading 0.5 -> 0.25
    dim = s.compose(0)
    assert dim.mean() < base.mean()


def test_edit_session_save(render_dir, tmp_path):
    s = EditSession(str(render_dir), str(render_dir / "cluster"))
    sem, cid = s.pick(0, 8, 2)
    s.set_cluster_color(sem, cid, [0.1, 0.9, 0.1])
    out = str(tmp_path / "edit.png")
    s.save_edit(0, out)
    assert os.path.exists(out)
    # palette roundtrip keeps the edit
    s.save_palette(str(tmp_path / "pal"))
    s2 = EditSession(str(render_dir), str(tmp_path / "pal"))
    c = s2.get_cluster_color(sem, cid)
    np.testing.assert_allclose(c, [0.1, 0.9, 0.1], atol=1e-5)


def test_video_tools(tmp_path, rng):
    d = tmp_path / "frames"
    d.mkdir()
    for i in range(5):
        _imsave(
            str(d / f"rgb_{i:03d}.png"),
            rng.integers(0, 255, (16, 16, 3)).astype(np.uint8),
        )
    _imsave(str(d / f"c{0:03d}.png"), np.zeros((16, 16, 3), np.uint8))
    files = frames_matching(str(d), "rgb")
    assert len(files) == 5
    assert frames_matching(str(d), "c") and len(frames_matching(str(d), "c")) == 1
    out = str(tmp_path / "v.mp4")
    pngs_to_video(str(d), "rgb", out, fps=5)
    assert os.path.getsize(out) > 0
    with pytest.raises(FileNotFoundError):
        pngs_to_video(str(d), "nope", out)


def test_mesh_extraction_pipeline(tmp_path):
    """Full extract on a hand-crafted density field: a trainer stub whose
    fine MLP is replaced by a sphere density via monkeypatched query."""
    from intrinsicnerf_tpu.geometry import mesh as gm

    # query_density_grid on a real (random-init) tiny MLP: shapes + ranges
    from intrinsicnerf_tpu.models.mlp import MLPConfig, init_mlp_params

    mcfg = MLPConfig(depth=3, width=32, skips=(1,), n_freqs_pos=4, n_freqs_dir=2)
    params = init_mlp_params(jax.random.key(0), mcfg)
    pts = np.random.default_rng(0).uniform(-1, 1, (1000, 3)).astype(np.float32)
    occ, sem = gm.query_density_grid(params, mcfg, pts, voxel_size=0.05, chunk=512)
    assert occ.shape == (1000,) and sem.shape == (1000,)
    assert np.all(occ >= 0) and np.all(occ <= 1)


def test_video_grayscale_frames(tmp_path, rng):
    """Single-channel modalities (shading/disp/entropy) must convert to
    3-channel before encoding (regression: cv2 writeFrame channel
    mismatch)."""
    d = tmp_path / "gray"
    d.mkdir()
    for i in range(3):
        _imsave(
            str(d / f"shading_{i:03d}.png"),
            rng.integers(0, 255, (16, 16)).astype(np.uint8),
        )
    out = str(tmp_path / "g.mp4")
    pngs_to_video(str(d), "shading", out, fps=5)
    assert os.path.getsize(out) > 0
