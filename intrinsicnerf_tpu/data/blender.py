"""Blender synthetic dataset loaders (object-level pipeline).

Behavioral parity targets:
- ``load_blender_data`` (``/root/reference/object_level/load_blender.py``):
  transforms_{train,val,test}.json with RGBA frames; focal from
  camera_angle_x; 40-pose spherical render path.
- ``load_blender_intrinsic_data``
  (``/root/reference/object_level/load_blender_intrinsic.py``): frames
  under ``{split}/color/<name>.png`` with GT albedo companions at
  ``{split}/albedo/<name>_albedo_0001.png``; 80-pose spherical path.

The alpha channel doubles as the object mask used for intrinsic-loss
pair weighting (``run_nerf.py:703,893-894``).  White-background
compositing (``rgb*a + (1-a)``) is applied by the caller per config.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np


def _rot_x(phi):
    c, s = np.cos(phi), np.sin(phi)
    return np.array(
        [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], np.float32
    )


def _rot_y(th):
    c, s = np.cos(th), np.sin(th)
    return np.array(
        [[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]], np.float32
    )


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Camera-to-world on a sphere looking at the origin (blender/opengl
    convention), matching the reference's render-path poses."""
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = radius
    c2w = _rot_x(phi_deg / 180.0 * np.pi) @ c2w
    c2w = _rot_y(theta_deg / 180.0 * np.pi) @ c2w
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float32
    )
    return flip @ c2w


def spherical_render_poses(n: int = 40, phi: float = -30.0, radius: float = 4.0):
    return np.stack(
        [
            pose_spherical(angle, phi, radius)
            for angle in np.linspace(-180, 180, n + 1)[:-1]
        ]
    )


@dataclass
class BlenderData:
    images: np.ndarray  # [N, H, W, 4] float RGBA in [0,1]
    poses: np.ndarray  # [N, 4, 4]
    render_poses: np.ndarray  # [M, 4, 4]
    h: int
    w: int
    focal: float
    i_split: List[np.ndarray]  # train/val/test index arrays
    albedo_images: Optional[np.ndarray] = None  # [N, H, W, 4] GT albedo


def _imread(path):
    import imageio.v2 as imageio

    return imageio.imread(path)


def _resize_half(imgs):
    import cv2

    n, h, w, c = imgs.shape
    out = np.zeros((n, h // 2, w // 2, c), imgs.dtype)
    for i, img in enumerate(imgs):
        out[i] = cv2.resize(img, (w // 2, h // 2), interpolation=cv2.INTER_AREA)
    return out


def load_blender_data(
    basedir: str, half_res: bool = False, testskip: int = 1
) -> BlenderData:
    splits = ["train", "val", "test"]
    metas = {
        s: json.load(open(os.path.join(basedir, f"transforms_{s}.json")))
        for s in splits
    }
    all_imgs, all_poses, counts = [], [], [0]
    for s in splits:
        meta = metas[s]
        skip = 1 if s == "train" or testskip == 0 else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            imgs.append(_imread(os.path.join(basedir, frame["file_path"] + ".png")))
            poses.append(np.asarray(frame["transform_matrix"], np.float32))
        all_imgs.append((np.asarray(imgs) / 255.0).astype(np.float32))
        all_poses.append(np.asarray(poses))
        counts.append(counts[-1] + len(imgs))

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    images = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)
    h, w = images.shape[1:3]
    focal = 0.5 * w / np.tan(0.5 * float(metas["train"]["camera_angle_x"]))
    if half_res:
        images = _resize_half(images)
        h, w, focal = h // 2, w // 2, focal / 2.0
    return BlenderData(
        images=images,
        poses=poses,
        render_poses=spherical_render_poses(40),
        h=h,
        w=w,
        focal=focal,
        i_split=i_split,
    )


def load_blender_intrinsic_data(
    basedir: str, half_res: bool = False, testskip: int = 1
) -> BlenderData:
    """rgb + GT-albedo pairs laid out as ``{split}/color`` and
    ``{split}/albedo`` (blender_intrinsic layout)."""
    splits = ["train", "val", "test"]
    metas = {
        s: json.load(open(os.path.join(basedir, f"transforms_{s}.json")))
        for s in splits
    }
    all_imgs, all_albedo, all_poses, counts = [], [], [], [0]
    for s in splits:
        meta = metas[s]
        skip = 1 if s == "train" or testskip == 0 else testskip
        imgs, albedos, poses = [], [], []
        for frame in meta["frames"][::skip]:
            name = os.path.basename(frame["file_path"])
            imgs.append(_imread(os.path.join(basedir, s, "color", name + ".png")))
            albedos.append(
                _imread(
                    os.path.join(basedir, s, "albedo", name + "_albedo_0001.png")
                )
            )
            poses.append(np.asarray(frame["transform_matrix"], np.float32))
        all_imgs.append((np.asarray(imgs) / 255.0).astype(np.float32))
        all_albedo.append((np.asarray(albedos) / 255.0).astype(np.float32))
        all_poses.append(np.asarray(poses))
        counts.append(counts[-1] + len(imgs))

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    images = np.concatenate(all_imgs, 0)
    albedo_images = np.concatenate(all_albedo, 0)
    poses = np.concatenate(all_poses, 0)
    h, w = images.shape[1:3]
    focal = 0.5 * w / np.tan(0.5 * float(metas["train"]["camera_angle_x"]))
    if half_res:
        images = _resize_half(images)
        albedo_images = _resize_half(albedo_images)
        h, w, focal = h // 2, w // 2, focal / 2.0
    return BlenderData(
        images=images,
        poses=poses,
        render_poses=spherical_render_poses(80),
        h=h,
        w=w,
        focal=focal,
        i_split=i_split,
        albedo_images=albedo_images,
    )


def composite_white_background(images_rgba: np.ndarray) -> np.ndarray:
    """``rgb*a + (1-a)`` (run_nerf.py:699-711)."""
    rgb, a = images_rgba[..., :3], images_rgba[..., 3:4]
    return rgb * a + (1.0 - a)
