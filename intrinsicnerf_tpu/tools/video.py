"""Video writing utilities + batch PNG->mp4 conversion.

Behavioral parity target: ``/root/reference/video_generator.py``:
convert directories of rendered frames (rgb / decomposition / cluster /
edit modalities) into mp4s.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Iterable, List

import numpy as np


def write_video(path: str, frames: Iterable[np.ndarray], fps: int = 30):
    """mp4 from RGB uint8 frames (cv2 backend, imageio fallback)."""
    frames = [
        np.repeat(f[..., None], 3, axis=-1) if f.ndim == 2 else f[..., :3]
        for f in frames
    ]
    if not frames:
        raise ValueError("no frames to write")
    h, w = frames[0].shape[:2]
    try:
        import cv2

        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        if not writer.isOpened():
            raise RuntimeError("cv2.VideoWriter failed to open")
        for f in frames:
            writer.write(np.ascontiguousarray(f[..., ::-1]))  # RGB -> BGR
        writer.release()
    except Exception:
        import imageio.v2 as imageio

        imageio.mimwrite(path, frames, fps=fps)
    return path


def frames_matching(img_dir: str, prefix: str) -> List[str]:
    """Sorted frame files ``{prefix}{number}.png`` (reference naming:
    ``rgb_000.png``, ``c000.png``, ``edit000.png``...)."""
    pat = re.compile(rf"^{re.escape(prefix)}_?(\d+)\.png$")
    out = []
    for f in glob.glob(os.path.join(img_dir, "*.png")):
        m = pat.match(os.path.basename(f))
        if m:
            out.append((int(m.group(1)), f))
    return [f for _, f in sorted(out)]


def pngs_to_video(img_dir: str, prefix: str, out_path: str, fps: int = 30):
    import imageio.v2 as imageio

    files = frames_matching(img_dir, prefix)
    if not files:
        raise FileNotFoundError(f"no '{prefix}*' frames in {img_dir}")
    frames = [np.asarray(imageio.imread(f)) for f in files]
    return write_video(out_path, frames, fps)


def generate_all(img_dir: str, out_dir: str | None = None, fps: int = 30):
    """Batch-convert every modality present in a render directory
    (video_generator.py behavior)."""
    out_dir = out_dir or img_dir
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for prefix in ("rgb", "albedo", "shading", "residual", "vis_depth",
                   "vis_label", "c", "edit"):
        try:
            out = os.path.join(out_dir, f"{prefix}.mp4")
            pngs_to_video(img_dir, prefix, out, fps)
            written.append(out)
        except FileNotFoundError:
            continue
    return written
