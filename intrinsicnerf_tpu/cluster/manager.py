"""Reflectance cluster construction and persistence (host side).

Behavioral parity target: ``Cluster`` / ``Cluster_Manager``
(``/root/reference/SSR/training/cluster.py``):

- per-semantic-class clustering of rendered-albedo pixels in the
  ``d_rgb = [I/3*0.5, g/I, b/I]`` space; bandwidth =
  ``max(estimate_bandwidth(q=0.3, n=5000) * band_factor, 0.01)``;
  flat-kernel mean-shift with bin seeding.
- anchor table: 100^3 voxel filter at leaf 0.01 — one representative
  pixel per occupied voxel, nearest-to-voxel-center wins (the
  reference scatters in descending-distance order so the last = nearest
  write survives; we replicate exactly with numpy fancy assignment).
- JSON persistence byte-layout compatible with the reference
  (``clusters.json`` + per-class ``c{i}/config.json`` with
  batch_size / intensity_factor / rgb_centers / anchors / links, plus
  50x50 color swatch PNGs) so the editing GUI interoperates.

The jitted assignment path lives in ``cluster.assign``; this module
only runs at the 10k-step cluster-rebuild cadence.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional

import numpy as np

from intrinsicnerf_tpu.cluster.meanshift import estimate_bandwidth, mean_shift
from intrinsicnerf_tpu.cluster.assign import ClusterTable, table_from_numpy

LEAF_SIZE = 0.01
GRID = int(1 / LEAF_SIZE)


def map_drgb_np(rgb: np.ndarray, intensity_factor: float = 0.5) -> np.ndarray:
    intensity = rgb.sum(-1)
    out = np.empty_like(rgb)
    out[..., 0] = intensity / 3.0 * intensity_factor
    # masked divide: zero-intensity pixels (empty rays) map to NaN
    # explicitly so build_cluster's finite-filter drops them, without the
    # 0/0 RuntimeWarning the plain divide emits
    pos = intensity > 0
    safe = np.where(pos, intensity, 1.0)
    out[..., 1] = np.where(pos, rgb[..., 1] / safe, np.nan)
    out[..., 2] = np.where(pos, rgb[..., 2] / safe, np.nan)
    return out


def inv_map_drgb_np(d: np.ndarray, intensity_factor: float = 0.5) -> np.ndarray:
    intensity = d[..., 0] * 3.0 / intensity_factor
    out = np.empty_like(d)
    out[..., 1] = d[..., 1] * intensity
    out[..., 2] = d[..., 2] * intensity
    out[..., 0] = intensity - out[..., 1] - out[..., 2]
    return out


def voxel_anchor_filter(pixels_drgb: np.ndarray, labels: np.ndarray):
    """One representative pixel + cluster label per occupied 0.01 voxel;
    the pixel nearest its voxel center wins."""
    ids = np.clip((pixels_drgb / LEAF_SIZE).astype(np.int64), 0, GRID - 1)
    centers = ids * LEAF_SIZE + LEAF_SIZE / 2
    dist = np.sum((centers - pixels_drgb) ** 2, axis=1)
    order = np.argsort(-dist, kind="stable")  # descending: nearest written last
    flat = (ids[order, 0] * GRID + ids[order, 1]) * GRID + ids[order, 2]
    vox_pix = np.zeros((GRID**3, 3), np.float32)
    vox_lab = np.full((GRID**3,), -1, np.int64)
    vox_pix[flat] = pixels_drgb[order]
    vox_lab[flat] = labels[order]
    occupied = vox_lab >= 0
    return vox_pix[occupied], vox_lab[occupied]


@dataclasses.dataclass
class Cluster:
    """Per-class cluster state: voxel anchors (d_rgb) -> cluster id -> color."""

    anchors: np.ndarray  # [A, 3] d_rgb
    links: np.ndarray  # [A] cluster id per anchor
    rgb_centers: np.ndarray  # [K, 3] rgb color per cluster
    intensity_factor: float = 0.5
    batch_size: int = 10240  # kept for config-file compatibility

    def save(self, cluster_dir: str):
        os.makedirs(cluster_dir, exist_ok=True)
        data = {
            "batch_size": self.batch_size,
            "intensity_factor": self.intensity_factor,
            "rgb_centers": np.asarray(self.rgb_centers, np.float64).tolist(),
            "anchors": np.asarray(self.anchors, np.float64).tolist(),
            "links": np.asarray(self.links, np.float64).reshape(-1, 1).tolist(),
        }
        with open(os.path.join(cluster_dir, "config.json"), "w") as f:
            json.dump(data, f)
        self._write_swatches(cluster_dir)

    def _write_swatches(self, cluster_dir: str):
        try:
            import imageio.v2 as imageio
        except ImportError:  # pragma: no cover
            return
        for i, color in enumerate(np.asarray(self.rgb_centers)):
            img = (np.clip(color, 0, 1) * np.ones((50, 50, 3)) * 255).astype(np.uint8)
            imageio.imwrite(os.path.join(cluster_dir, f"{i}.png"), img)

    @classmethod
    def load(cls, cluster_dir: str) -> "Cluster":
        with open(os.path.join(cluster_dir, "config.json")) as f:
            data = json.load(f)
        return cls(
            anchors=np.asarray(data["anchors"], np.float32),
            links=np.asarray(data["links"], np.int64).reshape(-1),
            rgb_centers=np.asarray(data["rgb_centers"], np.float32),
            intensity_factor=float(data["intensity_factor"]),
            batch_size=int(data["batch_size"]),
        )


def build_cluster(
    pixels_rgb: np.ndarray,
    quantile: float = 0.3,
    n_samples: int = 5000,
    band_factor: float = 0.5,
    intensity_factor: float = 0.5,
) -> Cluster:
    """Cluster one class's albedo pixels; returns anchors/links/centers.

    Pixels whose d_rgb is non-finite are dropped: an all-zero albedo
    (empty ray, acc == 0) maps to 0/0 in the chroma division — the same
    hazard as the reference's ``mapping_color`` — and a single NaN
    anchor would poison ``dest_color`` targets and with them the whole
    training run."""
    d = map_drgb_np(np.asarray(pixels_rgb, np.float64), intensity_factor)
    finite = np.isfinite(d).all(axis=1)
    if not finite.all():
        d = d[finite]
    if len(d) == 0:  # every pixel empty: one black pseudo-cluster
        d = np.zeros((1, 3), np.float64)
    bw = estimate_bandwidth(d, quantile=quantile, n_samples=n_samples)
    bw = max(bw * band_factor, 0.01)
    centers_d, labels = mean_shift(d, bw, bin_seeding=True)
    anchors, links = voxel_anchor_filter(d.astype(np.float32), labels)
    rgb_centers = np.clip(
        inv_map_drgb_np(centers_d.astype(np.float32), intensity_factor), 0, 1
    )
    return Cluster(
        anchors=anchors,
        links=links,
        rgb_centers=rgb_centers,
        intensity_factor=intensity_factor,
    )


class ClusterManager:
    """One ``Cluster`` per semantic class (or a single class for the
    object pipeline / ``no_semantic_tree``)."""

    def __init__(self, class_num: int = 0, clusters: Optional[List] = None):
        self.class_num = class_num
        self.clusters: List[Optional[Cluster]] = (
            clusters if clusters is not None else []
        )

    def update_centers(
        self,
        labels: np.ndarray,
        pixels: np.ndarray,
        quantile: float = 0.3,
        n_samples: int = 5000,
        band_factor: float = 0.5,
    ):
        """Rebuild every class's clusters from rendered albedo samples."""
        pixels = np.asarray(pixels).reshape(-1, 3)
        labels = np.asarray(labels).reshape(-1)
        self.clusters = []
        if self.class_num == 1:
            self.clusters.append(
                build_cluster(pixels, quantile, n_samples, band_factor)
            )
            return
        for i in range(self.class_num):
            class_pixels = pixels[labels == i]
            if len(class_pixels) == 0:
                self.clusters.append(None)
                continue
            self.clusters.append(
                build_cluster(class_pixels, quantile, n_samples, band_factor)
            )

    def to_table(self, anchors_per_class: int = 2048) -> ClusterTable:
        per_class = [
            None if c is None else (c.anchors, c.links, c.rgb_centers)
            for c in self.clusters
        ]
        f = next(
            (c.intensity_factor for c in self.clusters if c is not None), 0.5
        )
        return table_from_numpy(per_class, anchors_per_class, f)

    def save(self, manager_dir: str):
        os.makedirs(manager_dir, exist_ok=True)
        cluster_dirs = []
        for i, c in enumerate(self.clusters):
            if c is None:
                cluster_dirs.append(None)
            else:
                d = os.path.join(manager_dir, f"c{i}")
                c.save(d)
                cluster_dirs.append(d)
        with open(os.path.join(manager_dir, "clusters.json"), "w") as f:
            json.dump({"class_num": self.class_num, "cluster_dirs": cluster_dirs}, f)

    @classmethod
    def load(cls, manager_dir: str) -> "ClusterManager":
        with open(os.path.join(manager_dir, "clusters.json")) as f:
            data = json.load(f)
        mgr = cls(class_num=data["class_num"])
        for i, d in enumerate(data["cluster_dirs"]):
            if d is None:
                mgr.clusters.append(None)
            else:
                mgr.clusters.append(
                    Cluster.load(os.path.join(manager_dir, f"c{i}"))
                )
        return mgr
