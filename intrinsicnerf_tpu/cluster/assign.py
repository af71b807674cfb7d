"""Jitted reflectance-cluster assignment over padded anchor tables.

Behavioral parity target: ``Cluster.dest_color`` / ``dest_class`` and
the chroma/intensity color mapping
(``/root/reference/SSR/training/cluster.py:275-341``): map rgb to
``d_rgb = [I/3 * intensity_factor, g/I, b/I]``, find the nearest voxel
anchor in that space, return the anchor's cluster-center color.

TPU-first design: the reference loops over semantic classes with
boolean gathers and a 10240-pixel python chunk loop — all dynamic
shapes.  Here the per-class anchor sets live in one padded dense table
``[C, A, 3]`` (pads at +1e6 never win the argmin); assignment is a
per-point gather of its class row followed by a batched distance
argmin, fully shape-static under jit and shard-local under the data
mesh (SURVEY.md §7 "hard parts").  Empty classes fall back to the
input color, matching the reference's untouched ``result = rgb.clone()``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

PAD_VALUE = 1.0e6


class ClusterTable(NamedTuple):
    """Device-side padded cluster tables for ``C`` semantic classes."""

    anchors: jnp.ndarray  # [C, A, 3] d_rgb anchors, PAD_VALUE padded
    colors: jnp.ndarray  # [C, A, 3] rgb center color linked to each anchor
    links: jnp.ndarray  # [C, A] int32 cluster id of each anchor (-1 pad)
    has_cluster: jnp.ndarray  # [C] bool — class has any anchors
    intensity_factor: jnp.ndarray  # [] float


def map_drgb(rgb: jnp.ndarray, intensity_factor=0.5) -> jnp.ndarray:
    """rgb -> (intensity/3 * f, g/I, b/I) chroma/intensity space."""
    intensity = jnp.sum(rgb, axis=-1)
    return jnp.stack(
        [
            intensity / 3.0 * intensity_factor,
            rgb[..., 1] / intensity,
            rgb[..., 2] / intensity,
        ],
        axis=-1,
    )


def inv_map_drgb(d_rgb: jnp.ndarray, intensity_factor=0.5) -> jnp.ndarray:
    intensity = d_rgb[..., 0] * 3.0 / intensity_factor
    g = d_rgb[..., 1] * intensity
    b = d_rgb[..., 2] * intensity
    r = intensity - g - b
    return jnp.stack([r, g, b], axis=-1)


def empty_cluster_table(num_classes: int, anchors_per_class: int = 2048):
    """All-pad table: assignment falls back to the input color."""
    c, a = num_classes, anchors_per_class
    return ClusterTable(
        anchors=jnp.full((c, a, 3), PAD_VALUE, jnp.float32),
        colors=jnp.zeros((c, a, 3), jnp.float32),
        links=jnp.full((c, a), -1, jnp.int32),
        has_cluster=jnp.zeros((c,), bool),
        intensity_factor=jnp.float32(0.5),
    )


def _nearest_anchor_idx(table: ClusterTable, rgb, label):
    d = map_drgb(rgb, table.intensity_factor)  # [N, 3]
    label = jnp.clip(label.astype(jnp.int32).reshape(-1), 0, table.anchors.shape[0] - 1)
    anchors = table.anchors[label]  # [N, A, 3] per-point class table
    # ||d - a||^2 up to the constant |d|^2: argmin over |a|^2 - 2 d.a
    score = jnp.sum(anchors * anchors, axis=-1) - 2.0 * jnp.einsum(
        "nd,nad->na", d, anchors
    )
    return jnp.argmin(score, axis=-1), label  # [N]


def dest_color(table: ClusterTable, rgb: jnp.ndarray, label: jnp.ndarray):
    """Map each rgb to its cluster-center color (input color if the
    point's class has no clusters).  rgb ``[N, 3]``, label ``[N]``.

    The winner's color is fetched with one flat ``[N]``-row gather
    (``colors[label * A + idx]``) instead of materializing the whole
    per-point class color table ``[N, A, 3]`` like the anchor scores
    must — half the assignment's gather traffic."""
    idx, label = _nearest_anchor_idx(table, rgb, label)
    a = table.colors.shape[1]
    out = jnp.take(table.colors.reshape(-1, 3), label * a + idx, axis=0)
    ok = table.has_cluster[label]
    return jnp.where(ok[:, None], out, rgb)


def dest_class(table: ClusterTable, rgb: jnp.ndarray, label: jnp.ndarray):
    """Cluster id per pixel (-1 where the class has no clusters)."""
    idx, label = _nearest_anchor_idx(table, rgb, label)
    a = table.links.shape[1]
    link = jnp.take(table.links.reshape(-1), label * a + idx, axis=0)
    return jnp.where(table.has_cluster[label], link, -1)


def dest_color_chunked(table: ClusterTable, rgb, label, chunk: int = 8192):
    """Full-image assignment via lax.map over fixed chunks (pad to a
    multiple of ``chunk`` beforehand)."""
    n = rgb.shape[0]
    pad = (-n) % chunk
    rgb_p = jnp.pad(rgb, ((0, pad), (0, 0)), constant_values=0.5)
    lab_p = jnp.pad(label.reshape(-1), (0, pad))
    rgb_c = rgb_p.reshape(-1, chunk, 3)
    lab_c = lab_p.reshape(-1, chunk)
    out = jax.lax.map(lambda args: dest_color(table, *args), (rgb_c, lab_c))
    return out.reshape(-1, 3)[:n]


def table_from_numpy(
    per_class: list,
    anchors_per_class: int = 2048,
    intensity_factor: float = 0.5,
) -> ClusterTable:
    """Build a padded device table from per-class host data.

    ``per_class[i]`` is ``None`` (class has no clusters) or a tuple
    ``(anchors_drgb [A_i, 3], links [A_i], rgb_centers [K_i, 3])``.
    If a class has more anchors than the pad size, the ``A`` closest-to-
    most-supported are kept (deterministic truncation, logged upstream).
    """
    c = len(per_class)
    a = anchors_per_class
    anchors = np.full((c, a, 3), PAD_VALUE, np.float32)
    colors = np.zeros((c, a, 3), np.float32)
    links = np.full((c, a), -1, np.int32)
    has = np.zeros((c,), bool)
    for i, entry in enumerate(per_class):
        if entry is None:
            continue
        anc, lnk, centers = entry
        anc = np.asarray(anc, np.float32)
        lnk = np.asarray(lnk, np.int64).reshape(-1)
        centers = np.asarray(centers, np.float32)
        if len(anc) > a:
            # keep the anchors nearest their own cluster center (most
            # representative); the reference keeps all anchors, so log
            # the truncation rather than drop silently
            centers_d = np.asarray(
                map_drgb(jnp.asarray(centers), intensity_factor), np.float32
            )
            lnk_safe = np.clip(lnk, 0, len(centers) - 1)
            d = np.linalg.norm(anc - centers_d[lnk_safe], axis=1)
            keep = np.argsort(d, kind="stable")[:a]
            print(
                f"[cluster] class {i}: truncating {len(anc)} anchors to "
                f"{a} (nearest-to-center kept)"
            )
            anc, lnk = anc[keep], lnk[keep]
        m = len(anc)
        anchors[i, :m] = anc
        links[i, :m] = lnk
        colors[i, :m] = centers[np.clip(lnk, 0, len(centers) - 1)]
        has[i] = m > 0
    return ClusterTable(
        anchors=jnp.asarray(anchors),
        colors=jnp.asarray(colors),
        links=jnp.asarray(links),
        has_cluster=jnp.asarray(has),
        intensity_factor=jnp.float32(intensity_factor),
    )
