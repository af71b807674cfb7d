"""Flat-kernel mean-shift clustering with bin seeding (host-side numpy).

Behavioral parity target: the reference's use of sklearn
``estimate_bandwidth`` + ``MeanShift(bin_seeding=True)``
(``/root/reference/SSR/training/cluster.py:138-152``).  This is our own
from-scratch vectorized implementation (no sklearn dependency in the
framework; tests compare against sklearn where it happens to be
installed).

The clustering runs on the host at the 10k-step cadence, off the
training critical path (SURVEY.md §7 stage 4); the per-step *assignment*
is the jitted ``cluster.assign`` op.  Seeds iterate as one vectorized
block (``[S, N]`` distance tiles, batched over seeds) instead of
sklearn's per-seed loops.
"""

from __future__ import annotations

import numpy as np


def _native_or_none():
    """The C++ OpenMP kernels, or None when the toolchain can't build
    them.  Only the *availability probe* is exception-guarded — once a
    kernel is deemed available, bugs in it (or in result postprocessing)
    must surface, not silently fall back to numpy."""
    try:
        from intrinsicnerf_tpu import native

        if native.native_available():
            return native
    except Exception as e:  # pragma: no cover - toolchain-dependent
        print(f"[cluster] native kernels unavailable ({e}); using numpy")
    return None


_NATIVE = _native_or_none()


def estimate_bandwidth(
    x: np.ndarray,
    quantile: float = 0.3,
    n_samples: int | None = 5000,
    seed: int = 0,
) -> float:
    """Mean distance to the ``int(n*quantile)``-th nearest neighbor
    (self included), over a random subsample — sklearn semantics."""
    x = np.asarray(x, dtype=np.float64)
    if n_samples is not None and x.shape[0] > n_samples:
        idx = np.random.RandomState(seed).permutation(x.shape[0])[:n_samples]
        x = x[idx]
    n = x.shape[0]
    k = max(1, int(n * quantile))

    if _NATIVE is not None:  # OpenMP C++ kernel when the toolchain built it
        return _NATIVE.estimate_bandwidth_kth(x, k)

    # numpy fallback: pairwise distances in blocks to bound memory.
    # partition the SQUARED distances (monotone) and sqrt only the
    # k-th order statistic — no full-matrix sqrt, no k-column copy.
    block = 1024
    x2 = np.sum(x**2, axis=1)
    total = 0.0
    for s in range(0, n, block):
        d2 = (
            x2[s : s + block, None]
            + x2[None, :]
            - 2.0 * x[s : s + block] @ x.T
        )
        np.maximum(d2, 0.0, out=d2)
        # distance to the k-th nearest (k neighbors including self)
        kth = np.partition(d2, k - 1, axis=1)[:, k - 1]
        total += np.sqrt(kth).sum()
    return float(total / n)


def _bin_seeds(x: np.ndarray, bin_size: float, min_bin_freq: int = 1) -> np.ndarray:
    """Seed points = centers of occupied grid bins of side ``bin_size``."""
    binned = np.round(x / bin_size)
    uniq, counts = np.unique(binned, axis=0, return_counts=True)
    seeds = uniq[counts >= min_bin_freq] * bin_size
    if len(seeds) == len(x):
        return x
    return seeds


def mean_shift(
    x: np.ndarray,
    bandwidth: float,
    bin_seeding: bool = True,
    max_iter: int = 300,
    point_block: int = 262144,
):
    """Cluster ``x [N, D]``; returns ``(cluster_centers [K, D], labels [N])``.

    All seeds advance together; each iteration computes seed->point
    distances in blocks over N.  Converged when every seed moves less
    than ``bandwidth * 1e-3``.  Post-processing (sklearn-compatible):
    seeds with no within-bandwidth support are dropped, near-duplicate
    centers (within one bandwidth) are merged keeping the
    higher-support one, and labels are by nearest surviving center.
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if n == 0:
        raise ValueError("mean_shift called with no points")
    seeds = _bin_seeds(x, bandwidth) if bin_seeding else x.copy()
    bw2 = bandwidth * bandwidth

    # native C++ kernel (OpenMP over seeds) when the toolchain built it;
    # identical flat-kernel update, per-seed convergence like sklearn
    if _NATIVE is not None:
        centers, support = _NATIVE.meanshift_iterate(
            x, seeds.astype(np.float64), bandwidth, max_iter
        )
        return _postprocess(x, centers, support, bw2, point_block)

    centers = seeds.astype(np.float64).copy()
    active = np.ones(len(centers), dtype=bool)
    stop_thresh = 1e-3 * bandwidth

    x2 = np.sum(x**2, axis=1)
    for _ in range(max_iter):
        if not active.any():
            break
        cur = centers[active]
        new = np.zeros_like(cur)
        cnt = np.zeros(len(cur), dtype=np.int64)
        for s in range(0, n, point_block):
            xb = x[s : s + point_block]
            d2 = (
                np.sum(cur**2, axis=1)[:, None]
                + x2[s : s + point_block][None, :]
                - 2.0 * cur @ xb.T
            )
            within = d2 <= bw2
            new += within @ xb
            cnt += within.sum(axis=1)
        nonzero = cnt > 0
        new[nonzero] /= cnt[nonzero, None]
        new[~nonzero] = cur[~nonzero]
        shift = np.linalg.norm(new - cur, axis=1)
        centers[active] = new
        still = shift >= stop_thresh
        idx_active = np.flatnonzero(active)
        active[idx_active[~still]] = False

    # support count per final center
    support = np.zeros(len(centers), dtype=np.int64)
    for s in range(0, n, point_block):
        xb = x[s : s + point_block]
        d2 = (
            np.sum(centers**2, axis=1)[:, None]
            + x2[s : s + point_block][None, :]
            - 2.0 * centers @ xb.T
        )
        support += (d2 <= bw2).sum(axis=1)
    return _postprocess(x, centers, support, bw2, point_block)


def _postprocess(x, centers, support, bw2, point_block):
    """Drop no-support seeds, merge near-duplicate centers (highest
    support wins), label every point by its nearest surviving center."""
    n = x.shape[0]
    keep = support > 0
    centers, support = centers[keep], support[keep]
    if len(centers) == 0:  # pathological tiny bandwidth: every point its own
        centers = x[:1].copy()
        support = np.array([n])

    order = np.argsort(-support, kind="stable")
    centers = centers[order]
    alive = np.ones(len(centers), dtype=bool)
    for i in range(len(centers)):
        if not alive[i]:
            continue
        d2 = np.sum((centers - centers[i]) ** 2, axis=1)
        dup = d2 < bw2
        dup[: i + 1] = False
        alive &= ~dup
    centers = centers[alive]

    # label all points by nearest center
    labels = np.empty(n, dtype=np.int64)
    for s in range(0, n, point_block):
        xb = x[s : s + point_block]
        d2 = (
            np.sum(centers**2, axis=1)[None, :]
            + np.sum(xb**2, axis=1)[:, None]
            - 2.0 * xb @ centers.T
        )
        labels[s : s + point_block] = np.argmin(d2, axis=1)
    return centers.astype(np.float32), labels
