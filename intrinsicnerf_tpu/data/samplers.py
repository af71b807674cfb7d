"""Neighbor-paired ray/pixel sampling from device-resident pools.

Behavioral parity target: ``sampling_index``
(``/root/reference/SSR/models/rays.py:153-172``) and
``select_neighbor`` (``object_level/run_nerf.py:916-929``): sample one
random training image and ``n_rays`` random pixels (with replacement),
then for each pixel an 8-neighborhood partner (bias in {-1,0,1}^2,
clamped to the frame), concatenated so that ``batch[i]`` and
``batch[i + n_rays]`` are neighbors — the pairing contract consumed by
``compute_intrinsic_losses``.

TPU-first design: the whole sampler is a jitted pure function of a PRNG
key over pools that live in device memory (``[num_img, H*W, C]``), so a
training step never touches the host.  Under the data-parallel mesh
each device runs this with its own key — per-shard pairs, zero
cross-chip traffic (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RayBatch(NamedTuple):
    rays: jnp.ndarray  # [2N, 11]
    rgb: jnp.ndarray  # [2N, 3]
    depth: Optional[jnp.ndarray]  # [2N]
    semantic: Optional[jnp.ndarray]  # [2N] int labels (0=void) or mask
    sem_flag: jnp.ndarray  # [] 1.0 if semantic loss active for this image
    image_idx: jnp.ndarray  # [] int


def sample_ray_pairs(
    key: jax.Array,
    rays_pool: jnp.ndarray,  # [num_img, H*W, 11]
    rgb_pool: jnp.ndarray,  # [num_img, H*W, 3]
    h: int,
    w: int,
    n_rays: int,
    depth_pool: Optional[jnp.ndarray] = None,  # [num_img, H*W]
    sem_pool: Optional[jnp.ndarray] = None,  # [num_img, H*W]
    mask_ids: Optional[jnp.ndarray] = None,  # [num_img] semantic-loss mask
) -> RayBatch:
    num_img = rays_pool.shape[0]
    k_img, k_pix, k_bh, k_bw = jax.random.split(key, 4)

    img = jax.random.randint(k_img, (), 0, num_img)
    idx_hw = jax.random.randint(k_pix, (n_rays,), 0, h * w)
    idx_h, idx_w = idx_hw // w, idx_hw % w
    bias_h = jax.random.randint(k_bh, (n_rays,), -1, 2)
    bias_w = jax.random.randint(k_bw, (n_rays,), -1, 2)
    nei_h = jnp.clip(idx_h + bias_h, 0, h - 1)
    nei_w = jnp.clip(idx_w + bias_w, 0, w - 1)
    nei_hw = nei_h * w + nei_w

    idx = jnp.concatenate([idx_hw, nei_hw], axis=0)  # [2N]

    def gather(pool):
        per_img = jax.lax.dynamic_index_in_dim(pool, img, 0, keepdims=False)
        return jnp.take(per_img, idx, axis=0)

    sem_flag = (
        mask_ids[img].astype(jnp.float32)
        if mask_ids is not None
        else jnp.float32(1.0)
    )
    return RayBatch(
        rays=gather(rays_pool),
        rgb=gather(rgb_pool),
        depth=gather(depth_pool) if depth_pool is not None else None,
        semantic=gather(sem_pool) if sem_pool is not None else None,
        sem_flag=sem_flag,
        image_idx=img,
    )


def epoch_permutation_batch(
    rays_flat: jnp.ndarray,  # [num_img*H*W, 11]
    rgb_flat: jnp.ndarray,
    perm: jnp.ndarray,  # [num_img*H*W] epoch permutation (host-refreshed)
    cursor: jnp.ndarray,  # [] int offset
    n_rays: int,
):
    """The reference's all-pixel epoch-shuffled alternative path
    (``trainer.py:664-680``): take the next ``n_rays`` indices of a
    precomputed permutation."""
    idx = jax.lax.dynamic_slice_in_dim(perm, cursor, n_rays)
    return jnp.take(rays_flat, idx, axis=0), jnp.take(rgb_flat, idx, axis=0)
