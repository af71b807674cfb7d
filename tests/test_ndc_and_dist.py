"""NDC sampling path and distributed-helper tests."""

import numpy as np
import jax
import jax.numpy as jnp

from intrinsicnerf_tpu.core.rays import create_rays, ndc_rays
from intrinsicnerf_tpu.data.samplers import sample_ray_pairs_from_poses
from intrinsicnerf_tpu.parallel.distributed import (
    initialize_distributed,
    local_image_slice,
)
from intrinsicnerf_tpu.train.prepare import apply_ndc_to_rays


def test_ndc_sampler_bounds(rng):
    h = w = 16
    focal = 10.0
    poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    poses[:, 2, 3] = 0.5  # camera near origin looking down -z (opengl)
    from intrinsicnerf_tpu.core.rays import camera_ray_dirs

    dirs_cam = camera_ray_dirs(
        h, w, focal, focal, w / 2, h / 2, convention="opengl"
    ).reshape(-1, 3)
    rgb = jnp.asarray(rng.uniform(size=(3, h * w, 3)).astype(np.float32))
    batch = sample_ray_pairs_from_poses(
        jax.random.key(0), jnp.asarray(dirs_cam), jnp.asarray(poses), rgb,
        h, w, 8, near=1.0, far=6.0, ndc_focal=focal,
    )
    # NDC bounds replace near/far with [0, 1]
    np.testing.assert_allclose(np.asarray(batch.rays[:, 6]), 0.0)
    np.testing.assert_allclose(np.asarray(batch.rays[:, 7]), 1.0)
    # NDC coords bounded
    assert np.all(np.abs(np.asarray(batch.rays[:, 0:3])) < 2.0)
    # viewdirs still unit-norm world vectors
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(batch.rays[:, 8:11]), axis=-1), 1.0, rtol=1e-5
    )


def test_apply_ndc_matches_direct(rng):
    h = w = 8
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 0.5
    rays = create_rays(
        jnp.asarray(c2w), h, w, 4.0, 4.0, w / 2, h / 2, 1.0, 6.0,
        convention="opengl",
    )[0]
    out = apply_ndc_to_rays(rays, h, w, 4.0)
    o2, d2 = ndc_rays(h, w, 4.0, 1.0, rays[:, 0:3], rays[:, 3:6])
    np.testing.assert_allclose(np.asarray(out[:, 0:3]), np.asarray(o2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 3:6]), np.asarray(d2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 8:11]), np.asarray(rays[:, 8:11]))


def test_distributed_single_process():
    pid, n = initialize_distributed()
    assert pid == 0 and n == 1
    assert local_image_slice(8) == slice(0, 8)
