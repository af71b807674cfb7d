"""True multi-process data-parallel test (SURVEY.md §4 multi-host plan):
two jax.distributed processes with 2 virtual CPU devices each form a
4-device global mesh; each loads only its host-local pool shard
(``local_image_slice`` + ``make_global_pools``), runs the sharded train
step and the replicated sharded render, and the results must agree
across processes AND with a single-process 4-device run on the same
global data."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow
import jax.numpy as jnp
import optax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_outputs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip the TPU plugin registration
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    outs = [str(tmp / f"p{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_multihost_worker.py"),
             coord, "2", str(i), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i]}"
    return [np.load(o) for o in outs]


def test_two_process_results_agree(worker_outputs):
    a, b = worker_outputs
    np.testing.assert_allclose(a["totals"], b["totals"], rtol=1e-6)
    np.testing.assert_allclose(a["rgb"], b["rgb"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(a["trunk0"], b["trunk0"], rtol=1e-6, atol=1e-7)


def test_two_process_matches_single_process(worker_outputs):
    """The same global computation on a single-process 4-device mesh:
    identical pools, seeds and mesh axis size -> identical losses,
    params and renders (up to collective reduction order)."""
    from intrinsicnerf_tpu.cluster.assign import empty_cluster_table
    from intrinsicnerf_tpu.models.mlp import MLPConfig
    from intrinsicnerf_tpu.parallel.mesh import make_mesh, replicate, shard_pools
    from intrinsicnerf_tpu.parallel.sharded_render import make_sharded_render
    from intrinsicnerf_tpu.parallel.sharded_step import (
        make_sharded_train_step_for,
    )
    from intrinsicnerf_tpu.render.pipeline import RenderConfig
    from intrinsicnerf_tpu.train.step import TrainConfig, create_train_state

    from tests.test_train_step import H, W, make_pools

    mesh = make_mesh(4)
    pools_host = make_pools(n_img=4, semantic=True)
    pools = shard_pools(mesh, pools_host)
    mcfg = MLPConfig(depth=3, width=32, skips=(1,), n_freqs_pos=4,
                     n_freqs_dir=2, enable_semantic=True,
                     num_semantic_classes=4)
    rcfg = RenderConfig(n_coarse=8, n_importance=8, raw_noise_std=1.0)
    tcfg = TrainConfig(n_rays=8)
    opt = optax.adam(5e-4)
    state = replicate(mesh, create_train_state(jax.random.key(0), mcfg, tcfg, opt))
    table = replicate(mesh, empty_cluster_table(4, 32))
    step = make_sharded_train_step_for(mcfg, rcfg, tcfg, opt, H, W, mesh, pools)
    totals = []
    for _ in range(2):
        state, report = step(state, pools, table, jnp.float32(0.0),
                             jax.random.key(5))
        totals.append(float(report.total))

    n_rays = 37
    rng = np.random.default_rng(9)
    rays = np.zeros((n_rays, 11), np.float32)
    rays[:, 3:6] = rng.normal(size=(n_rays, 3))
    rays[:, 8:11] = rays[:, 3:6] / np.linalg.norm(
        rays[:, 3:6], axis=-1, keepdims=True
    )
    rays[:, 6], rays[:, 7] = 0.1, 5.0
    render = make_sharded_render(mcfg, rcfg, mesh, n_rays, chunk=16,
                                 replicate_output=True)
    out = render(state.params_coarse, state.params_fine, jnp.asarray(rays))

    a = worker_outputs[0]
    np.testing.assert_allclose(a["totals"], np.asarray(totals), rtol=1e-5)
    np.testing.assert_allclose(
        a["trunk0"],
        np.asarray(state.params_coarse["trunk"][0]["kernel"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        a["rgb"], np.asarray(out.fine.rgb), rtol=1e-5, atol=1e-6
    )
