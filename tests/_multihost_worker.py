"""Subprocess worker for the 2-process jax.distributed test.

Usage: python _multihost_worker.py <coordinator> <num_procs> <proc_id> <out.npz>

Each process gets 2 virtual CPU devices -> a 4-device global ``data``
mesh across 2 processes.  The worker builds HOST-LOCAL pools (its slice
of a deterministic synthetic dataset), lifts them with
``make_global_pools``, runs the shard_map'd train step twice, then runs
the replicated sharded full-image render, and dumps the results for the
parent to compare across processes and against a single-process run.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

coordinator, n_procs, pid, out_path = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)
jax.distributed.initialize(coordinator, num_processes=n_procs, process_id=pid)

import numpy as np
import jax.numpy as jnp
import optax

from intrinsicnerf_tpu.cluster.assign import empty_cluster_table
from intrinsicnerf_tpu.models.mlp import MLPConfig
from intrinsicnerf_tpu.parallel.distributed import (
    allgather_semantic_classes,
    local_image_slice,
    make_global_pools,
)
from intrinsicnerf_tpu.parallel.mesh import make_mesh, replicate
from intrinsicnerf_tpu.parallel.sharded_render import make_sharded_render
from intrinsicnerf_tpu.parallel.sharded_step import make_sharded_train_step_for
from intrinsicnerf_tpu.render.pipeline import RenderConfig
from intrinsicnerf_tpu.train.step import TrainConfig, create_train_state

from tests.test_train_step import H, W, make_pools

assert jax.process_count() == n_procs
assert jax.device_count() == 2 * n_procs

mesh = make_mesh()  # all 4 global devices

# deterministic full dataset, then THIS HOST'S slice only
pools_full = jax.tree_util.tree_map(np.asarray, make_pools(n_img=4, semantic=True))
sl = local_image_slice(4)
pools_local = jax.tree_util.tree_map(lambda x: x[sl], pools_full)
pools = make_global_pools(mesh, pools_local)
assert pools.rgb.shape[0] == 4  # global image axis reassembled

# the class-set agreement path (all hosts see the same labels here, but
# the collective must still produce the union)
union = allgather_semantic_classes(np.asarray([0, 1, 2, 3]))
assert union.tolist() == [0, 1, 2, 3], union

mcfg = MLPConfig(depth=3, width=32, skips=(1,), n_freqs_pos=4, n_freqs_dir=2,
                 enable_semantic=True, num_semantic_classes=4)
rcfg = RenderConfig(n_coarse=8, n_importance=8, raw_noise_std=1.0)
tcfg = TrainConfig(n_rays=8)
opt = optax.adam(5e-4)

state = replicate(mesh, create_train_state(jax.random.key(0), mcfg, tcfg, opt))
table = replicate(mesh, empty_cluster_table(4, 32))
step = make_sharded_train_step_for(mcfg, rcfg, tcfg, opt, H, W, mesh, pools)

totals = []
for i in range(2):
    state, report = step(state, pools, table, jnp.float32(0.0), jax.random.key(5))
    totals.append(float(report.total))

# replicated sharded render: every process ends with the full view
n_rays = 37  # awkward count -> exercises the pad path
rng = np.random.default_rng(9)
rays = np.zeros((n_rays, 11), np.float32)
rays[:, 3:6] = rng.normal(size=(n_rays, 3))
rays[:, 8:11] = rays[:, 3:6] / np.linalg.norm(rays[:, 3:6], axis=-1, keepdims=True)
rays[:, 6], rays[:, 7] = 0.1, 5.0
render = make_sharded_render(mcfg, rcfg, mesh, n_rays, chunk=16,
                             replicate_output=True)
out = render(state.params_coarse, state.params_fine, jnp.asarray(rays))
rgb = np.asarray(out.fine.rgb)  # fully replicated -> addressable everywhere
assert rgb.shape == (n_rays, 3)

np.savez(
    out_path,
    totals=np.asarray(totals),
    rgb=rgb,
    trunk0=np.asarray(state.params_coarse["trunk"][0]["kernel"]),
)
print(f"worker {pid}: ok, totals={totals}", flush=True)
