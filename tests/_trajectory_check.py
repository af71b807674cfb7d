"""N-device sharded training trajectory vs single-device emulation at
equal global batch (VERDICT r3 item 6).

The sharded step's semantics are: every device samples its own pairs
from its pool shard with ``fold_in(key, axis_index)``, grads are
``pmean``'d, one update applies.  With a *linear* optimizer (plain SGD)
that is mathematically identical to averaging the per-shard
single-device updates taken from the same start state:

    params - lr * mean_d(g_d)  ==  mean_d(params - lr * g_d)

so a 1-device loop over the shards with the same key folding reproduces
the N-device trajectory *exactly* (fp reduction order aside) — no
statistical tolerance, no reimplementation of the loss internals.  Run
on the fused Pallas path (interpret mode on CPU) with packed state, the
production configuration's code path.

Usable in-process (8-device conftest mesh) and as a subprocess for
other device counts:  ``python -m tests._trajectory_check 16``.
"""

import os
import sys

if __name__ == "__main__":  # subprocess entry: set platform before use
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the axon sitecustomize imports jax at interpreter start, so env
    # vars come too late; jax.config works until a backend initializes
    # (same dance as tests/conftest.py)
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    _jax.config.update("jax_num_cpu_devices", n)

import numpy as np
import jax
import jax.numpy as jnp
import optax


def run_check(n_dev: int, n_steps: int = 20, atol: float = 1e-4):
    from intrinsicnerf_tpu.cluster.assign import empty_cluster_table
    from intrinsicnerf_tpu.models.mlp import MLPConfig
    from intrinsicnerf_tpu.ops.fused_mlp import is_packed
    from intrinsicnerf_tpu.parallel.mesh import make_mesh, replicate, shard_pools
    from intrinsicnerf_tpu.parallel.sharded_step import make_sharded_train_step
    from intrinsicnerf_tpu.render.pipeline import RenderConfig
    from intrinsicnerf_tpu.train.step import (
        TrainConfig,
        TrainState,
        create_train_state,
        make_train_step,
        packs_state,
    )
    from tests.test_train_step import H, W, make_pools

    assert len(jax.devices()) >= n_dev, (
        f"need {n_dev} devices, have {len(jax.devices())}"
    )
    # fused-kernel path (depth 8 / skip 4) at reduced width for CPU speed
    mcfg = MLPConfig(
        depth=8, width=64, skips=(4,), n_freqs_pos=10, n_freqs_dir=4,
        pos_scalar_factor=10.0, enable_semantic=True,
        num_semantic_classes=4, use_fused_kernel=True,
    )
    assert packs_state(mcfg)
    rcfg = RenderConfig(n_coarse=4, n_importance=8, perturb=1.0,
                        raw_noise_std=1.0)
    tcfg = TrainConfig(n_rays=4)
    opt = optax.sgd(5e-3)  # linear in grads -> exact emulation

    mesh = make_mesh(n_dev)
    pools_host = make_pools(n_img=n_dev, semantic=True)
    table = empty_cluster_table(4, 32)
    w_c = jnp.float32(0.0)
    key = jax.random.key(3)

    state0 = create_train_state(jax.random.key(0), mcfg, tcfg, opt)
    assert is_packed(state0.params_coarse)

    # N-device sharded trajectory
    pools_sharded = shard_pools(mesh, pools_host)
    state_shard = replicate(mesh, state0)
    table_r = replicate(mesh, table)
    sharded = make_sharded_train_step(
        mcfg, rcfg, tcfg, opt, H, W, mesh, pools_sharded, donate_state=False
    )
    reports_shard = []
    for _ in range(n_steps):
        state_shard, rep = sharded(state_shard, pools_sharded, table_r, w_c, key)
        reports_shard.append(rep)

    # single-device emulation: per-shard steps from the same state, avg
    k = pools_host.rays.shape[0] // n_dev
    shards = [
        jax.tree_util.tree_map(
            lambda x: None if x is None else x[d * k : (d + 1) * k],
            pools_host,
            is_leaf=lambda x: x is None,
        )
        for d in range(n_dev)
    ]
    single = jax.jit(make_train_step(mcfg, rcfg, tcfg, opt, H, W))

    def tree_mean(trees):
        return jax.tree_util.tree_map(
            lambda *xs: jnp.mean(jnp.stack(xs), axis=0), *trees
        )

    state_emu = state0
    reports_emu = []
    for _ in range(n_steps):
        outs = [
            single(state_emu, shards[d], table, w_c, jax.random.fold_in(key, d))
            for d in range(n_dev)
        ]
        params = tree_mean(
            [
                {"coarse": s.params_coarse, "fine": s.params_fine}
                for s, _ in outs
            ]
        )
        state_emu = TrainState(
            step=state_emu.step + 1,
            params_coarse=params["coarse"],
            params_fine=params["fine"],
            opt_state=state_emu.opt_state,  # SGD: empty
        )
        reports_emu.append(tree_mean([r for _, r in outs]))

    # trajectories must agree: per-step pmean'd metrics and final params
    for t, (ra, rb) in enumerate(zip(reports_shard, reports_emu)):
        np.testing.assert_allclose(
            float(ra.total), float(rb.total), rtol=5e-5, atol=1e-6,
            err_msg=f"{n_dev}-device loss diverges from emulation at step {t}",
        )
    for name in ("params_coarse", "params_fine"):
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(getattr(state_shard, name)),
            jax.tree_util.tree_leaves_with_path(getattr(state_emu, name)),
        ):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=atol, rtol=1e-4,
                err_msg=f"{n_dev}-device {name}{jax.tree_util.keystr(pa)} "
                f"diverges after {n_steps} steps",
            )
    assert int(state_shard.step) == n_steps
    return float(reports_shard[-1].total)


if __name__ == "__main__":
    final = run_check(n, n_steps=20)
    print(f"OK n_dev={n} final_loss={final:.6f}")
