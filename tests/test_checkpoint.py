"""Async checkpointing: saves must not block the training loop, and the
snapshot must reflect the state *at save time* even if training mutates
(donates) the state buffers immediately afterwards."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from intrinsicnerf_tpu.models.mlp import MLPConfig
from intrinsicnerf_tpu.train.checkpoint import (
    Checkpointer,
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from intrinsicnerf_tpu.train.step import TrainConfig, create_train_state


def _tiny_state(seed=0):
    mcfg = MLPConfig(depth=3, width=16, skips=(1,), use_fused_kernel=False)
    tcfg = TrainConfig(n_rays=4)
    opt = optax.adam(1e-3)
    return create_train_state(jax.random.key(seed), mcfg, tcfg, opt), opt


def test_async_save_snapshot_survives_mutation(tmp_path):
    state, _ = _tiny_state()
    want = jax.device_get(state)

    ckpt = Checkpointer(str(tmp_path / "ck"))
    ckpt.save(state, 1)
    # immediately clobber the live buffers (what a donated train step
    # does); the background write must not pick this up
    state = state._replace(
        step=state.step + 999,
        params_coarse=jax.tree_util.tree_map(
            lambda x: x * 0.0, state.params_coarse
        ),
    )
    ckpt.wait()
    template, _ = _tiny_state(seed=1)
    got = ckpt.restore(template, 1)
    ckpt.close()

    assert int(got.step) == int(want.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(got.params_coarse),
        jax.tree_util.tree_leaves(want.params_coarse),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_save_does_not_block(tmp_path):
    """The save call itself must return far faster than the serialized
    write (steps continue while the save is in flight)."""
    state, _ = _tiny_state()
    ckpt = Checkpointer(str(tmp_path / "ck"))
    # warm up one save so directory creation doesn't skew timing
    ckpt.save(state, 1)
    ckpt.wait()

    t0 = time.perf_counter()
    ckpt.save(state, 2)
    t_call = time.perf_counter() - t0
    t1 = time.perf_counter()
    ckpt.wait()
    t_total = time.perf_counter() - t1 + t_call
    ckpt.close()
    # the dispatch must not cost the full serialization; allow generous
    # slack for CI jitter but catch a synchronous wait_until_finished
    assert t_call < max(0.5, 0.9 * t_total), (t_call, t_total)


def test_one_shot_roundtrip(tmp_path):
    state, _ = _tiny_state()
    save_checkpoint(str(tmp_path / "ck"), state, 7)
    assert latest_step(str(tmp_path / "ck")) == 7
    template, _ = _tiny_state(seed=2)
    got = restore_checkpoint(str(tmp_path / "ck"), template)
    assert int(got.step) == int(state.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(got.params_fine),
        jax.tree_util.tree_leaves(state.params_fine),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_keeps_limited_history(tmp_path):
    state, _ = _tiny_state()
    ckpt = Checkpointer(str(tmp_path / "ck"), max_to_keep=2)
    for s in (1, 2, 3):
        ckpt.save(state, s)
    ckpt.close()
    assert latest_step(str(tmp_path / "ck")) == 3
    with pytest.raises(Exception):
        restore_checkpoint(str(tmp_path / "ck"), state, step=1)
