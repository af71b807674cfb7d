"""Training schedules.

Behavioral parity targets:
- exp LR decay ``lr = lr0 * 0.1^(step / decay_steps)`` applied every
  step (``/root/reference/SSR/training/trainer.py:1004-1009``;
  object: decay_steps = lrate_decay*1000, ``run_nerf.py:1022-1027``).
- residual weight 1 -> w_res2 after step 100k, intensity w_i1 -> w_i2
  after 50k (``trainer.py:965-973``).
- cluster-loss weight / bandwidth-factor anneal at each 10k-step
  cluster rebuild: with progress ``n``, ``w_c = min(0.1^(2-2n), 1)``
  and ``b_f = min(0.5^(2-2n), cap)`` (cap 1.0 scene / 0.5 object;
  ``trainer.py:1051-1056``, ``run_nerf.py:1061-1065``).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def make_lr_schedule(base_lr: float, decay_steps: float, decay_rate: float = 0.1):
    return optax.exponential_decay(
        init_value=base_lr,
        transition_steps=decay_steps,
        decay_rate=decay_rate,
        staircase=False,
    )


def loss_weight_schedule(
    step: jnp.ndarray,
    w_res1: float,
    w_res2: float,
    w_i1: float,
    w_i2: float,
    residual_switch: int = 100_000,
    intensity_switch: int = 50_000,
):
    """(residual_weight, intensity_weight) at ``step`` — traced-safe."""
    w_res = jnp.where(step <= residual_switch, w_res1, w_res2)
    w_i = jnp.where(step <= intensity_switch, w_i1, w_i2)
    return w_res, w_i


def cluster_anneal(
    global_step: int,
    vis_every: int,
    n_iters: int,
    b_f_cap: float = 1.0,
):
    """(w_c, b_f) at a cluster rebuild (python floats, host-side)."""
    denom = float(n_iters - vis_every * 2)
    n = float(global_step - vis_every) / denom if denom != 0 else 1.0
    w_c = min(0.1 ** (2.0 - 2.0 * n), 1.0)
    b_f = min(0.5 ** (2.0 - 2.0 * n), b_f_cap)
    return w_c, b_f
