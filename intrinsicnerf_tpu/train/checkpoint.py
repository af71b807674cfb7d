"""Checkpoint save/restore via Orbax.

Behavioral parity target: the reference's ``torch.save`` of
``{global_step, network_coarse/fine_state_dict, optimizer_state_dict}``
every 10k steps (``trainer.py:1036-1048``) and the object-level
auto-resume from the latest checkpoint in the experiment directory
(``run_nerf.py:313-330``).  Cluster palettes are persisted separately
as reference-format JSON (``cluster/manager.py``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from intrinsicnerf_tpu.train.step import TrainState


def _mgr(ckpt_dir: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=5, create=True),
    )


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int) -> None:
    import orbax.checkpoint as ocp

    mgr = _mgr(ckpt_dir)
    mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _mgr(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(
    ckpt_dir: str, template: TrainState, step: Optional[int] = None
) -> Optional[TrainState]:
    """Restore into the shape/dtype structure of ``template``; returns
    None when no checkpoint exists (fresh start)."""
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _mgr(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    target = jax.device_get(template)
    restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return jax.device_put(restored)
