"""Checkpoint save/restore via Orbax (async on the save path).

Behavioral parity target: the reference's ``torch.save`` of
``{global_step, network_coarse/fine_state_dict, optimizer_state_dict}``
every 10k steps (``trainer.py:1036-1048``) and the object-level
auto-resume from the latest checkpoint in the experiment directory
(``run_nerf.py:313-330``).  Cluster palettes are persisted separately
as reference-format JSON (``cluster/manager.py``).

TPU-first: saves are *asynchronous* — ``Checkpointer.save`` snapshots
the (host-fetched) state and serializes it on Orbax's background
thread, so the training loop never stalls on disk at the 10k-step
cadence.  The barrier happens only at the next save (Orbax serializes
in-flight saves internally) or at ``close()``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from intrinsicnerf_tpu.train.step import TrainState


def _options(max_to_keep: int = 5):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
    )


class Checkpointer:
    """A persistent async CheckpointManager for one directory.

    The reference re-serializes synchronously inside the train loop;
    here the chip keeps stepping while Orbax writes in the background.
    Call ``wait()`` before reading files back and ``close()`` on exit.
    """

    def __init__(self, ckpt_dir: str, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self._mgr = ocp.CheckpointManager(
            os.path.abspath(ckpt_dir), options=_options(max_to_keep)
        )
        self._ocp = ocp

    def save(self, state: TrainState, step: int) -> None:
        """Non-blocking: device->host fetch, then background serialize.
        (``jax.device_get`` snapshots the buffers, so donation/mutation
        of ``state`` after this call cannot corrupt the write.)"""
        self._mgr.save(
            step, args=self._ocp.args.StandardSave(jax.device_get(state))
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, template: TrainState, step: Optional[int] = None
    ) -> Optional[TrainState]:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        target = jax.device_get(template)
        restored = self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(target)
        )
        return jax.device_put(restored)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


# ------------------------------------------------- one-shot conveniences


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int) -> None:
    """Synchronous one-shot save (CLI tools / tests); the Trainer uses a
    persistent ``Checkpointer`` instead."""
    ckpt = Checkpointer(ckpt_dir)
    ckpt.save(state, step)
    ckpt.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpt = Checkpointer(ckpt_dir)
    step = ckpt.latest_step()
    ckpt.close()
    return step


def restore_checkpoint(
    ckpt_dir: str, template: TrainState, step: Optional[int] = None
) -> Optional[TrainState]:
    """Restore into the shape/dtype structure of ``template``; returns
    None when no checkpoint exists (fresh start)."""
    if not os.path.isdir(ckpt_dir):
        return None
    ckpt = Checkpointer(ckpt_dir)
    out = ckpt.restore(template, step)
    ckpt.close()
    return out
