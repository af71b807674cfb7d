"""Observability: TensorBoard scalars/histograms/images + console.

Behavioral parity target: ``TFVisualizer``
(``/root/reference/SSR/visualisation/tensorboard_vis.py``) plus the
config text dump.  Backed by torch.utils.tensorboard (host side); falls
back to CSV logging when tensorboard is unavailable.  ``jax.profiler``
tracing hooks cover what the reference lacked (SURVEY.md §5).
"""

from __future__ import annotations

import csv
import os
from typing import Dict, Optional

import numpy as np


class TBLogger:
    def __init__(self, log_dir: str, config: Optional[dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._csv_path = os.path.join(log_dir, "scalars.csv")
        self._csv_file = open(self._csv_path, "a", newline="")
        self._csv = csv.writer(self._csv_file)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(log_dir)
            if config is not None:
                self.writer.add_text("config", str(config), 0)
        except Exception:
            self.writer = None

    def scalars(self, step: int, values: Dict[str, float]):
        for name, v in values.items():
            v = float(v)
            self._csv.writerow([step, name, v])
            if self.writer is not None:
                self.writer.add_scalar(name, v, step)
        self._csv_file.flush()

    def histogram(self, step: int, name: str, values):
        if self.writer is None:
            return
        values = np.asarray(values).reshape(-1)
        finite = np.isfinite(values)
        if not finite.all():
            # torch's histogram encoder raises on all-NaN input; a
            # diverged run should still log (the NaN alarm reports it)
            values = values[finite]
            if values.size == 0:
                return
        self.writer.add_histogram(name, values, step)

    def image(self, step: int, name: str, img, dataformats="HWC"):
        if self.writer is not None:
            self.writer.add_image(name, np.asarray(img), step, dataformats=dataformats)

    def close(self):
        self._csv_file.close()
        if self.writer is not None:
            self.writer.close()


class NullLogger:
    """No-op logger for non-lead processes in multi-host runs (file IO —
    TB events, CSV — is owned by process 0; training-side computation is
    identical everywhere)."""

    writer = None

    def scalars(self, step, values):
        pass

    def histogram(self, step, name, values):
        pass

    def image(self, step, name, img, dataformats="HWC"):
        pass

    def close(self):
        pass


def start_profiler_trace(log_dir: str):
    import jax

    jax.profiler.start_trace(os.path.join(log_dir, "profile"))


def stop_profiler_trace():
    import jax

    jax.profiler.stop_trace()
