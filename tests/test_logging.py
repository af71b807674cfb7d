"""Observability subsystem (C25): TBLogger scalars/histograms/images.

Behavioral parity target: ``TFVisualizer``
(``/root/reference/SSR/visualisation/tensorboard_vis.py:5-21``) — scalar
dict logging, histograms, image panels, and the config text dump.  Our
logger additionally persists scalars to a CSV so runs remain auditable
without TensorBoard.
"""

import csv
import os

import numpy as np

from intrinsicnerf_tpu.train.logging_utils import TBLogger


def test_scalars_csv_roundtrip(tmp_path):
    log_dir = str(tmp_path / "tfb")
    logger = TBLogger(log_dir, config={"experiment": {"scene": "room_0"}})
    logger.scalars(100, {"train/total_loss": 0.5, "train/psnr_fine": 21.0})
    logger.scalars(200, {"train/total_loss": 0.25})
    logger.close()

    with open(os.path.join(log_dir, "scalars.csv")) as f:
        rows = list(csv.reader(f))
    assert ["100", "train/total_loss", "0.5"] in rows
    assert ["100", "train/psnr_fine", "21.0"] in rows
    assert ["200", "train/total_loss", "0.25"] in rows


def test_scalars_append_across_sessions(tmp_path):
    # resume must append, not truncate (reference relies on one TB run dir)
    log_dir = str(tmp_path / "tfb")
    first = TBLogger(log_dir)
    first.scalars(1, {"loss": 1.0})
    first.close()
    second = TBLogger(log_dir)
    second.scalars(2, {"loss": 0.5})
    second.close()
    with open(os.path.join(log_dir, "scalars.csv")) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 2 and rows[0][0] == "1" and rows[1][0] == "2"


def test_histogram_and_image_no_crash(tmp_path):
    rng = np.random.default_rng(0)
    logger = TBLogger(str(tmp_path / "tfb"))
    logger.histogram(10, "sigma/coarse", rng.normal(size=512))
    logger.image(10, "render/rgb", rng.uniform(size=(8, 8, 3)).astype(np.float32))
    logger.close()


def test_tensorboard_event_files_written(tmp_path):
    # when torch's SummaryWriter is available, real event files appear
    log_dir = str(tmp_path / "tfb")
    logger = TBLogger(log_dir, config={"a": 1})
    logger.scalars(1, {"loss": 1.0})
    logger.close()
    if logger.writer is not None:
        assert any(n.startswith("events.out.tfevents") for n in os.listdir(log_dir))
