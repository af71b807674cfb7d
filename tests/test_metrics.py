"""Metrics tests against the reference formulas (and sklearn's
confusion matrix where convenient)."""

import numpy as np

from intrinsicnerf_tpu.core.metrics import (
    calculate_depth_metrics,
    calculate_segmentation_metrics,
    confusion_matrix,
    psnr_np,
)


def test_confusion_matrix_vs_sklearn(rng):
    from sklearn.metrics import confusion_matrix as sk_cm

    t = rng.integers(0, 5, size=200)
    p = rng.integers(0, 5, size=200)
    np.testing.assert_array_equal(
        confusion_matrix(t, p, 5), sk_cm(t, p, labels=list(range(5)))
    )


def test_perfect_prediction():
    t = np.array([0, 1, 2, 2, 1])
    miou, miou_valid, acc, cls_acc, ious = calculate_segmentation_metrics(t, t, 3, -1)
    assert miou == 1.0 and miou_valid == 1.0 and acc == 1.0 and cls_acc == 1.0


def test_ignore_label():
    t = np.array([-1, -1, 1, 2])
    p = np.array([0, 0, 1, 2])
    miou, miou_valid, acc, _, ious = calculate_segmentation_metrics(t, p, 3, -1)
    assert acc == 1.0  # ignored pixels dropped
    # class 0 absent from valid GT -> nan excluded from miou_valid
    assert miou_valid == 1.0

    all_ignored = calculate_segmentation_metrics(
        np.full(4, -1), p, 3, -1
    )
    assert all_ignored[0] == 0.0


def test_known_iou():
    # class0: t=[0,0], p=[0,1] -> tp=1, fp(col0)=0, fn=1 -> iou=1/2
    t = np.array([0, 0, 1, 1])
    p = np.array([0, 1, 1, 1])
    _, _, acc, _, ious = calculate_segmentation_metrics(t, p, 2, -1)
    np.testing.assert_allclose(ious[0], 0.5)
    np.testing.assert_allclose(ious[1], 2 / 3)
    np.testing.assert_allclose(acc, 0.75)


def test_depth_metrics_perfect():
    d = np.random.default_rng(0).uniform(0.5, 5.0, size=(16, 16))
    m = calculate_depth_metrics(d, d)
    for k in ("AbsRel", "AbsDiff", "SqRel", "RMSE", "LogRMSE"):
        assert m[k] == 0.0
    assert m["r1"] == m["r2"] == m["r3"] == 1.0
    assert m["complete"] == 1.0


def test_depth_metrics_masks():
    t = np.array([[0.0, 2.0], [15.0, 2.0]])  # 0 and >10 masked out
    p = np.array([[1.0, 3.0], [1.0, 0.0]])  # 0-pred masked (complete)
    m = calculate_depth_metrics(t, p)
    # only (0,1) survives: t=2, p=3
    np.testing.assert_allclose(m["AbsDiff"], 1.0)
    np.testing.assert_allclose(m["AbsRel"], 0.5)
    np.testing.assert_allclose(m["complete"], 0.75)
    # ratio 1.5: fails delta<1.25, passes delta<1.25^2
    assert m["r1"] == 0.0 and m["r2"] == 1.0 and m["r3"] == 1.0


def test_psnr():
    a = np.zeros((4, 4, 3))
    b = np.full((4, 4, 3), 0.1)
    np.testing.assert_allclose(psnr_np(a, b), 20.0, rtol=1e-6)
    assert psnr_np(a, a) == float("inf")
