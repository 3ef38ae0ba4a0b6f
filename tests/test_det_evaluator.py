"""Detection AP evaluator tests with hand-computable cases."""

import numpy as np

from self6dpp_tpu.engine.det_evaluator import (DetEvaluator,
                                               average_precision,
                                               box_iou_xyxy)


def test_box_iou():
    a = np.array([[0, 0, 10, 10]], float)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], float)
    iou = box_iou_xyxy(a, b)[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_ap_perfect():
    assert average_precision(np.array([1.0]), np.array([1.0])) > 0.99


def test_evaluator_perfect_detections():
    ev = DetEvaluator(num_classes=2)
    for img in range(3):
        gt = [[10, 10, 50, 50], [60, 60, 90, 90]]
        ev.add_image(img, gt, [0, 1], [0.9, 0.8], gt, [0, 1])
    m = ev.evaluate()
    assert m["AP50"] > 0.99
    assert m["AP"] > 0.99


def test_evaluator_misses_lower_ap():
    ev = DetEvaluator(num_classes=1)
    ev.add_image(0, [[10, 10, 50, 50]], [0], [0.9],
                 [[10, 10, 50, 50], [60, 60, 90, 90]], [0, 0])
    m = ev.evaluate()
    assert 0.3 < m["AP50"] < 0.7          # one of two gts found


def test_evaluator_localization_quality():
    """A detection with IoU 0.6 counts at AP50 but not AP75."""
    ev = DetEvaluator(num_classes=1)
    gt = [[0, 0, 100, 100]]
    det = [[0, 0, 100, 62]]               # IoU = 0.62
    ev.add_image(0, det, [0], [0.9], gt, [0])
    m = ev.evaluate()
    assert m["AP50"] > 0.99
    assert m["AP75"] < 0.01
