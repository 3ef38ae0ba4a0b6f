"""YOLOv4 detector tests (tiny width/depth multiples for CPU speed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self6dpp_tpu.models.yolo import (
    YOLOv4, YoloConfig, bbox_ciou, decode_predictions, non_max_suppression,
    yolo_loss,
)


@pytest.fixture(scope="module")
def setup():
    cfg = YoloConfig(num_classes=3, input_size=128, depth_multiple=0.33,
                     width_multiple=0.125)
    model = YOLOv4(cfg=cfg)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    return cfg, model, variables


def test_forward_shapes(setup):
    cfg, model, variables = setup
    x = jnp.ones((2, 128, 128, 3)) * 0.5
    outs = model.apply(variables, x)
    assert len(outs) == 3
    assert outs[0].shape == (2, 16, 16, 3, 8)     # stride 8, 5+3
    assert outs[1].shape == (2, 8, 8, 3, 8)
    assert outs[2].shape == (2, 4, 4, 3, 8)


def test_decode_shapes_and_range(setup):
    cfg, model, variables = setup
    outs = model.apply(variables, jnp.ones((1, 128, 128, 3)) * 0.5)
    pred = decode_predictions(outs, cfg)
    n = 16 * 16 * 3 + 8 * 8 * 3 + 4 * 4 * 3
    assert pred.shape == (1, n, 8)
    p = np.asarray(pred)
    assert (p[..., 4:] >= 0).all() and (p[..., 4:] <= 1).all()
    # xy stay within ~image bounds
    assert p[..., 0].min() > -64 and p[..., 0].max() < 192


def test_ciou_properties():
    a = jnp.asarray([[10.0, 10, 4, 4]])
    assert float(bbox_ciou(a, a)[0]) == pytest.approx(1.0, abs=1e-5)
    b = jnp.asarray([[30.0, 30, 4, 4]])
    assert float(bbox_ciou(a, b)[0]) < 0.0       # disjoint + center penalty


def test_loss_and_grads(setup):
    cfg, model, variables = setup
    x = jnp.ones((2, 128, 128, 3)) * 0.5
    targets = jnp.asarray([
        [[0, 32.0, 32.0, 24.0, 24.0], [1, 96.0, 96.0, 40.0, 40.0]],
        [[2, 64.0, 64.0, 30.0, 30.0], [0, 0, 0, 0, 0]],
    ])
    tvalid = jnp.asarray([[True, True], [True, False]])

    def loss_fn(params):
        outs, _ = model.apply({**variables, "params": params}, x, train=True,
                              mutable=["batch_stats"])
        ld = yolo_loss(outs, targets, tvalid, cfg)
        return sum(jax.tree.leaves(ld)), ld

    (total, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(total)), ld
    assert set(ld) == {"loss_box", "loss_obj", "loss_cls"}
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_nms():
    # two overlapping high-conf boxes + one separate
    pred = np.zeros((1, 3, 8), dtype=np.float32)
    pred[0, 0] = [20, 20, 10, 10, 0.9, 0.9, 0.1, 0.0]
    pred[0, 1] = [21, 21, 10, 10, 0.8, 0.8, 0.2, 0.0]   # suppressed by 0
    pred[0, 2] = [80, 80, 10, 10, 0.7, 0.1, 0.9, 0.0]   # different class
    dets = non_max_suppression(pred, conf_thres=0.1, iou_thres=0.5)
    assert len(dets) == 1
    d = dets[0]
    assert d.shape[0] == 2
    assert d[0, 5] == 0 and d[1, 5] == 1                # classes
    assert d[0, 4] > d[1, 4]                             # sorted by conf


def test_nms_class_separation():
    # same location, different classes -> both kept
    pred = np.zeros((1, 2, 8), dtype=np.float32)
    pred[0, 0] = [20, 20, 10, 10, 0.9, 0.9, 0.1, 0.0]
    pred[0, 1] = [20, 20, 10, 10, 0.8, 0.1, 0.9, 0.0]
    dets = non_max_suppression(pred, conf_thres=0.1, iou_thres=0.5)
    assert dets[0].shape[0] == 2
