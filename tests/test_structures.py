"""Typed structure containers."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from self6dpp_tpu.utils.structures import Boxes, Instances, Poses


def test_pose_compose_inverse(rng):
    R = jnp.asarray(Rotation.random(4, random_state=0).as_matrix(), dtype=jnp.float32)
    t = jnp.asarray(rng.normal(size=(4, 3)), dtype=jnp.float32)
    p = Poses.create(R, t)
    ident = p.compose(p.inverse())
    np.testing.assert_allclose(np.asarray(ident.R),
                               np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ident.t), 0.0, atol=1e-5)


def test_pose_transform_jit(rng):
    p = Poses.create(jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
                     jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]))
    pts = jnp.zeros((2, 5, 3))
    out = jax.jit(lambda pp, x: pp.transform(x))(p, pts)
    np.testing.assert_allclose(np.asarray(out[0, :, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(out[1, :, 1]), 1.0)


def test_boxes():
    b = Boxes(xyxy=jnp.asarray([[0.0, 0, 10, 20]]))
    np.testing.assert_allclose(np.asarray(b.centers), [[5, 10]])
    np.testing.assert_allclose(np.asarray(b.area()), [200.0])
    s = b.scaled(2.0)
    np.testing.assert_allclose(np.asarray(s.wh), [[20, 40]])
    c = s.clipped(25, 15)
    assert float(c.xyxy[0, 2]) <= 14


def test_instances_topk():
    inst = Instances(
        boxes=Boxes(xyxy=jnp.arange(16.0).reshape(4, 4)),
        classes=jnp.asarray([0, 1, 2, 3]),
        scores=jnp.asarray([0.1, 0.9, 0.5, 0.3]),
        valid=jnp.asarray([True, True, True, False]))
    top = inst.topk(2)
    assert list(np.asarray(top.classes)) == [1, 2]
