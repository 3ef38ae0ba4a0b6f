"""Unit tests for ops.geometry against independent references.

Ground truths come from torch-free scipy.spatial.transform (independent of
both our code and the reference repo), plus hand-derived identities.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from self6dpp_tpu.ops import geometry as G


def random_rots(rng, n):
    return Rotation.random(n, random_state=np.random.RandomState(rng.integers(1 << 30)))


class TestQuat:
    def test_quat_to_mat_matches_scipy(self, rng):
        rots = random_rots(rng, 16)
        q_xyzw = rots.as_quat()  # scipy: (x, y, z, w)
        q_wxyz = np.concatenate([q_xyzw[:, 3:4], q_xyzw[:, :3]], axis=1)
        ours = np.asarray(G.quat_to_mat(jnp.asarray(q_wxyz)))
        np.testing.assert_allclose(ours, rots.as_matrix(), atol=1e-5)

    def test_mat_to_quat_roundtrip(self, rng):
        rots = random_rots(rng, 64)
        m = jnp.asarray(rots.as_matrix())
        q = G.mat_to_quat(m)
        m2 = G.quat_to_mat(q)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)

    def test_quat_mul_matches_rotation_compose(self, rng):
        r1, r2 = random_rots(rng, 8), random_rots(rng, 8)

        def to_wxyz(r):
            q = r.as_quat()
            return np.concatenate([q[:, 3:4], q[:, :3]], axis=1)

        q = G.quat_mul(jnp.asarray(to_wxyz(r1)), jnp.asarray(to_wxyz(r2)))
        expected = (r1 * r2).as_matrix()
        np.testing.assert_allclose(np.asarray(G.quat_to_mat(q)), expected, atol=1e-5)


class TestRot6d:
    def test_roundtrip(self, rng):
        m = jnp.asarray(random_rots(rng, 32).as_matrix())
        m2 = G.rot6d_to_mat(G.mat_to_rot6d(m))
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)

    def test_output_is_rotation(self, rng):
        d6 = jnp.asarray(rng.normal(size=(32, 6)), dtype=jnp.float32)
        m = G.rot6d_to_mat(d6)
        eye = jnp.swapaxes(m, -1, -2) @ m
        np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
        det = np.linalg.det(np.asarray(m))
        np.testing.assert_allclose(det, 1.0, atol=1e-5)


class TestAlloEgo:
    def test_identity_on_axis(self, rng):
        """Object on the optical axis: allo == ego."""
        R = jnp.asarray(random_rots(rng, 4).as_matrix())
        t = jnp.asarray(np.array([[0.0, 0.0, 1.0]] * 4), dtype=jnp.float32)
        R_ego = G.allo_to_ego_mat(t, R)
        np.testing.assert_allclose(np.asarray(R_ego), np.asarray(R), atol=1e-3)

    def test_matches_axangle_formula(self, rng):
        """Cross-check against a direct numpy axis-angle computation."""
        R = np.asarray(random_rots(rng, 16).as_matrix())
        t = rng.normal(size=(16, 3)) * 0.2 + np.array([0, 0, 1.0])
        ours = np.asarray(G.allo_to_ego_mat(jnp.asarray(t), jnp.asarray(R)))
        for i in range(16):
            obj_ray = t[i] / np.linalg.norm(t[i])
            cam_ray = np.array([0.0, 0.0, 1.0])
            angle = np.arccos(np.clip(cam_ray @ obj_ray, -1, 1))
            axis = np.cross(cam_ray, obj_ray)
            axis = axis / np.linalg.norm(axis)
            Rc = Rotation.from_rotvec(axis * angle).as_matrix()
            # eps=1e-4 axis regularization (reference parity) bounds accuracy
            np.testing.assert_allclose(ours[i], Rc @ R[i], atol=2e-3)

    def test_roundtrip(self, rng):
        R = jnp.asarray(random_rots(rng, 16).as_matrix())
        t = jnp.asarray(rng.normal(size=(16, 3)) * 0.2 + np.array([0, 0, 1.0]),
                        dtype=jnp.float32)
        R_ego = G.allo_to_ego_mat(t, R)
        R_back = G.ego_to_allo_mat(t, R_ego)
        np.testing.assert_allclose(np.asarray(R_back), np.asarray(R), atol=1e-4)


class TestProjection:
    def test_project_center(self):
        K = jnp.asarray([[[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]]])
        pts = jnp.zeros((1, 1, 3))
        t = jnp.asarray([[0.0, 0.0, 1.0]])
        R = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        uv = G.project_pts(pts, K, R, t)
        np.testing.assert_allclose(np.asarray(uv[0, 0]), [320.0, 240.0], atol=1e-4)

    def test_backproject_roundtrip(self, rng):
        K = jnp.asarray([[500.0, 0, 32], [0, 500.0, 24], [0, 0, 1]])
        depth = jnp.asarray(rng.uniform(0.5, 2.0, size=(48, 64)), dtype=jnp.float32)
        xyz = G.backproject_depth(depth, K)
        # project back: u = fx*x/z + px
        u = 500.0 * xyz[..., 0] / xyz[..., 2] + 32.0
        v = 500.0 * xyz[..., 1] / xyz[..., 2] + 24.0
        vs, us = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
        np.testing.assert_allclose(np.asarray(u), us, atol=1e-3)
        np.testing.assert_allclose(np.asarray(v), vs, atol=1e-3)


class TestRotAngle:
    def test_known_angle(self):
        R1 = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        R2 = jnp.asarray(Rotation.from_euler("z", 30, degrees=True).as_matrix())[None]
        ang = G.rot_angle_deg(R1, R2)
        np.testing.assert_allclose(np.asarray(ang), [30.0], atol=1e-4)


class TestTransformPts:
    def test_matches_manual(self, rng):
        R = jnp.asarray(random_rots(rng, 4).as_matrix())
        t = jnp.asarray(rng.normal(size=(4, 3)), dtype=jnp.float32)
        pts = jnp.asarray(rng.normal(size=(4, 10, 3)), dtype=jnp.float32)
        out = G.transform_pts(pts, R, t)
        expected = np.einsum("bij,bnj->bni", np.asarray(R), np.asarray(pts)) + np.asarray(t)[:, None]
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
