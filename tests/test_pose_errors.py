"""Tests for pose error metrics vs independent numpy/scipy computation."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation
from scipy import spatial

from self6dpp_tpu.ops import pose_errors as E
from self6dpp_tpu.ops import pose_decode as D
from self6dpp_tpu.ops import geometry as G


def make_poses(rng, n):
    R_est = Rotation.random(n, random_state=1).as_matrix()
    R_gt = Rotation.random(n, random_state=2).as_matrix()
    t_est = rng.normal(size=(n, 3)) * 0.05 + np.array([0, 0, 1.0])
    t_gt = t_est + rng.normal(size=(n, 3)) * 0.01
    pts = rng.normal(size=(n, 200, 3)).astype(np.float32) * 0.05
    return map(jnp.asarray, (R_est, t_est, R_gt, t_gt, pts))


def test_add_matches_numpy(rng):
    R_est, t_est, R_gt, t_gt, pts = make_poses(rng, 8)
    ours = np.asarray(E.add_error(R_est, t_est, R_gt, t_gt, pts))
    for i in range(8):
        pe = np.asarray(pts[i]) @ np.asarray(R_est[i]).T + np.asarray(t_est[i])
        pg = np.asarray(pts[i]) @ np.asarray(R_gt[i]).T + np.asarray(t_gt[i])
        expected = np.linalg.norm(pe - pg, axis=1).mean()
        np.testing.assert_allclose(ours[i], expected, rtol=1e-4)


def test_adi_matches_kdtree(rng):
    """Exact parity with the reference's cKDTree nearest-neighbor approach
    (lib/pysixd/pose_error.py:274-297)."""
    R_est, t_est, R_gt, t_gt, pts = make_poses(rng, 4)
    ours = np.asarray(E.adi_error(R_est, t_est, R_gt, t_gt, pts))
    for i in range(4):
        pe = np.asarray(pts[i]) @ np.asarray(R_est[i]).T + np.asarray(t_est[i])
        pg = np.asarray(pts[i]) @ np.asarray(R_gt[i]).T + np.asarray(t_gt[i])
        nn_dists, _ = spatial.cKDTree(pe).query(pg, k=1)
        np.testing.assert_allclose(ours[i], nn_dists.mean(), rtol=1e-3, atol=1e-6)


def test_re_te(rng):
    R1 = jnp.asarray(Rotation.from_euler("y", 10, degrees=True).as_matrix())[None]
    R2 = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    np.testing.assert_allclose(np.asarray(E.re_error(R1, R2)), [10.0], atol=1e-3)
    t1 = jnp.asarray([[0.0, 0.03, 1.0]])
    t2 = jnp.asarray([[0.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(E.te_error(t1, t2)), [0.03], atol=1e-6)


def test_proj_error_zero_for_same_pose(rng):
    R_est, t_est, _, _, pts = make_poses(rng, 4)
    K = jnp.broadcast_to(
        jnp.asarray([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]]), (4, 3, 3)
    )
    errs = np.asarray(E.proj_error(R_est, t_est, R_est, t_est, K, pts))
    np.testing.assert_allclose(errs, 0.0, atol=1e-3)


def test_recall_table_protocol():
    add = np.array([0.001, 0.003, 0.02])  # diameter 0.1 -> 2%=0.002, 10%=0.01
    re = np.array([1.0, 4.0, 20.0])
    te = np.array([0.01, 0.04, 0.2])
    proj = np.array([1.0, 4.0, 20.0])
    tab = E.recall_table(add, re, te, proj, diameter=0.1)
    assert tab["ad_2"] == 100.0 / 3
    assert tab["ad_10"] == 200.0 / 3
    assert tab["rete_2"] == 100.0 / 3
    assert tab["rete_5"] == 200.0 / 3
    assert tab["proj_5"] == 200.0 / 3
    np.testing.assert_allclose(tab["re"], re.mean())


def test_auc_add_perfect():
    assert E.auc_add(np.zeros(10)) > 99.0
    assert E.auc_add(np.full(10, 1.0)) == 0.0


def test_pose_decode_consistency(rng):
    """SITE decode: projecting decoded t back through K recovers the centroid."""
    n = 8
    K = jnp.broadcast_to(
        jnp.asarray([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]]), (n, 3, 3)
    ).astype(jnp.float32)
    rot = jnp.asarray(Rotation.random(n, random_state=3).as_matrix(), dtype=jnp.float32)
    centroid = jnp.asarray(rng.uniform(-0.2, 0.2, (n, 2)), dtype=jnp.float32)
    z_rel = jnp.asarray(rng.uniform(0.8, 1.2, (n, 1)), dtype=jnp.float32)
    roi_center = jnp.asarray(rng.uniform(100, 500, (n, 2)), dtype=jnp.float32)
    ratio = jnp.asarray(rng.uniform(0.5, 2.0, (n,)), dtype=jnp.float32)
    roi_wh = jnp.asarray(rng.uniform(50, 200, (n, 2)), dtype=jnp.float32)

    R_ego, t = D.pose_from_centroid_z(rot, centroid, z_rel, K, roi_center, ratio, roi_wh)
    # z is z_rel * ratio
    np.testing.assert_allclose(np.asarray(t[:, 2]), np.asarray(z_rel[:, 0] * ratio), rtol=1e-5)
    # projecting t gives back the absolute centroid
    uv = np.asarray(G.project_pts(jnp.zeros((n, 1, 3)), K, R_ego, t))[:, 0]
    expected_c = np.asarray(centroid * roi_wh + roi_center)
    np.testing.assert_allclose(uv, expected_c, rtol=1e-3, atol=0.1)
    # rotation stays a rotation
    eye = np.asarray(jnp.swapaxes(R_ego, -1, -2) @ R_ego)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (n, 3, 3)), atol=1e-4)


def test_mssd_sym_aware(rng):
    """With a z-flip symmetry, a 180°-z-rotated estimate has mssd ~ 0."""
    from scipy.spatial.transform import Rotation as Rot
    pts = jnp.asarray(rng.normal(size=(1, 64, 3)) * 0.05, dtype=jnp.float32)
    R_gt = jnp.broadcast_to(jnp.eye(3), (1, 3, 3)).astype(jnp.float32)
    t = jnp.asarray([[0.0, 0.0, 1.0]])
    flip = jnp.asarray(np.diag([-1.0, -1.0, 1.0]), dtype=jnp.float32)
    R_est = (flip[None] @ R_gt)
    sym_id = jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3)).astype(jnp.float32)
    sym_flip = sym_id.at[:, 1].set(flip)
    valid = jnp.asarray([[True, True]])
    e_with = float(E.mssd_error(R_est, t, R_gt, t, pts, sym_flip, valid)[0])
    e_wo = float(E.mssd_error(R_est, t, R_gt, t, pts, sym_id,
                              jnp.asarray([[True, False]]))[0])
    assert e_with < 1e-5 and e_wo > 0.01


def test_mspd_zero_same_pose(rng):
    pts = jnp.asarray(rng.normal(size=(1, 32, 3)) * 0.05, dtype=jnp.float32)
    R = jnp.broadcast_to(jnp.eye(3), (1, 3, 3)).astype(jnp.float32)
    t = jnp.asarray([[0.0, 0.0, 1.0]])
    K = jnp.asarray([[[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]]])
    sym = jnp.broadcast_to(jnp.eye(3), (1, 1, 3, 3)).astype(jnp.float32)
    e = float(E.mspd_error(R, t, R, t, K, pts, sym, jnp.asarray([[True]]))[0])
    assert e < 1e-3


def test_vsd_basic():
    d_gt = jnp.ones((1, 8, 8)) * 1.0
    d_obs = d_gt
    # same depth -> 0; offset by 0.1 (> tau 0.05) -> all-wrong
    e0 = float(E.vsd_error(d_gt, d_gt, d_obs)[0, 0])
    e1 = float(E.vsd_error(d_gt + 0.1, d_gt, d_obs)[0, 0])
    assert e0 == 0.0
    assert e1 == 1.0


def test_depth_to_dist():
    """dist = depth * |ray| (misc.depth_im_to_dist_im_fast): identity at the
    principal point, hand-computed off-center."""
    K = jnp.asarray([[100.0, 0, 1.0], [0, 100.0, 1.0], [0, 0, 1.0]])
    depth = jnp.full((3, 3), 2.0)
    dist = E.depth_to_dist(depth, K)
    assert float(dist[1, 1]) == pytest.approx(2.0)
    # pixel (0,0): xn = yn = -0.01 -> ray = sqrt(1 + 2e-4)
    assert float(dist[0, 0]) == pytest.approx(2.0 * np.sqrt(1.0 + 2e-4))


def test_vsd_bop19_handcheck():
    """Exact BOP19 step-cost semantics (pose_error.py:88-128) on a 2x2
    hand case: visib union 3 px, intersection 2 px, one non-overlap pixel
    always costs 1."""
    d_gt = jnp.asarray([[[1.0, 1.0], [0.0, 0.0]]])
    d_est = jnp.asarray([[[1.0, 1.05], [0.3, 0.0]]])
    d_obs = jnp.zeros((1, 2, 2))
    e = E.vsd_error(d_est, d_gt, d_obs, taus=(0.1, 0.04), delta=0.05)
    assert e.shape == (1, 2)
    assert float(e[0, 0]) == pytest.approx(1.0 / 3.0)   # tau=0.1: comp only
    assert float(e[0, 1]) == pytest.approx(2.0 / 3.0)   # tau=0.04: + 1 px
    # empty union -> 1.0 (pose_error.py:111-112)
    z = jnp.zeros((1, 2, 2))
    assert float(E.vsd_error(z, z, z, taus=(0.1,))[0, 0]) == 1.0


def test_bop19_average_recalls_handcheck():
    """AR aggregation over the BOP19 grids, hand-computed."""
    vsd = np.stack([np.zeros(10), np.ones(10)])          # perfect / all-wrong
    mssd = np.asarray([0.011, 10.0])                     # m; diam 0.2
    mspd = np.asarray([4.0, 1000.0])                     # px; width 640
    s = E.bop19_average_recalls(vsd, mssd, mspd, diameter=0.2, im_width=640)
    assert s["ar_vsd"] == pytest.approx(50.0)
    # mssd/diam = [0.055, 50]: th=0.05 fails both, th>=0.10 passes first
    assert s["ar_mssd"] == pytest.approx(45.0)
    assert s["ar_mspd"] == pytest.approx(50.0)
    assert s["bop19_ar"] == pytest.approx((50.0 + 45.0 + 50.0) / 3.0)
    empty = E.bop19_average_recalls(np.zeros((0, 10)), np.zeros(0),
                                    np.zeros(0), 0.2, 640)
    assert empty["bop19_ar"] == 0.0
