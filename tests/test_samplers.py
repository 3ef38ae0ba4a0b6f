"""Sampler behavior tests."""

import itertools

import numpy as np

from self6dpp_tpu.data import samplers as S


def take(it, n):
    return list(itertools.islice(it, n))


def test_training_sampler_covers_epoch():
    idx = take(S.training_sampler(10, seed=0), 20)
    assert sorted(idx[:10]) == list(range(10))
    assert sorted(idx[10:]) == list(range(10))


def test_repeat_factor_rebalances():
    # category 0 appears 90x, category 1 10x
    cats = np.array([0] * 90 + [1] * 10)
    rf = S.repeat_factors_from_category_frequency(cats, repeat_thresh=0.5)
    assert rf[-1] > rf[0]            # rare category repeated more
    idx = take(S.repeat_factor_sampler(rf, seed=0), 500)
    counts = np.bincount(np.asarray(cats)[idx])
    assert counts[1] / counts[0] > 10 / 90    # ratio improved

def test_inference_sampler():
    assert take(S.inference_sampler(5), 10) == [0, 1, 2, 3, 4]


def test_subset_sampler_weights():
    w = np.array([0.0, 0.0, 1.0, 1.0])
    idx = take(S.infinite_subset_random_sampler(4, 0.5, seed=0, weights=w), 40)
    assert set(idx) <= {2, 3}


def test_batch_separated():
    gids = np.array([0] * 8 + [1] * 8)
    batches = take(S.batch_separated_batches(gids, 4, seed=0), 4)
    for b in batches:
        groups = set(gids[b])
        assert len(groups) == 1


# ---- pose/depth augmentation -------------------------------------------

def test_perturb_poses():
    from scipy.spatial.transform import Rotation
    from self6dpp_tpu.data.pose_aug import perturb_poses
    rng = np.random.default_rng(0)
    R = Rotation.random(16, random_state=0).as_matrix().astype(np.float32)
    t = np.tile([[0, 0, 1.0]], (16, 1)).astype(np.float32)
    R2, t2 = perturb_poses(R, t, rng)
    # still rotations
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", R2, R2),
        np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
    assert 0 < np.abs(t2 - t).max() < 0.3


def test_aug_depth():
    from self6dpp_tpu.data.pose_aug import aug_depth
    rng = np.random.default_rng(0)
    d = np.full((64, 64), 1.0, np.float32)
    d2 = aug_depth(d, rng)
    assert (d2 == 0).sum() > 0            # some dropout
    assert abs(d2[d2 > 0].mean() - 1.0) < 0.01
