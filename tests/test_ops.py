"""Tests for zoom / chamfer / flow / fps / ssim / color ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import spatial

from self6dpp_tpu.ops import chamfer, color, flow, fps, ssim, zoom


class TestZoom:
    def test_crop_resize_identity(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), dtype=jnp.float32)
        boxes = jnp.asarray([[0, 0, 16, 16]] * 2, dtype=jnp.float32)
        out = zoom.crop_resize(img, boxes, 16, 16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_crop_resize_upsample_constant(self):
        img = jnp.ones((1, 8, 8, 1))
        out = zoom.crop_resize(img, jnp.asarray([[2, 2, 6, 6]], dtype=jnp.float32), 8, 8)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)

    def test_zoom_K_roundtrip(self):
        K = jnp.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        boxes = jnp.asarray([[100.0, 100.0, 356.0, 292.0]])  # 256x192 crop
        Kz = zoom.zoom_K(K, boxes, (96, 128))
        # a point projecting at (100,100) in the full image lands at (0,0)
        np.testing.assert_allclose(float(Kz[0, 0, 2]), (320 - 100) * 128 / 256., rtol=1e-5)
        np.testing.assert_allclose(float(Kz[0, 0, 0]), 500 * 128 / 256., rtol=1e-5)

    def test_deepim_boxes_square_and_ratio(self):
        ren_boxes = jnp.asarray([[10.0, 20.0, 50.0, 60.0]])
        centers = jnp.asarray([[30.0, 40.0]])
        boxes, ratios = zoom.deepim_boxes(ren_boxes, centers, lamb=1.4,
                                          out_hw=(64, 64))
        b = np.asarray(boxes)[0]
        assert b[2] - b[0] == pytest.approx(b[3] - b[1])          # square
        assert b[2] - b[0] == pytest.approx(2 * 20 * 1.4)
        assert np.asarray(ratios)[0, 0] == pytest.approx(64 / (2 * 20 * 1.4))

    def test_bboxes_from_pose(self):
        pts = jnp.asarray(np.array([[[-0.05, -0.05, 0], [0.05, 0.05, 0]]],
                                   dtype=np.float32))
        K = jnp.asarray([[[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]]])
        R = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        t = jnp.asarray([[0.0, 0.0, 1.0]])
        box = np.asarray(zoom.bboxes_from_pose(pts, K, R, t))[0]
        np.testing.assert_allclose(box, [27, 27, 37, 37], atol=1e-4)


class TestChamfer:
    def test_matches_kdtree(self, rng):
        p1 = rng.normal(size=(2, 64, 3)).astype(np.float32)
        p2 = rng.normal(size=(2, 48, 3)).astype(np.float32)
        d1, d2 = chamfer.nn_distance(jnp.asarray(p1), jnp.asarray(p2))
        for b in range(2):
            dd1, _ = spatial.cKDTree(p2[b]).query(p1[b], k=1)
            dd2, _ = spatial.cKDTree(p1[b]).query(p2[b], k=1)
            np.testing.assert_allclose(np.asarray(d1[b]), dd1 ** 2, rtol=1e-3, atol=1e-5)
            np.testing.assert_allclose(np.asarray(d2[b]), dd2 ** 2, rtol=1e-3, atol=1e-5)

    def test_masked_points_ignored(self, rng):
        p1 = rng.normal(size=(1, 8, 3)).astype(np.float32)
        p2 = np.concatenate([p1, 100 + rng.normal(size=(1, 8, 3)).astype(np.float32)], 1)
        w2 = np.concatenate([np.ones((1, 8)), np.zeros((1, 8))], 1).astype(np.float32)
        d1, d2 = chamfer.nn_distance(jnp.asarray(p1), jnp.asarray(p2),
                                     w2=jnp.asarray(w2))
        np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-5)
        # invalid rows of p2 must report 0 (excluded), not huge distances
        assert np.asarray(d2)[0, 8:].max() == 0.0

    def test_threshold_filter(self):
        p1 = jnp.asarray([[[0.0, 0, 0], [5.0, 0, 0]]])
        p2 = jnp.asarray([[[0.0, 0, 0], [0.1, 0, 0]]])
        full = chamfer.chamfer_loss(p1, p2)
        filt = chamfer.chamfer_loss(p1, p2, dist_thr=0.5)
        assert float(filt) < float(full)

    def test_grad_flows(self, rng):
        p1 = jnp.asarray(rng.normal(size=(1, 16, 3)), dtype=jnp.float32)
        p2 = jnp.asarray(rng.normal(size=(1, 16, 3)), dtype=jnp.float32)
        g = jax.grad(lambda a: chamfer.chamfer_loss(a, p2))(p1)
        assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


class TestFlow:
    def test_identity_pose_zero_flow(self, rng):
        d = jnp.asarray(rng.uniform(0.5, 1.5, (1, 16, 16)), dtype=jnp.float32)
        K = jnp.asarray([[[100.0, 0, 8], [0, 100.0, 8], [0, 0, 1]]])
        R = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        t = jnp.zeros((1, 3))
        KT, Kinv = flow.relative_pose_KT(K, R, t, R, t)
        fl, valid = flow.flow_from_depth(d, d, KT, Kinv)
        np.testing.assert_allclose(np.asarray(fl), 0.0, atol=1e-4)
        assert np.asarray(valid).mean() > 0.9

    def test_x_translation_flow(self):
        """Plane at z=1; shifting camera-frame target by tx=0.01 with f=100
        shifts pixels by +1 in u; flow = (dh, dw) = (0, 1)."""
        H = W = 16
        d = jnp.ones((1, H, W))
        K = jnp.asarray([[[100.0, 0, 8], [0, 100.0, 8], [0, 0, 1]]])
        R = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        t_src = jnp.zeros((1, 3))
        t_tgt = jnp.asarray([[0.01, 0.0, 0.0]])
        KT, Kinv = flow.relative_pose_KT(K, R, t_src, R, t_tgt)
        fl, valid = flow.flow_from_depth(d, d, KT, Kinv)
        v = np.asarray(valid)
        f = np.asarray(fl)
        inb = v > 0
        assert inb.sum() > 0
        np.testing.assert_allclose(f[inb][:, 1], 1.0, atol=1e-3)   # dw
        np.testing.assert_allclose(f[inb][:, 0], 0.0, atol=1e-3)   # dh

    def test_depth_mismatch_invalid(self):
        d1 = jnp.ones((1, 8, 8))
        d2 = jnp.ones((1, 8, 8)) * 2.0
        K = jnp.asarray([[[100.0, 0, 4], [0, 100.0, 4], [0, 0, 1]]])
        R = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        t = jnp.zeros((1, 3))
        KT, Kinv = flow.relative_pose_KT(K, R, t, R, t)
        _, valid = flow.flow_from_depth(d1, d2, KT, Kinv)
        assert float(valid.sum()) == 0.0


class TestFPS:
    def test_native_matches_numpy(self, rng):
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        a = fps.fps_numpy(pts, 16)
        b = fps.farthest_point_sampling(pts, 16)
        np.testing.assert_array_equal(a, b)

    def test_spread(self, rng):
        """FPS points should be farther apart than random points."""
        pts = rng.uniform(0, 1, (1000, 3)).astype(np.float32)
        sel = fps.fps_points(pts, 8)
        dmin_fps = spatial.distance.pdist(sel).min()
        dmin_rand = spatial.distance.pdist(pts[:8]).min()
        assert dmin_fps > dmin_rand

    def test_xyz_to_region(self):
        fps_pts = np.array([[0, 0, 0], [1, 1, 1]], dtype=np.float32)
        xyz = np.zeros((2, 2, 3), dtype=np.float32)
        xyz[1, 1] = [1, 1, 1]
        mask = np.array([[1, 0], [0, 1]])
        region = fps.xyz_to_region(xyz, fps_pts, mask)
        assert region[0, 0] == 1 and region[1, 1] == 2
        assert region[0, 1] == 0 and region[1, 0] == 0


class TestSSIM:
    def test_identical_images(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), dtype=jnp.float32)
        assert float(ssim.ssim(img, img)) == pytest.approx(1.0, abs=1e-4)
        assert float(ssim.ms_ssim(img, img)) == pytest.approx(1.0, abs=1e-3)

    def test_noise_lowers_ssim(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)), dtype=jnp.float32)
        noisy = img + jnp.asarray(rng.normal(0, 0.2, (1, 64, 64, 1)), dtype=jnp.float32)
        s = float(ssim.ssim(img, noisy))
        assert 0.0 < s < 0.9

    def test_matches_skimage(self, rng):
        pytest.importorskip("skimage")
        from skimage.metrics import structural_similarity
        a = rng.uniform(0, 1, (64, 64)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, (64, 64)).astype(np.float32), 0, 1)
        ours = float(ssim.ssim(jnp.asarray(a)[None, ..., None],
                               jnp.asarray(b)[None, ..., None]))
        ref = structural_similarity(a, b, win_size=11, gaussian_weights=True,
                                    sigma=1.5, use_sample_covariance=False,
                                    data_range=1.0)
        assert ours == pytest.approx(ref, abs=2e-2)

    def test_grad(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), dtype=jnp.float32)
        tgt = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), dtype=jnp.float32)
        g = jax.grad(lambda x: ssim.ssim_loss(x, tgt))(img)
        assert np.isfinite(np.asarray(g)).all()

    def test_blur_matches_conv(self, rng):
        """The lane-major shift-add blur == depthwise gaussian conv."""
        x = jnp.asarray(rng.uniform(0, 1, (2, 3, 40, 48)), dtype=jnp.float32)
        win = ssim._gaussian_kernel(11, 1.5)
        got = ssim._blur(x, win)
        k2d = np.outer(win, win)[:, :, None, None].astype(np.float32)
        ref = jax.lax.conv_general_dilated(
            x.reshape(6, 1, 40, 48), jnp.asarray(k2d), (1, 1), "VALID",
            dimension_numbers=("NCHW", "HWIO", "NCHW"))
        np.testing.assert_allclose(np.asarray(got).reshape(6, 1, 30, 38),
                                   np.asarray(ref), rtol=1e-5, atol=1e-6)


class TestColor:
    def test_lab_reference_values(self):
        # white -> L=100, a=b=0; black -> 0,0,0
        white = jnp.ones((1, 1, 3))
        black = jnp.zeros((1, 1, 3))
        np.testing.assert_allclose(np.asarray(color.rgb_to_lab(white))[0, 0],
                                   [100.0, 0, 0], atol=0.5)
        np.testing.assert_allclose(np.asarray(color.rgb_to_lab(black))[0, 0],
                                   [0.0, 0, 0], atol=0.5)

    def test_lab_matches_skimage(self, rng):
        pytest.importorskip("skimage")
        from skimage.color import rgb2lab
        img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
        ours = np.asarray(color.rgb_to_lab(jnp.asarray(img)))
        ref = rgb2lab(img)
        np.testing.assert_allclose(ours, ref, atol=0.5)

    def test_lab_loss_masked(self, rng):
        a = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), dtype=jnp.float32)
        b = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), dtype=jnp.float32)
        mask = jnp.zeros((1, 8, 8))
        assert float(color.lab_loss(a, b, mask)) == 0.0
        assert float(color.lab_loss(a, b)) > 0.0

    def test_gray_and_hsv(self, rng):
        img = jnp.asarray(rng.uniform(0, 1, (2, 4, 4, 3)), dtype=jnp.float32)
        assert color.rgb_to_gray(img).shape == (2, 4, 4, 1)
        hsv = np.asarray(color.rgb_to_hsv(img))
        assert hsv.min() >= 0 and hsv.max() <= 1.0 + 1e-6


class TestAffineWarp:
    """ops.warp — in-graph POSE_VARIATED_AUG (lib/utils/aug_utils.py:36-67)."""

    def test_identity(self, rng):
        from self6dpp_tpu.ops import warp
        img = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), jnp.float32)
        eye = jnp.broadcast_to(jnp.asarray([[1.0, 0, 0], [0, 1, 0]]), (2, 2, 3))
        out = np.asarray(warp.affine_warp(img, eye))
        np.testing.assert_allclose(out, np.asarray(img), atol=1e-5)

    def test_translation_shifts_pixels(self, rng):
        from self6dpp_tpu.ops import warp
        img = np.zeros((1, 8, 8, 1), np.float32)
        img[0, 4, 4, 0] = 1.0
        # dst->src: src_x = dst_x - 2px  => content moves +2 px in x
        m = jnp.asarray([[[1.0, 0, -2 * 2.0 / 8], [0, 1, 0]]])
        out = np.asarray(warp.affine_warp(jnp.asarray(img), m))
        assert out[0, 4, 6, 0] == pytest.approx(1.0, abs=1e-5)
        assert out[0, 4, 4, 0] == pytest.approx(0.0, abs=1e-5)

    def test_invert_roundtrip(self, rng):
        from self6dpp_tpu.ops import warp
        rot = jnp.asarray(rng.uniform(-3, 3, (4,)), jnp.float32)
        sc = jnp.asarray(rng.uniform(0.7, 1.3, (4, 2)), jnp.float32)
        tr = jnp.asarray(rng.uniform(-0.2, 0.2, (4, 2)), jnp.float32)
        m = warp.make_affine(rot, sc, tr)
        mi = warp.invert_affine(m)
        # compose: A @ [Ainv | ti] should be identity
        comp_lin = np.einsum("bij,bjk->bik", np.asarray(m[:, :, :2]),
                             np.asarray(mi[:, :, :2]))
        np.testing.assert_allclose(
            comp_lin, np.broadcast_to(np.eye(2), (4, 2, 2)), atol=1e-5)
        t_comp = np.einsum("bij,bj->bi", np.asarray(m[:, :, :2]),
                           np.asarray(mi[:, :, 2])) + np.asarray(m[:, :, 2])
        np.testing.assert_allclose(t_comp, np.zeros((4, 2)), atol=1e-5)

    def test_rotation_90deg(self):
        from self6dpp_tpu.ops import warp
        img = np.zeros((1, 8, 8, 1), np.float32)
        img[0, 1, 4, 0] = 1.0                  # above center (y small)
        fwd = warp.make_affine(jnp.asarray([np.pi / 2]),
                               jnp.ones((1, 2)), jnp.zeros((1, 2)))
        out = np.asarray(warp.affine_warp(
            img, warp.invert_affine(fwd), mode="nearest"))
        # +90° (x,y)->(-y,x): the pixel above center moves right of center
        assert out[0, 4, 6, 0] == pytest.approx(1.0)
        assert out[0, 1, 4, 0] == 0.0

    def test_oob_zero_and_mask_warp(self, rng):
        from self6dpp_tpu.ops import warp
        img = jnp.ones((1, 8, 8, 1), jnp.float32)
        big = warp.make_affine(jnp.zeros(1), jnp.full((1, 2), 2.0),
                               jnp.zeros((1, 2)))  # dst->src zoom-out x2
        out = np.asarray(warp.affine_warp(img, big))
        assert out[0, 0, 0, 0] == 0.0              # corners sample OOB
        assert out[0, 4, 4, 0] == pytest.approx(1.0)

    def test_sampler_shapes(self):
        from self6dpp_tpu.ops import warp
        m = warp.sample_pose_variated_affines(jax.random.PRNGKey(0), 6)
        assert m.shape == (6, 2, 3)
        assert np.isfinite(np.asarray(m)).all()


class TestLuvYuv:
    def test_yuv_known_values(self):
        from self6dpp_tpu.ops import color
        white = jnp.ones((1, 1, 3))
        yuv = np.asarray(color.rgb_to_yuv(white))[0, 0]
        assert yuv[0] == pytest.approx(1.0, abs=1e-3)
        assert abs(yuv[1]) < 1e-3 and abs(yuv[2]) < 1e-3

    def test_luv_white_point(self):
        from self6dpp_tpu.ops import color
        white = jnp.ones((1, 1, 3))
        luv = np.asarray(color.rgb_to_luv(white))[0, 0]
        assert luv[0] == pytest.approx(100.0, abs=0.5)
        assert abs(luv[1]) < 1.0 and abs(luv[2]) < 1.0

    def test_luv_matches_skimage(self, rng):
        pytest.importorskip("skimage")
        from skimage.color import rgb2luv
        from self6dpp_tpu.ops import color
        img = rng.uniform(0.05, 1, (6, 6, 3)).astype(np.float32)
        ours = np.asarray(color.rgb_to_luv(jnp.asarray(img)))
        np.testing.assert_allclose(ours, rgb2luv(img), atol=0.7)


def test_batch_twins_match_single(rng):
    """The loader finish-stage batch forms (xyz_to_region_batch,
    compute_vf_np_batch) are element-wise identical to the per-sample
    functions they replace."""
    from self6dpp_tpu.ops import fps
    from self6dpp_tpu.data.loader import compute_vf_np, compute_vf_np_batch
    from scipy.spatial.transform import Rotation

    B, h, w, Kc = 3, 9, 9, 5
    xyz = rng.normal(size=(B, h, w, 3)).astype(np.float32) * 0.05
    centers = rng.normal(size=(B, Kc, 3)).astype(np.float32) * 0.05
    mask = (rng.random((B, h, w)) > 0.4).astype(np.float32)
    rb = fps.xyz_to_region_batch(xyz, centers, mask)
    for i in range(B):
        np.testing.assert_array_equal(
            rb[i], fps.xyz_to_region(xyz[i], centers[i], mask[i]))

    f, o = 4, 8
    fpsb = rng.normal(size=(B, f, 3)).astype(np.float32) * 0.05
    K = np.broadcast_to(np.asarray(
        [[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]], np.float32),
        (B, 3, 3)).copy()
    R = Rotation.random(B, random_state=3).as_matrix().astype(np.float32)
    t = np.asarray([[0.02, -0.01, 0.9]] * B, np.float32)
    center = rng.uniform(30, 90, (B, 2)).astype(np.float32)
    scale = rng.uniform(20, 50, (B,)).astype(np.float32)
    m = (rng.random((B, o, o)) > 0.3).astype(np.float32)
    vb = compute_vf_np_batch(fpsb, K, R, t, center, scale, o, m)
    for i in range(B):
        np.testing.assert_allclose(
            vb[i], compute_vf_np(fpsb[i], K[i], R[i], t[i], center[i],
                                 scale[i], o, m[i]), rtol=1e-5, atol=1e-6)


class TestLabPallas:
    """ops/lab_pallas.py: the fused LAB (value, gradient) kernel must match
    jax autodiff of ops/color.py::lab_loss exactly (interpret mode on CPU)."""

    @pytest.mark.parametrize("no_l", [True, False])
    def test_value_and_grad_parity(self, no_l):
        from self6dpp_tpu.ops.lab_pallas import lab_value_grad_pallas
        rng = np.random.default_rng(0)
        B, S = 2, 16
        pred = jnp.asarray(rng.random((B, S, S, 3)), jnp.float32)
        gt = jnp.asarray(rng.random((B, S, S, 3)), jnp.float32)
        mask = jnp.asarray((rng.random((B, S, S)) > 0.4), jnp.float32)
        # masked inputs like the engine's (ren_m, img_m, vis) triple
        pm = pred * mask[..., None]
        gm = gt * mask[..., None]

        ref_val, ref_g = jax.value_and_grad(
            lambda x: color.lab_loss(x, gm, mask=mask, no_l=no_l))(pm)
        val, g = lab_value_grad_pallas(pm, gm, mask, no_l=no_l,
                                       interpret=True)
        np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref_g),
                                   rtol=1e-4, atol=1e-6)

    def test_empty_mask(self):
        from self6dpp_tpu.ops.lab_pallas import lab_value_grad_pallas
        B, S = 1, 8
        z = jnp.zeros((B, S, S, 3), jnp.float32)
        val, g = lab_value_grad_pallas(z, z, jnp.zeros((B, S, S)),
                                       interpret=True)
        assert float(val) == 0.0
        assert not np.asarray(jnp.isnan(g)).any()

    def test_multi_chunk_grid(self):
        """Grid > 1 (lane-chunk walk) must accumulate val/msum correctly."""
        from self6dpp_tpu.ops.lab_pallas import lab_value_grad_pallas
        rng = np.random.default_rng(1)
        B, S = 2, 128                      # n=16384 -> chunk 8192, grid 2
        pred = jnp.asarray(rng.random((B, S, S, 3)), jnp.float32)
        gt = jnp.asarray(rng.random((B, S, S, 3)), jnp.float32)
        mask = jnp.asarray((rng.random((B, S, S)) > 0.5), jnp.float32)
        pm, gm = pred * mask[..., None], gt * mask[..., None]
        ref_val, ref_g = jax.value_and_grad(
            lambda x: color.lab_loss(x, gm, mask=mask))(pm)
        val, g = lab_value_grad_pallas(pm, gm, mask, interpret=True)
        np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref_g),
                                   rtol=1e-4, atol=1e-6)
