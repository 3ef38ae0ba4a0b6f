"""RepjRefiner: test-time reprojection optimization must pull a perturbed
pose back toward the pose that explains the 2D evidence."""

import numpy as np
import jax
import jax.numpy as jnp

from self6dpp_tpu.data.meshes import make_icosphere
from self6dpp_tpu.models.repj_refiner import refine_pose_reprojection
from self6dpp_tpu.ops.rasterizer import rasterize_batch


def test_refiner_improves_mask_alignment():
    verts, faces = make_icosphere(radius=0.08, subdivisions=1)
    colors = (verts - verts.min(0)) / np.ptp(verts, 0)
    K = jnp.asarray([[[64.0, 0, 32], [0, 64.0, 32], [0, 0, 1]]])
    R_gt = jnp.broadcast_to(jnp.eye(3), (1, 3, 3)).astype(jnp.float32)
    t_gt = jnp.asarray([[0.0, 0.0, 1.0]])

    # target evidence rendered at the gt pose
    tgt = rasterize_batch(jnp.asarray(verts), jnp.asarray(faces),
                          jnp.asarray(colors), K, R_gt, t_gt,
                          height=64, width=64, tile_px=16, faces_per_tile=64)
    ys, xs = np.nonzero(np.asarray(tgt.mask[0]))
    box = jnp.asarray([[xs.min(), ys.min(), xs.max(), ys.max()]],
                      dtype=jnp.float32)

    # perturbed init: shifted in x and z
    t_init = t_gt + jnp.asarray([[0.06, 0.0, 0.15]])
    rot, trans = refine_pose_reprojection(
        R_gt, t_init, jnp.asarray(verts), jnp.asarray(faces),
        jnp.asarray(colors), K, box, target_mask=tgt.mask,
        height=64, width=64, n_steps=60, lr=5e-3, w_pm=0.1)

    err_before = float(jnp.abs(t_init - t_gt).sum())
    err_after = float(jnp.abs(trans - t_gt).sum())
    assert err_after < err_before, (err_before, err_after)
    # rotation stays valid
    eye = np.asarray(jnp.swapaxes(rot, -1, -2) @ rot)[0]
    np.testing.assert_allclose(eye, np.eye(3), atol=1e-4)


class TestRepjWeakLoss:
    """Multi-view reprojection weak supervision (reference RepjRefiner.forward,
    reprojection_refiner.py:85-310)."""

    def _setup(self, b=3):
        from scipy.spatial.transform import Rotation
        verts, faces = make_icosphere(radius=0.08, subdivisions=1)
        colors = (verts - verts.min(0)) / np.ptp(verts, 0)
        rng = np.random.default_rng(0)
        # b views of the same static scene: T_i = [R_i, t_i]
        gR = Rotation.random(b, random_state=1).as_matrix().astype(np.float32)
        gt = np.stack([np.array([0.02, -0.01, 1.0 + 0.1 * i], np.float32)
                       for i in range(b)])
        K = np.broadcast_to(
            np.array([[280.0, 0, 320], [0, 280.0, 240], [0, 0, 1]],
                     np.float32), (b, 3, 3))
        kw = dict(
            verts=jnp.asarray(np.broadcast_to(verts, (b,) + verts.shape)),
            faces=jnp.asarray(np.broadcast_to(faces, (b,) + faces.shape)),
            colors=jnp.asarray(np.broadcast_to(colors, (b,) + colors.shape)),
            K=jnp.asarray(K),
            points=jnp.asarray(np.broadcast_to(verts[:32], (b, 32, 3))),
            extents=jnp.asarray(np.broadcast_to(np.ptp(verts, 0), (b, 3))),
            gt_rot=jnp.asarray(gR), gt_trans=jnp.asarray(gt),
        )
        probs = jnp.ones((b, 16, 16)) * 0.9
        return kw, probs

    def test_consistent_predictions_minimize(self):
        """pred_i == T_i @ C (a common object-to-world pose C) is perfectly
        multi-view consistent: PM and GIoU terms vanish; the soft-mask IoU
        and MS-SSIM terms sit at their identical-render floor (soft probs
        p·p < p, so soft-IoU of a map with itself is < 1 by construction —
        same as the reference mask_iou_loss.py)."""
        from self6dpp_tpu.models.repj_refiner import repj_weak_loss
        kw, probs = self._setup()
        ld = repj_weak_loss(kw["gt_rot"], kw["gt_trans"], probs, probs, **kw)
        for k, v in ld.items():
            if "miou" in k or "msssim" in k:
                continue
            assert abs(float(v)) < 1e-3, (k, float(v))

    def test_inconsistent_predictions_penalized(self):
        from scipy.spatial.transform import Rotation
        from self6dpp_tpu.models.repj_refiner import repj_weak_loss
        kw, probs = self._setup()
        pert = Rotation.from_euler("y", 40, degrees=True).as_matrix().astype(
            np.float32)
        rot = kw["gt_rot"].at[1].set(jnp.asarray(pert) @ kw["gt_rot"][1])
        trans = kw["gt_trans"].at[1, 0].add(0.05)
        ld = repj_weak_loss(rot, trans, probs, probs, **kw)
        ld0 = repj_weak_loss(kw["gt_rot"], kw["gt_trans"], probs, probs, **kw)
        total = sum(float(v) for v in ld.values())
        total0 = sum(float(v) for v in ld0.values())
        assert np.isfinite(total) and total > total0 + 0.01, (total, total0)
        # gradients exist and are finite
        gr, gt_ = jax.grad(lambda r, t: sum(jax.tree.leaves(
            repj_weak_loss(r, t, probs, probs, **kw))), argnums=(0, 1))(
            rot, trans)
        assert np.isfinite(np.asarray(gr)).all()
        assert np.isfinite(np.asarray(gt_)).all()
