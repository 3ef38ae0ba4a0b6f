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
