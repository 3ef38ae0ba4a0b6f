"""Weakly-supervised reprojection refiner — test-time pose optimization.

Parity target: core/self6dpp/models/weakly_sup/reprojection_refiner.py:28-448
(RepjRefiner: gradient-descent refinement of (R, t) against 2D evidence —
IoU between the rendered mask and the detected box/mask, PM regularization
to the initial pose, MS-SSIM appearance term; weights at
configs/self6dpp/new_cfg/base.py:246-259).

TPU-native: the whole optimization is a lax.scan of jax.grad steps over the
pose parameterized as (rot6d, t) — one compiled graph instead of a python
Adam loop around a CUDA renderer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.geometry import mat_to_rot6d, rot6d_to_mat, transform_pts
from ..ops.rasterizer import rasterize_batch
from ..ops.ssim import ms_ssim

Array = jax.Array


def _box_iou_from_pose(points: Array, K: Array, rot: Array, trans: Array,
                       box: Array) -> Array:
    """Differentiable IoU between the projected-model bbox at the candidate
    pose and the detected box (the IoU2D3D term,
    reprojection_refiner.py) — box-to-box, so no soft-silhouette halo bias."""
    from ..ops.zoom import bboxes_from_pose
    pb = bboxes_from_pose(points, K, rot, trans)         # (B,4)
    ix1 = jnp.maximum(pb[:, 0], box[:, 0])
    iy1 = jnp.maximum(pb[:, 1], box[:, 1])
    ix2 = jnp.minimum(pb[:, 2], box[:, 2])
    iy2 = jnp.minimum(pb[:, 3], box[:, 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    a1 = (pb[:, 2] - pb[:, 0]) * (pb[:, 3] - pb[:, 1])
    a2 = (box[:, 2] - box[:, 0]) * (box[:, 3] - box[:, 1])
    return inter / jnp.maximum(a1 + a2 - inter, 1.0)


def refine_pose_reprojection(
    rot_init: Array,           # (B, 3, 3)
    trans_init: Array,         # (B, 3)
    verts: Array,              # (B, V, 3) or (V, 3)
    faces: Array,
    colors: Array,
    K: Array,                  # (B, 3, 3) ROI-frame intrinsics
    target_box: Array,         # (B, 4) detected 2D box in the ROI frame
    target_mask: Array | None = None,   # (B, H, W) detected mask
    target_img: Array | None = None,    # (B, H, W, 3) for MS-SSIM term
    height: int = 64, width: int = 64,
    n_steps: int = 50, lr: float = 1e-2,
    w_iou: float = 1.0, w_mask: float = 1.0, w_pm: float = 10.0,
    w_ssim: float = 0.0, raster_kw: dict | None = None,
) -> tuple[Array, Array]:
    """Returns the refined (rot, trans)."""
    rkw = dict(tile_px=16, faces_per_tile=64, sigma_px=1.5)
    if raster_kw:
        rkw.update(raster_kw)
    points = verts if verts.ndim == 3 else jnp.broadcast_to(
        verts, (rot_init.shape[0],) + verts.shape)

    def energy(params):
        rot = rot6d_to_mat(params["r6"])
        trans = params["t"]
        out = rasterize_batch(verts, faces, colors, K, rot, trans,
                              height=height, width=width, **rkw)
        e = 0.0
        if w_iou > 0:
            e = e - w_iou * _box_iou_from_pose(points, K, rot, trans,
                                               target_box).mean()
        if w_mask > 0 and target_mask is not None:
            # masked BCE between the soft silhouette and the detected mask —
            # unlike soft-IoU, the exp halo is penalized symmetrically so the
            # scale (z) gradient points the right way
            p = jnp.clip(out.prob, 1e-6, 1 - 1e-6)
            bce = -(target_mask * jnp.log(p)
                    + (1 - target_mask) * jnp.log(1 - p))
            e = e + w_mask * bce.mean()
        if w_ssim > 0 and target_img is not None:
            m = (target_mask if target_mask is not None else out.mask)[..., None]
            e = e + w_ssim * (1.0 - ms_ssim(out.attr * m, target_img * m))
        if w_pm > 0:
            p_ref = transform_pts(points, rot, trans)
            p_ini = transform_pts(points, rot_init, trans_init)
            e = e + w_pm * jnp.abs(p_ref - p_ini).mean()
        return e

    params = {"r6": mat_to_rot6d(rot_init), "t": trans_init}
    # Adam in-graph
    m0 = jax.tree.map(jnp.zeros_like, params)
    v0 = jax.tree.map(jnp.zeros_like, params)

    def step(carry, i):
        p, m, v = carry
        g = jax.grad(energy)(p)
        m = jax.tree.map(lambda a, b: 0.9 * a + 0.1 * b, m, g)
        v = jax.tree.map(lambda a, b: 0.999 * a + 0.001 * b * b, v, g)
        ii = i.astype(jnp.float32) + 1.0
        mh = jax.tree.map(lambda a: a / (1 - 0.9 ** ii), m)
        vh = jax.tree.map(lambda a: a / (1 - 0.999 ** ii), v)
        p = jax.tree.map(lambda a, mm, vv: a - lr * mm / (jnp.sqrt(vv) + 1e-8),
                         p, mh, vh)
        return (p, m, v), None

    (params, _, _), _ = jax.lax.scan(step, (params, m0, v0),
                                     jnp.arange(n_steps))
    return rot6d_to_mat(params["r6"]), params["t"]
