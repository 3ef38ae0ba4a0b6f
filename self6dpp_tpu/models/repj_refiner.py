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

from ..losses.pm_loss import pm_loss
from ..ops.geometry import mat_to_rot6d, rot6d_to_mat, transform_pts
from ..ops.rasterizer import rasterize_batch
from ..ops.ssim import ms_ssim
from ..ops.zoom import bboxes_from_pose

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


# ---------------------------------------------------------------------------
# Multi-view reprojection weak supervision (the stage-II RepjRefiner hook)
# ---------------------------------------------------------------------------

def _giou_loss(box1: Array, box2: Array) -> Array:
    """Per-sample GIoU loss between x1y1x2y2 boxes (bbox_iou_loss.py giou)."""
    ix1 = jnp.maximum(box1[:, 0], box2[:, 0])
    iy1 = jnp.maximum(box1[:, 1], box2[:, 1])
    ix2 = jnp.minimum(box1[:, 2], box2[:, 2])
    iy2 = jnp.minimum(box1[:, 3], box2[:, 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    a1 = (box1[:, 2] - box1[:, 0]) * (box1[:, 3] - box1[:, 1])
    a2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    union = jnp.maximum(a1 + a2 - inter, 1e-6)
    iou = inter / union
    # smallest enclosing box
    cx1 = jnp.minimum(box1[:, 0], box2[:, 0])
    cy1 = jnp.minimum(box1[:, 1], box2[:, 1])
    cx2 = jnp.maximum(box1[:, 2], box2[:, 2])
    cy2 = jnp.maximum(box1[:, 3], box2[:, 3])
    c = jnp.maximum((cx2 - cx1) * (cy2 - cy1), 1e-6)
    return 1.0 - (iou - (c - union) / c)


def _compose_rt(Ra: Array, ta: Array, Rb: Array, tb: Array):
    """[Ra ta] @ [Rb tb] for rigid 3x4 transforms (batched)."""
    R = jnp.einsum("bij,bjk->bik", Ra, Rb)
    t = jnp.einsum("bij,bj->bi", Ra, tb) + ta
    return R, t


def repj_weak_loss(
    rot: Array,                # (B,3,3) student predicted rotations (grad)
    trans: Array,              # (B,3) student predicted translations (grad)
    vis_prob: Array,           # (B,h,w) predicted visible-mask probs
    full_prob: Array,          # (B,h,w) predicted full/amodal-mask probs
    gt_rot: Array,             # (B,3,3) scene poses — used ONLY as relative
    gt_trans: Array,           # (B,3)   camera extrinsics between the views
    verts: Array,              # (B,V,3) mesh verts per sample
    faces: Array,              # (B,F,3)
    colors: Array,             # (B,V,3)
    K: Array,                  # (B,3,3) full-frame intrinsics
    points: Array,             # (B,N,3) PM-loss model points
    extents: Array,            # (B,3)
    sym_rots: Array | None = None,
    sym_valid: Array | None = None,
    render_res: int = 64,
    full_hw: tuple[int, int] = (480, 640),
    scales: tuple[int, ...] = (1, 2, 4),
    w_iou2d3d: float = 0.1, w_pm: float = 10.0,
    w_miou: float = 1.0, w_msssim: float = 1.0,
    raster_kw: dict | None = None,
) -> dict[str, Array]:
    """Multi-view reprojection-consistency weak supervision.

    Parity target: RepjRefiner.forward
    (core/self6dpp/models/weakly_sup/reprojection_refiner.py:85-310), called
    from the pose-mode stage-II step (self_engine.py:549-569). A batch holds
    same-object instances from different views of static scenes; the GT poses
    enter only as relative camera extrinsics T_best @ inv(T_i) (weak
    supervision — no absolute pose label is used). The best view (highest
    vis/full mask cosine agreement) anchors: its detached pose, reprojected
    into every other view, must agree with each view's own prediction under
    multi-scale rendered-mask IoU, MS-SSIM, PM, and projected-bbox GIoU.

    TPU-first: fixed shapes — the reference drops the best index from the
    reprojected set (python list surgery); here all B entries stay and the
    best entry contributes ~0 (its reprojection is the identity, so both
    sides coincide), keeping the whole hook one compiled graph.
    """
    rkw = dict(tile_px=16, faces_per_tile=64, sigma_px=1.5)
    if raster_kw:
        rkw.update(raster_kw)
    B = rot.shape[0]

    # ---- best view: cosine similarity between vis and full mask probs over
    # the hard full-mask support (reprojection_refiner.py:134-146)
    f = full_prob.reshape(B, -1)
    v = vis_prob.reshape(B, -1)
    h = (f > 0.5).astype(f.dtype)
    dot = (f * v * h).sum(-1)
    nrm = jnp.sqrt(jnp.maximum((f * f * h).sum(-1), 1e-12)) * \
        jnp.sqrt(jnp.maximum((v * v * h).sum(-1), 1e-12))
    best = jnp.argmax(dot / jnp.maximum(nrm, 1e-12))

    take = lambda arr: jax.lax.stop_gradient(
        jnp.take(arr, best, axis=0)[None])

    # relative extrinsics: T_best @ inv(T_i); inv([R,t]) = [R^T, -R^T t]
    gR_b, gt_b = take(gt_rot)[0], take(gt_trans)[0]
    Rinv = jnp.swapaxes(gt_rot, -1, -2)
    tinv = -jnp.einsum("bij,bj->bi", Rinv, gt_trans)
    camR, camt = _compose_rt(jnp.broadcast_to(gR_b[None], Rinv.shape),
                             jnp.broadcast_to(gt_b[None], tinv.shape),
                             Rinv, tinv)
    # reprojected student poses (grad flows through rot/trans)
    repR, rept = _compose_rt(camR, camt, rot, trans)

    # anchor = detached best-view prediction, broadcast
    infR = jnp.broadcast_to(take(rot), rot.shape)
    inft = jnp.broadcast_to(take(trans), trans.shape)
    inf_verts = jnp.broadcast_to(take(verts), verts.shape)
    inf_faces = jnp.broadcast_to(take(faces), faces.shape)
    inf_colors = jnp.broadcast_to(take(colors), colors.shape)
    infK = jnp.broadcast_to(take(K), K.shape)

    # render in a shrunken full-image frame: scale K to render_res
    sx = render_res / full_hw[1]
    sy = render_res / full_hw[0]
    S = jnp.asarray([[sx, 0, 0], [0, sy, 0], [0, 0, 1.0]], K.dtype)
    Ks_inf = jnp.einsum("ij,bjk->bik", S, infK)
    Ks_rep = jnp.einsum("ij,bjk->bik", S, K)

    loss: dict[str, Array] = {}
    for s in scales:
        ren_inf = rasterize_batch(inf_verts, inf_faces, inf_colors, Ks_inf,
                                  infR, inft / s, height=render_res,
                                  width=render_res, **rkw)
        ren_rep = rasterize_batch(verts, faces, colors, Ks_rep,
                                  repR, rept / s, height=render_res,
                                  width=render_res, **rkw)
        # soft mask IoU (mask_iou_loss.py:8-34)
        pi, pr = ren_inf.prob, ren_rep.prob
        inter = (pi * pr).reshape(B, -1).sum(-1)
        union = jnp.maximum(pi.reshape(B, -1).sum(-1)
                            + pr.reshape(B, -1).sum(-1) - inter, 1e-6)
        loss[f"loss_repj_miou_{s}"] = w_miou * (1.0 - inter / union).mean()
        if w_msssim > 0:
            loss[f"loss_repj_msssim_{s}"] = w_msssim * (
                1.0 - ms_ssim(ren_inf.attr, ren_rep.attr))

    if w_pm > 0:
        pm = pm_loss(infR, repR, points, pred_transes=inft, gt_transes=rept,
                     extents=extents, sym_rots=sym_rots, sym_valid=sym_valid,
                     loss_type="smooth_l1", loss_weight=w_pm,
                     symmetric=sym_rots is not None, disentangle_t=True,
                     t_loss_use_points=True, r_only=False)
        loss.update({f"{k}_repj": v for k, v in pm.items()})

    if w_iou2d3d > 0:
        box_rep = bboxes_from_pose(verts, Ks_rep, repR, rept)
        box_inf = bboxes_from_pose(inf_verts, Ks_inf, infR, inft)
        loss["loss_repj_3d2d_iou"] = w_iou2d3d * 0.1 * \
            _giou_loss(box_inf, box_rep).mean()
    return loss
