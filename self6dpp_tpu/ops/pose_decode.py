"""Differentiable pose decoding from network outputs (SITE-style).

Reference semantics (studied, not copied):
  core/gdrn_modeling/models/pose_from_pred_centroid_z.py:157-244 (train path)
  core/gdrn_modeling/models/pose_from_pred_centroid_z_abs.py
  core/gdrn_modeling/models/pose_from_pred.py
One fully differentiable jnp implementation serves both train and test — on
TPU there is no reason for the reference's separate numpy test path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import allo_to_ego_mat, quat_to_mat, rot6d_to_mat

Array = jax.Array


def rot_rep_to_mat(pred_rot: Array, rot_type: str) -> Array:
    """Convert a network rotation output to a rotation matrix.

    rot_type in {allo_rot6d, ego_rot6d, allo_quat, ego_quat}; the allo/ego
    distinction is resolved later by pose decoding (is_allo flag), this only
    parses the representation. Reference: models/model_utils.py get_rot_mat.
    """
    if rot_type.endswith("rot6d"):
        return rot6d_to_mat(pred_rot)
    if rot_type.endswith("quat"):
        return quat_to_mat(pred_rot)
    raise ValueError(f"unknown rot_type: {rot_type}")


def pose_from_centroid_z(
    pred_rot_m: Array,        # (B, 3, 3) allocentric (or ego) rotation
    pred_centroid: Array,     # (B, 2) centroid offset rel. to roi center / wh
    pred_z: Array,            # (B, 1) z (REL: ratio-normalized, ABS: metres)
    roi_cam: Array,           # (B, 3, 3) intrinsics
    roi_center: Array,        # (B, 2) roi center in px
    resize_ratio: Array,      # (B,) output_res / scale
    roi_wh: Array,            # (B, 2) roi width/height in px
    eps: float = 1e-4,
    is_allo: bool = True,
    z_type: str = "REL",
) -> tuple[Array, Array]:
    """Decode egocentric (R, t) from SITE predictions; differentiable.

    cx = cx_rel * bw + rcx;  cy = cy_rel * bh + rcy
    z  = z_rel * resize_ratio                  (REL)
    t  = ((cx-px) z / fx, (cy-py) z / fy, z)
    R_ego = R(allo->ego | t) @ R_allo
    """
    c = pred_centroid * roi_wh + roi_center            # (B, 2)
    if z_type == "ABS":
        z = pred_z[:, 0]
    elif z_type == "REL":
        z = pred_z[:, 0] * resize_ratio
    else:
        raise ValueError(f"unknown z_type: {z_type}")

    fx, fy = roi_cam[:, 0, 0], roi_cam[:, 1, 1]
    px, py = roi_cam[:, 0, 2], roi_cam[:, 1, 2]
    tx = z * (c[:, 0] - px) / fx
    ty = z * (c[:, 1] - py) / fy
    trans = jnp.stack([tx, ty, z], axis=-1)            # (B, 3)

    rot_ego = allo_to_ego_mat(trans, pred_rot_m, eps=eps) if is_allo else pred_rot_m
    return rot_ego, trans


def pose_from_centroid_z_abs(
    pred_rot_m: Array,
    pred_centroid: Array,     # (B, 2) absolute pixel centroid
    pred_z: Array,            # (B, 1) absolute z
    roi_cam: Array,
    eps: float = 1e-4,
    is_allo: bool = True,
) -> tuple[Array, Array]:
    """Absolute-centroid variant (pose_from_pred_centroid_z_abs.py)."""
    z = pred_z[:, 0]
    fx, fy = roi_cam[:, 0, 0], roi_cam[:, 1, 1]
    px, py = roi_cam[:, 0, 2], roi_cam[:, 1, 2]
    tx = z * (pred_centroid[:, 0] - px) / fx
    ty = z * (pred_centroid[:, 1] - py) / fy
    trans = jnp.stack([tx, ty, z], axis=-1)
    rot_ego = allo_to_ego_mat(trans, pred_rot_m, eps=eps) if is_allo else pred_rot_m
    return rot_ego, trans


def pose_from_delta_init(
    rot_deltas: Array,        # (B, 3, 3)
    trans_deltas: Array,      # (B, 3) vx vy vz in image space
    rot_inits: Array,         # (B, 3, 3)
    trans_inits: Array,       # (B, 3)
    Ks: Array | None = None,  # (B, 3, 3) zoomed intrinsics
    K_aware: bool = True,
    delta_T_space: str = "image",
    delta_T_weight: float = 1.0,
    delta_z_style: str = "cosypose",
    eps: float = 1e-4,
    is_allo: bool = False,
) -> tuple[Array, Array]:
    """DeepIM/CosyPose-style delta-pose update (render-and-compare).

    Reference: core/deepim/models/pose_from_delta_init.py:15-88.
      image-space: ztgt = vz * zsrc (cosypose) or zsrc / exp(vz) (deepim);
                   xy_tgt = ztgt * (vxvy / fxfy + xy_src / zsrc)
      rotation:    R_tgt = R_delta @ R_init (camera frame)
    """
    trans_deltas = trans_deltas * delta_T_weight
    if delta_T_space == "image":
        # the object stays in front of the camera: the cosypose-style
        # multiplicative vz can predict <=0 for an untrained net, and a
        # chained refine iteration then divides by ~0 (xy_src/zsrc) -> NaN
        # poisoning the whole in-graph refine scan
        zsrc = jnp.maximum(trans_inits[:, 2:3], eps)
        vz = trans_deltas[:, 2:3]
        if delta_z_style == "cosypose":
            ztgt = jnp.maximum(vz * zsrc, eps)
        else:  # deepim: vz = log(zsrc/ztgt)
            ztgt = zsrc / jnp.exp(vz)
        vxvy = trans_deltas[:, :2]
        if K_aware:
            assert Ks is not None
            fxfy = jnp.stack([Ks[:, 0, 0], Ks[:, 1, 1]], axis=1)
        else:
            fxfy = jnp.ones_like(vxvy)
        xy_tgt = ztgt * (vxvy / fxfy + trans_inits[:, :2] / zsrc)
        trans_tgts = jnp.concatenate([xy_tgt, ztgt], axis=-1)
    elif delta_T_space == "3D":
        trans_tgts = trans_inits + trans_deltas
        trans_tgts = jnp.concatenate(
            [trans_tgts[:, :2], jnp.maximum(trans_tgts[:, 2:3], eps)], axis=-1)
    else:
        raise ValueError(f"unknown delta_T_space: {delta_T_space}")

    ego_rot_deltas = (allo_to_ego_mat(trans_tgts, rot_deltas, eps=eps)
                      if is_allo else rot_deltas)
    rot_tgts = ego_rot_deltas @ rot_inits
    return rot_tgts, trans_tgts


def pose_from_trans(
    pred_rot_m: Array,
    pred_trans: Array,        # (B, 3) direct translation
    eps: float = 1e-4,
    is_allo: bool = True,
) -> tuple[Array, Array]:
    """Direct-translation variant (pose_from_pred.py)."""
    rot_ego = allo_to_ego_mat(pred_trans, pred_rot_m, eps=eps) if is_allo else pred_rot_m
    return rot_ego, pred_trans
