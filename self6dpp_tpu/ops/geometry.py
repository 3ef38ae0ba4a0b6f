"""Batched, jit-friendly 3D geometry ops (rotations, poses, projection).

Functional parity targets (reference, studied not copied):
  - rotation reps:      core/utils/rot_reps.py, core/utils/pose_utils.py
  - allo<->ego:         core/utils/utils.py:31-231
  - point transforms:   lib/pysixd/misc.py (transform_pts_batch)
All functions are pure jnp, batched over a leading axis, and safe under jit
(vectorized, no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# quaternions (w, x, y, z convention, matching transforms3d)
# ---------------------------------------------------------------------------

def quat_normalize(q: Array, eps: float = 1e-8) -> Array:
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)


def quat_mul(a: Array, b: Array) -> Array:
    """Hamilton product of two (..., 4) quaternions."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_to_mat(q: Array, eps: float = 1e-8) -> Array:
    """(..., 4) unnormalized quaternion -> (..., 3, 3) rotation matrix."""
    q = quat_normalize(q, eps)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: Array, eps: float = 1e-9) -> Array:
    """(..., 3, 3) rotation matrix -> (..., 4) unit quaternion (w>=0 branchless).

    Uses the branch-free Shepperd-style formulation: compute all four candidate
    quaternions from the diagonal combinations and select the best-conditioned
    one via argmax — vectorized so it stays jittable.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidates, each scaled by 4*|component|^2
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4cand, 4)
    # the candidate keyed on the largest diagonal magnitude is best conditioned
    mags = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    idx = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = quat_normalize(q, eps)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def axangle_to_quat(axis: Array, angle: Array, eps: float = 1e-8) -> Array:
    """axis (...,3) (need not be unit), angle (...,) -> quaternion (...,4)."""
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + eps)
    half = angle[..., None] / 2.0
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def axangle_to_mat(axis: Array, angle: Array, eps: float = 1e-8) -> Array:
    return quat_to_mat(axangle_to_quat(axis, angle, eps))


# ---------------------------------------------------------------------------
# 6D rotation representation (Zhou et al. CVPR'19)
# ---------------------------------------------------------------------------

def rot6d_to_mat(d6: Array) -> Array:
    """(..., 6) -> (..., 3, 3); columns = Gram-Schmidt of the two 3-vectors.

    Matches reference core/utils/rot_reps.py:34-56 (x_raw, y_raw are the first
    two *columns* of the target matrix).
    """
    x_raw, y_raw = d6[..., 0:3], d6[..., 3:6]
    # clamped-norm division (torch F.normalize semantics): exact unit vectors
    # even for tiny inputs (freshly-initialized heads emit ~1e-5 magnitudes);
    # exact zeros (padded/zero inputs) fall back to the canonical basis so the
    # output is always a valid rotation
    e1 = jnp.zeros_like(x_raw).at[..., 0].set(1.0)
    e2 = jnp.zeros_like(y_raw).at[..., 1].set(1.0)
    xn = jnp.linalg.norm(x_raw, axis=-1, keepdims=True)
    x_raw = jnp.where(xn < 1e-20, e1, x_raw)
    x = x_raw / jnp.maximum(jnp.linalg.norm(x_raw, axis=-1, keepdims=True), 1e-12)
    z = jnp.cross(x, y_raw)
    zn = jnp.linalg.norm(z, axis=-1, keepdims=True)
    z = jnp.where(zn < 1e-20, jnp.cross(x, e2) + jnp.cross(x, e1), z)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)  # columns


def mat_to_rot6d(m: Array) -> Array:
    """(..., 3, 3) -> (..., 6): first two columns concatenated."""
    return jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)


# ---------------------------------------------------------------------------
# allocentric <-> egocentric
# ---------------------------------------------------------------------------

def allo_to_ego_mat(translation: Array, rot_allo: Array, eps: float = 1e-4) -> Array:
    """Batched allocentric->egocentric rotation correction.

    Rotates the allocentric rotation by the rotation that carries the optical
    axis (0,0,1) onto the object-centroid ray. Reference math:
    core/utils/utils.py:200-231 (allo_to_ego_mat_torch).

    translation: (..., 3); rot_allo: (..., 3, 3).
    """
    obj_ray = translation / (jnp.linalg.norm(translation, axis=-1, keepdims=True) + eps)
    angle = jnp.arccos(jnp.clip(obj_ray[..., 2], -1.0 + 1e-7, 1.0 - 1e-7))
    # axis = cam_ray x obj_ray with cam_ray = (0,0,1): (-oy, ox, 0)
    axis = jnp.stack(
        [-obj_ray[..., 1], obj_ray[..., 0], jnp.zeros_like(obj_ray[..., 0])], axis=-1
    )
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + eps)
    q = jnp.concatenate(
        [jnp.cos(angle / 2.0)[..., None], axis * jnp.sin(angle / 2.0)[..., None]],
        axis=-1,
    )
    return quat_to_mat(q) @ rot_allo


def ego_to_allo_mat(translation: Array, rot_ego: Array, eps: float = 1e-4) -> Array:
    """Inverse of allo_to_ego_mat (reference core/utils/utils.py:89-132)."""
    obj_ray = translation / (jnp.linalg.norm(translation, axis=-1, keepdims=True) + eps)
    angle = jnp.arccos(jnp.clip(obj_ray[..., 2], -1.0 + 1e-7, 1.0 - 1e-7))
    axis = jnp.stack(
        [-obj_ray[..., 1], obj_ray[..., 0], jnp.zeros_like(obj_ray[..., 0])], axis=-1
    )
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + eps)
    q = jnp.concatenate(
        [jnp.cos(-angle / 2.0)[..., None], axis * jnp.sin(-angle / 2.0)[..., None]],
        axis=-1,
    )
    return quat_to_mat(q) @ rot_ego


# ---------------------------------------------------------------------------
# point transforms and camera projection
# ---------------------------------------------------------------------------

def transform_pts(pts: Array, R: Array, t: Array | None = None) -> Array:
    """pts (..., N, 3), R (..., 3, 3), t (..., 3) -> (..., N, 3).

    Reference: lib/pysixd/misc.py transform_pts_batch.
    """
    out = jnp.einsum("...ij,...nj->...ni", R, pts)
    if t is not None:
        out = out + t[..., None, :]
    return out


def project_pts(pts: Array, K: Array, R: Array, t: Array, eps: float = 1e-8) -> Array:
    """Project model points to pixels. pts (...,N,3), K (...,3,3) -> (...,N,2).

    Reference: lib/pysixd/pose_error.py transform_pts_Rt_2d (:236-253).
    """
    cam = transform_pts(pts, R, t)  # (..., N, 3)
    z = cam[..., 2:3]
    fx = K[..., 0, 0][..., None, None]
    fy = K[..., 1, 1][..., None, None]
    px = K[..., 0, 2][..., None, None]
    py = K[..., 1, 2][..., None, None]
    u = fx * cam[..., 0:1] / (z + eps) + px
    v = fy * cam[..., 1:2] / (z + eps) + py
    return jnp.concatenate([u, v], axis=-1)


def compute_vf(fps_points: Array, K: Array, R: Array, t: Array,
               roi_center: Array, roi_scale: Array, out_res: int,
               mask: Array | None = None) -> Array:
    """GT/pseudo keypoint vector field in the ROI crop frame.

    Per pixel of the out_res x out_res crop (centered at roi_center with side
    roi_scale, in original-image pixel coords), the unit 2D direction to each
    of the f projected FPS keypoints. Reference: compute_vf_torch
    (core/utils/data_utils.py:357-390; the stage-II pseudo-RT VF supervision
    calls it at self_engine_utils.py:603-636).

    fps_points (B,f,3), K/R (B,3,3), t (B,3), roi_center (B,2),
    roi_scale (B,), mask (B,out,out) or None -> (B,out,out,2f) with the
    keypoint axis interleaved as [u0,v0,u1,v1,...].
    """
    kp = project_pts(fps_points, K, R, t)            # (B,f,2)
    x0 = roi_center[:, 0] - roi_scale / 2
    y0 = roi_center[:, 1] - roi_scale / 2
    lin = (jnp.arange(out_res, dtype=kp.dtype) + 0.5) / out_res
    px = x0[:, None] + roi_scale[:, None] * lin      # (B,out)
    py = y0[:, None] + roi_scale[:, None] * lin
    grid = jnp.stack([
        jnp.broadcast_to(px[:, None, :], (px.shape[0], out_res, out_res)),
        jnp.broadcast_to(py[:, :, None], (py.shape[0], out_res, out_res)),
    ], axis=-1)                                       # (B,out,out,2)
    vf = kp[:, None, None, :, :] - grid[:, :, :, None, :]   # (B,o,o,f,2)
    vf = vf / jnp.maximum(jnp.linalg.norm(vf, axis=-1, keepdims=True), 1e-8)
    b, o = vf.shape[0], out_res
    vf = vf.reshape(b, o, o, -1)
    if mask is not None:
        vf = vf * mask[..., None]
    return vf


def backproject_depth(depth: Array, K: Array) -> Array:
    """depth (..., H, W), K (..., 3, 3) -> camera-space xyz (..., H, W, 3).

    Reference: lib/pysixd/misc.py backproject/backproject_th.
    """
    H, W = depth.shape[-2], depth.shape[-1]
    vs, us = jnp.meshgrid(jnp.arange(H, dtype=depth.dtype),
                          jnp.arange(W, dtype=depth.dtype), indexing="ij")
    fx = K[..., 0, 0][..., None, None]
    fy = K[..., 1, 1][..., None, None]
    px = K[..., 0, 2][..., None, None]
    py = K[..., 1, 2][..., None, None]
    x = (us - px) * depth / fx
    y = (vs - py) * depth / fy
    return jnp.stack([x, y, depth], axis=-1)


# ---------------------------------------------------------------------------
# rotation error helpers (used by losses and evaluators)
# ---------------------------------------------------------------------------

def rot_angle_deg(R1: Array, R2: Array) -> Array:
    """Geodesic angle in degrees between (..., 3, 3) rotations.

    Reference: lib/pysixd/pose_error.py:359-373 (re).
    """
    m = R1 @ jnp.swapaxes(R2, -1, -2)
    tr = jnp.trace(m, axis1=-2, axis2=-1)
    cos = jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0)
    return jnp.rad2deg(jnp.arccos(cos))


def quat_from_two_mats_angle(R1: Array, R2: Array) -> Array:
    return rot_angle_deg(R1, R2)
