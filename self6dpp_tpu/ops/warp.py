"""Batched 2D affine warps on NHWC tensors — the in-graph equivalent of the
reference's imgaug POSE_VARIATED_AUG pipeline (lib/utils/aug_utils.py:36-67:
CropAndPad + Affine(scale/translate/rotate), applied identically to the
student's ROI image and the teacher's pseudo geometry maps in geo mode,
data_loader_self.py:493-520, self_engine_utils.py:343-380).

TPU-first: instead of per-sample CPU imgaug round-trips, the affine is a
gather-free bilinear sample expressed as two one-hot matmuls (MXU) or a
vectorized gather, fused into the training step. Coordinates are normalized
to [-1, 1] with the image center at the origin, so one matrix warps tensors
of any resolution (input-res image and output-res label maps alike).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def make_affine(rot_rad: Array, scale: Array, trans: Array) -> Array:
    """Forward affine (B,2,3) in normalized center-origin coords:
    p_dst = R(rot) @ diag(scale) @ p_src + trans."""
    c, s = jnp.cos(rot_rad), jnp.sin(rot_rad)
    sx, sy = scale[:, 0], scale[:, 1]
    m = jnp.stack([
        jnp.stack([c * sx, -s * sy, trans[:, 0]], axis=-1),
        jnp.stack([s * sx, c * sy, trans[:, 1]], axis=-1),
    ], axis=1)
    return m


def invert_affine(m: Array) -> Array:
    """Inverse of a (B,2,3) affine (2x2 block assumed invertible)."""
    a, b, tx = m[:, 0, 0], m[:, 0, 1], m[:, 0, 2]
    c, d, ty = m[:, 1, 0], m[:, 1, 1], m[:, 1, 2]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    return jnp.stack([
        jnp.stack([ia, ib, -(ia * tx + ib * ty)], axis=-1),
        jnp.stack([ic, id_, -(ic * tx + id_ * ty)], axis=-1),
    ], axis=1)


def affine_warp(img: Array, mats: Array, mode: str = "bilinear") -> Array:
    """Warp img (B,H,W,C) by per-image dst->src affines (B,2,3) in
    normalized center-origin coords. Out-of-bounds samples are 0."""
    B, H, W, C = img.shape
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2.0 - 1.0
    v = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2.0 - 1.0
    uu, vv = jnp.meshgrid(u, v)                       # (H, W)
    ones = jnp.ones_like(uu)
    dst = jnp.stack([uu, vv, ones], axis=-1)          # (H, W, 3)
    src = jnp.einsum("bij,hwj->bhwi", mats, dst)      # (B, H, W, 2)
    # back to continuous pixel coords (pixel-center convention)
    x = (src[..., 0] + 1.0) * 0.5 * W - 0.5
    y = (src[..., 1] + 1.0) * 0.5 * H - 0.5

    def gather(yy, xx):
        yy = jnp.clip(yy, 0, H - 1)
        xx = jnp.clip(xx, 0, W - 1)
        idx = yy * W + xx                              # (B, H, W)
        flat = img.reshape(B, H * W, C)
        return jnp.take_along_axis(flat, idx.reshape(B, -1, 1), axis=1
                                   ).reshape(B, H, W, C)

    inb = (x >= -0.5) & (x <= W - 0.5) & (y >= -0.5) & (y <= H - 0.5)
    if mode == "nearest":
        out = gather(jnp.round(y).astype(jnp.int32),
                     jnp.round(x).astype(jnp.int32))
    else:
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        out = ((1 - fy) * ((1 - fx) * gather(y0, x0) + fx * gather(y0, x0 + 1))
               + fy * ((1 - fx) * gather(y0 + 1, x0)
                       + fx * gather(y0 + 1, x0 + 1)))
    return out * inb[..., None].astype(img.dtype)


def sample_pose_variated_affines(
        rng: Array, batch: int, *, rot_deg: float = 180.0,
        zoom: tuple[float, float] = (0.75, 1.25),
        trans: tuple[float, float] = (-0.1, 0.1),
        crop_percent: float = 0.1) -> Array:
    """Per-image dst->src warp matrices matching POSE_VARIATED_AUG
    (configs/self6dpp/new_cfg/base.py:34-50): rotation +-rot_deg, anisotropic
    zoom, translation as a fraction of the crop, and CropAndPad folded in as
    an extra shared zoom factor."""
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    rot = jax.random.uniform(r1, (batch,), minval=-rot_deg, maxval=rot_deg)
    rot = rot * (jnp.pi / 180.0)
    sc = jax.random.uniform(r2, (batch, 2), minval=zoom[0], maxval=zoom[1])
    crop = jax.random.uniform(r4, (batch, 1),
                              minval=1.0 - crop_percent,
                              maxval=1.0 + crop_percent)
    tr = jax.random.uniform(r3, (batch, 2), minval=trans[0], maxval=trans[1])
    # translate is a fraction of the image size -> x2 in [-1,1] coords
    fwd = make_affine(rot, sc * crop, 2.0 * tr)
    return invert_affine(fwd)
