"""Pose-conditioned crop/zoom ops for DeepIM-style refinement — pure jnp.

Parity targets:
  core/utils/zoom_utils.py:6-79   deepim_boxes (crop region from ren/obs boxes)
  core/utils/zoom_utils.py:82-120 batch_crop_resize (ROIAlign-based zoom)
  get_K_crop_resize: intrinsics update for a crop+resize
The ROIAlign zoom becomes a vectorized bilinear gather (aligned=True
semantics), differentiable and jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def deepim_boxes(ren_boxes: Array, ren_centers_2d: Array,
                 obs_boxes: Array | None = None, lamb: float = 1.4,
                 out_hw: tuple[int, int] = (480, 640)) -> tuple[Array, Array]:
    """Square-ish crop covering ren (and optionally obs) boxes, centered on
    the rendered object center. Returns (boxes x1y1x2y2 (N,4), resize_ratios
    (N,2) = out / crop)."""
    ren_cx, ren_cy = ren_centers_2d[:, 0], ren_centers_2d[:, 1]
    out_h, out_w = out_hw
    aspect = out_w / out_h

    xs = [jnp.abs(ren_cx - ren_boxes[:, 0]), jnp.abs(ren_boxes[:, 2] - ren_cx)]
    ys = [jnp.abs(ren_cy - ren_boxes[:, 1]), jnp.abs(ren_boxes[:, 3] - ren_cy)]
    if obs_boxes is not None:
        xs += [jnp.abs(ren_cx - obs_boxes[:, 0]), jnp.abs(obs_boxes[:, 2] - ren_cx)]
        ys += [jnp.abs(ren_cy - obs_boxes[:, 1]), jnp.abs(obs_boxes[:, 3] - ren_cy)]
    xdist = jnp.stack(xs, axis=1).max(axis=1)
    ydist = jnp.stack(ys, axis=1).max(axis=1)

    crop_h = jnp.maximum(jnp.maximum(xdist / aspect, ydist), 1.0) * 2.0 * lamb
    crop_w = crop_h * aspect
    boxes = jnp.stack([ren_cx - crop_w / 2, ren_cy - crop_h / 2,
                       ren_cx + crop_w / 2, ren_cy + crop_h / 2], axis=1)
    ratios = jnp.stack([out_w / crop_w, out_h / crop_h], axis=1)
    return boxes, ratios


def zoom_K(K: Array, boxes: Array, out_hw: tuple[int, int]) -> Array:
    """Update intrinsics for crop `boxes` resized to out_hw
    (reference get_K_crop_resize semantics). K (N,3,3) or (3,3)."""
    out_h, out_w = out_hw
    if K.ndim == 2:
        K = jnp.broadcast_to(K, (boxes.shape[0], 3, 3))
    sx = out_w / (boxes[:, 2] - boxes[:, 0])
    sy = out_h / (boxes[:, 3] - boxes[:, 1])
    fx = K[:, 0, 0] * sx
    fy = K[:, 1, 1] * sy
    px = (K[:, 0, 2] - boxes[:, 0]) * sx
    py = (K[:, 1, 2] - boxes[:, 1]) * sy
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    return jnp.stack([
        jnp.stack([fx, z, px], axis=1),
        jnp.stack([z, fy, py], axis=1),
        jnp.stack([z, z, o], axis=1),
    ], axis=1)


def crop_resize(imgs: Array, boxes: Array, out_h: int, out_w: int) -> Array:
    """Batched bilinear crop+resize, ROIAlign(aligned=True, ratio=0) parity.

    imgs (B, H, W, C); boxes (B, 4) x1y1x2y2 in pixel coords (box i crops
    image i). Sample grid: out pixel j center maps to
    x1 + (j + 0.5) * w_box / out_w - 0.5. Differentiable wrt imgs and boxes.
    """
    B, H, W, C = imgs.shape

    def one(img, box):
        x1, y1, x2, y2 = box
        us = x1 + (jnp.arange(out_w) + 0.5) * (x2 - x1) / out_w - 0.5
        vs = y1 + (jnp.arange(out_h) + 0.5) * (y2 - y1) / out_h - 0.5
        return _bilinear_sample(img, us[None, :].repeat(out_h, 0),
                                vs[:, None].repeat(out_w, 1))

    return jax.vmap(one)(imgs, boxes)


def _bilinear_sample(img: Array, us: Array, vs: Array) -> Array:
    """img (H, W, C), us/vs (h, w) pixel coords -> (h, w, C); zero padding
    outside (matches ROIAlign border behavior closely enough for crops that
    stay mostly inside)."""
    H, W = img.shape[:2]
    u0 = jnp.floor(us)
    v0 = jnp.floor(vs)
    du = (us - u0)[..., None]
    dv = (vs - v0)[..., None]
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    def at(vi, ui):
        inb = (vi >= 0) & (vi < H) & (ui >= 0) & (ui < W)
        vic = jnp.clip(vi, 0, H - 1)
        uic = jnp.clip(ui, 0, W - 1)
        return img[vic, uic] * inb[..., None]

    top = at(v0i, u0i) * (1 - du) + at(v0i, u0i + 1) * du
    bot = at(v0i + 1, u0i) * (1 - du) + at(v0i + 1, u0i + 1) * du
    return top * (1 - dv) + bot * dv


def bboxes_from_pose(points: Array, K: Array, R: Array, t: Array) -> Array:
    """Project model points and take the 2D bbox (reference
    core/deepim/engine/batching.py bboxes_from_pose path).
    points (B,N,3) -> (B,4) x1y1x2y2."""
    cam = jnp.einsum("bij,bnj->bni", R, points) + t[:, None, :]
    z = jnp.maximum(cam[..., 2], 1e-6)
    u = K[..., 0, 0][..., None] * cam[..., 0] / z + K[..., 0, 2][..., None]
    v = K[..., 1, 1][..., None] * cam[..., 1] / z + K[..., 1, 2][..., None]
    return jnp.stack([u.min(1), v.min(1), u.max(1), v.max(1)], axis=1)


def centers_2d_from_pose(K: Array, R: Array, t: Array) -> Array:
    z = jnp.maximum(t[:, 2], 1e-6)
    u = K[..., 0, 0] * t[:, 0] / z + K[..., 0, 2]
    v = K[..., 1, 1] * t[:, 1] / z + K[..., 1, 2]
    return jnp.stack([u, v], axis=1)
