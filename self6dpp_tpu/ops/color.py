"""Differentiable color-space conversions (NHWC, values in [0,1]).

Parity target: lib/torch_utils/color/ (rgb_to_lab used by the stage-II LAB
loss, self_engine_utils.py:745-774; plus hsv/gray helpers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# sRGB D65
_RGB2XYZ = jnp.asarray([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
])
_XYZ_REF = jnp.asarray([0.950456, 1.0, 1.088754])


def rgb_to_linear(rgb: Array) -> Array:
    return jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)


def rgb_to_xyz(rgb: Array) -> Array:
    lin = rgb_to_linear(rgb)
    return jnp.einsum("...c,dc->...d", lin, _RGB2XYZ)


def rgb_to_lab(rgb: Array, eps: float = 1e-8) -> Array:
    """RGB [0,1] -> CIELAB (L in [0,100], a/b roughly [-128,127])."""
    L, a, b = _lab_channels(rgb, eps)
    return jnp.stack([L, a, b], axis=-1)


def rgb_to_gray(rgb: Array) -> Array:
    return (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])[..., None]


def rgb_to_hsv(rgb: Array, eps: float = 1e-8) -> Array:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    d = mx - mn
    h = jnp.where(
        mx == r, (g - b) / (d + eps) % 6.0,
        jnp.where(mx == g, (b - r) / (d + eps) + 2.0, (r - g) / (d + eps) + 4.0))
    h = jnp.where(d < eps, 0.0, h) / 6.0
    s = jnp.where(mx > eps, d / (mx + eps), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def _lab_channels(rgb: Array, eps: float = 1e-8):
    """(..., 3) RGB -> (L, a, b) as SEPARATE (...) arrays.

    Channel-split form: full-lane (..., H, W) elementwise math instead of
    einsum/stack on a 3-wide minor dimension. NOTE: on the current TPU
    backend any cross-channel color mixing inside the stage-II train graph
    (einsum, slices, or 1x1-conv forms alike) still triggers a fusion
    pathology that fragments the whole step into ~10k kernels (~40 ms vs
    ~4 ms without the LAB term) — measured and documented in
    BENCH_NOTES.md "LAB loss compile pathology"."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]

    def lin(c):
        return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)

    rl, gl, bl = lin(r), lin(g), lin(b)
    M = _RGB2XYZ
    x = (M[0, 0] * rl + M[0, 1] * gl + M[0, 2] * bl) / _XYZ_REF[0]
    y = (M[1, 0] * rl + M[1, 1] * gl + M[1, 2] * bl) / _XYZ_REF[1]
    z = (M[2, 0] * rl + M[2, 1] * gl + M[2, 2] * bl) / _XYZ_REF[2]

    def f(c):
        return jnp.where(c > 0.008856, jnp.cbrt(jnp.maximum(c, eps)),
                         7.787 * c + 16.0 / 116.0)

    fx, fy, fz = f(x), f(y), f(z)
    return 116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)


def lab_loss(pred_rgb: Array, gt_rgb: Array, mask: Array | None = None,
             no_l: bool = True) -> Array:
    """L1 on (a,b) [optionally +L] channels (stage-II LAB color loss,
    self_engine_utils.py:745-774: compares chroma only by default so the loss
    is robust to synthetic/real lighting gaps). Channel-split form — see
    _lab_channels for why."""
    Lp, ap, bp = _lab_channels(pred_rgb)
    Lg, ag, bg = _lab_channels(gt_rgb)
    diff = jnp.abs(ap - ag) + jnp.abs(bp - bg)
    n_ch = 2
    if not no_l:
        diff = diff + jnp.abs(Lp - Lg)
        n_ch = 3
    if mask is not None:
        return (diff * mask).sum() / (jnp.maximum(mask.sum(), 1.0) * n_ch)
    return diff.mean() / n_ch


def lab_loss_surrogate(pred_rgb: Array, gt_rgb: Array,
                       mask: Array | None = None, no_l: bool = True) -> Array:
    """lab_loss with identical value and identical parameter gradient, but a
    backward graph that looks like a plain elementwise product-sum.

    ``g = d(lab)/d(pred)`` is computed on a stop-gradient side branch
    (pixel-local color math, disconnected from the model/render backward),
    and the term re-enters the differentiable graph as ``sum(g * pred)`` —
    structurally the same consumer shape as an RGB L1, which does NOT
    trigger the XLA TPU fusion cliff the direct LAB reduction does
    (BENCH_NOTES.md "LAB loss compile pathology"). Since the LAB gradient
    w.r.t. parameters flows only through ``pred`` and ``g`` is evaluated at
    the current ``pred``, the gradient is exact, not approximate.
    """
    p = jax.lax.stop_gradient(pred_rgb)
    val, g = jax.value_and_grad(
        lambda r: lab_loss(r, gt_rgb, mask=mask, no_l=no_l))(p)
    g = jax.lax.stop_gradient(g)
    lin = jnp.sum(g * pred_rgb)
    return val + (lin - jax.lax.stop_gradient(lin))


_YUV = jnp.asarray([
    [0.299, 0.587, 0.114],
    [-0.147, -0.289, 0.436],
    [0.615, -0.515, -0.100],
])


def rgb_to_yuv(rgb: Array) -> Array:
    """(..., 3) RGB in [0,1] -> YUV (kornia-convention weights; reference
    lib/torch_utils/color/yuv.py:5-34)."""
    return jnp.einsum("ij,...j->...i", _YUV, rgb)


def rgb_to_luv(rgb: Array, eps: float = 1e-12) -> Array:
    """(..., 3) sRGB in [0,1] -> CIE-LUV (reference lib/torch_utils/color/
    luv.py: linearize, XYZ, then L* and u'v'-based u*, v*)."""
    xyz = rgb_to_xyz(rgb_to_linear(rgb))
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    threshold = 0.008856
    L = jnp.where(y > threshold, 116.0 * jnp.cbrt(jnp.maximum(y, eps)) - 16.0,
                  903.3 * y)
    d = x + 15.0 * y + 3.0 * z
    u_p = 4.0 * x / jnp.maximum(d, eps)
    v_p = 9.0 * y / jnp.maximum(d, eps)
    xr, yr, zr = _XYZ_REF
    dr = xr + 15.0 * yr + 3.0 * zr
    u = 13.0 * L * (u_p - 4.0 * xr / dr)
    v = 13.0 * L * (v_p - 9.0 * yr / dr)
    return jnp.stack([L, u, v], axis=-1)
