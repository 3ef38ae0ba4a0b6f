"""SSIM / MS-SSIM (differentiable, NHWC).

Parity target: core/self6dpp/losses/ssim.py (jit-scripted SSIM/MS_SSIM with
gaussian window 11, sigma 1.5, K=(0.01, 0.03), standard 5-level MS weights);
used by the stage-II self loss (self_engine_utils.py:777-786).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(size: int, sigma: float):
    import numpy as np
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur(x: Array, win: Array) -> Array:
    """Separable gaussian filter, valid padding. x (B, C, H, W).

    TPU note: implemented as unrolled shift-and-add along H then W instead
    of a grouped conv — with C=3 channels minor, a depthwise conv uses 3 of
    128 lanes; channel-major layout keeps W in the lanes at full width.
    """
    k = win.shape[0]
    h, w = x.shape[-2], x.shape[-1]
    wl = [float(v) for v in win]
    y = sum(wl[i] * jax.lax.slice_in_dim(x, i, i + h - k + 1, axis=-2)
            for i in range(k))
    return sum(wl[i] * jax.lax.slice_in_dim(y, i, i + w - k + 1, axis=-1)
               for i in range(k))


def ssim(img1: Array, img2: Array, data_range: float = 1.0,
         win_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03,
         return_cs: bool = False, _chw: bool = False):
    """SSIM over (B, H, W, C); returns mean SSIM (and mean CS if asked)."""
    if not _chw:                      # internal compute is channel-major
        img1 = jnp.transpose(img1, (0, 3, 1, 2))
        img2 = jnp.transpose(img2, (0, 3, 1, 2))
    win = _gaussian_kernel(win_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu1 = _blur(img1, win)
    mu2 = _blur(img2, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _blur(img1 * img1, win) - mu1_sq
    s2 = _blur(img2 * img2, win) - mu2_sq
    s12 = _blur(img1 * img2, win) - mu12

    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    ss = ((2 * mu12 + c1) / (mu1_sq + mu2_sq + c1)) * cs
    if return_cs:
        return ss.mean(), cs.mean()
    return ss.mean()


def ms_ssim(img1: Array, img2: Array, data_range: float = 1.0,
            win_size: int = 11, sigma: float = 1.5,
            weights: tuple[float, ...] = _MS_WEIGHTS) -> Array:
    """Multi-scale SSIM with 2x avg-pool downsampling between levels.

    Levels are truncated (weights renormalized) when the image is too small
    for the gaussian window at the coarsest scales — the reference asserts a
    minimum 161px image instead; truncation keeps small-ROI use working.
    """
    min_hw = min(img1.shape[1], img1.shape[2])
    max_levels = 1
    while max_levels < len(weights) and (min_hw >> max_levels) >= win_size:
        max_levels += 1
    if max_levels < len(weights):
        ws = weights[:max_levels]
        s = sum(ws)
        weights = tuple(x / s for x in ws)
    levels = len(weights)
    img1 = jnp.transpose(img1, (0, 3, 1, 2))   # channel-major (see _blur)
    img2 = jnp.transpose(img2, (0, 3, 1, 2))

    def pool2(x):                              # 2x2 avg, W/H in minor dims
        h, w = x.shape[-2] // 2 * 2, x.shape[-1] // 2 * 2
        x = x[..., :h, :w]                     # VALID: drop trailing odd
        x = x[..., :, 0::2] + x[..., :, 1::2]
        return (x[..., 0::2, :] + x[..., 1::2, :]) * 0.25

    vals = []
    for i in range(levels):
        if i == levels - 1:
            s = ssim(img1, img2, data_range, win_size, sigma, _chw=True)
            vals.append(jnp.maximum(s, 0.0))
        else:
            s, cs = ssim(img1, img2, data_range, win_size, sigma,
                         return_cs=True, _chw=True)
            vals.append(jnp.maximum(cs, 0.0))
            img1 = pool2(img1)
            img2 = pool2(img2)
    w = jnp.asarray(weights)
    return jnp.prod(jnp.stack(vals) ** w)


def ssim_loss(img1: Array, img2: Array, **kw) -> Array:
    return 1.0 - ssim(img1, img2, **kw)


def ms_ssim_loss(img1: Array, img2: Array, **kw) -> Array:
    return 1.0 - ms_ssim(img1, img2, **kw)
