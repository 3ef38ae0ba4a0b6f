"""Host-side (numpy/cv2) augmentation + ROI cropping for the data pipeline.

Parity targets:
  core/base_data_loader.py:179-217  aug_bbox_DZI (dynamic zoom-in)
  core/utils/data_utils.py:117-180  crop_resize_by_warp_affine
  core/utils/data_utils.py:434-453  get_2d_coord_np
  color augmentation: a numpy re-implementation of the reference's default
  AAE-style pipeline (base_data_loader.py:218+, configs COLOR_AUG_CODE) —
  explicit functions instead of eval()'d imgaug code strings.
  bg replacement: base_data_loader GDRN loader:398-430.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:          # pragma: no cover
    cv2 = None

from ..config.base import DZIConfig


def aug_bbox_dzi(cfg: DZIConfig, bbox_xyxy: np.ndarray, im_h: int, im_w: int,
                 rng: np.random.Generator) -> tuple[np.ndarray, float]:
    """Returns (center (2,), scale). Square crop of side `scale`."""
    x1, y1, x2, y2 = bbox_xyxy
    cx, cy = 0.5 * (x1 + x2), 0.5 * (y1 + y2)
    bw, bh = x2 - x1, y2 - y1
    if cfg.type == "uniform":
        scale_ratio = 1 + cfg.scale_ratio * (2 * rng.random() - 1)
        shift = cfg.shift_ratio * (2 * rng.random(2) - 1)
        center = np.array([cx + bw * shift[0], cy + bh * shift[1]])
        scale = max(bh, bw) * scale_ratio * cfg.pad_scale
    elif cfg.type == "roi10d":
        d = 0.15
        x1 += bw * (rng.random() * 2 * d - d)
        x2 += bw * (rng.random() * 2 * d - d)
        y1 += bh * (rng.random() * 2 * d - d)
        y2 += bh * (rng.random() * 2 * d - d)
        center = np.array([0.5 * (x1 + x2), 0.5 * (y1 + y2)])
        scale = max(y2 - y1, x2 - x1) * cfg.pad_scale
    else:  # none: test-time crop
        center = np.array([cx, cy])
        scale = max(bh, bw) * cfg.pad_scale
    scale = min(scale, max(im_h, im_w)) * 1.0
    return center, float(scale)


def get_affine_transform(center, scale, output_size: int) -> np.ndarray:
    """2x3 affine mapping the square crop (center, side=scale) to
    output_size² (rotation unused by the pipeline; reference data_utils)."""
    s = output_size / scale
    tx = output_size / 2.0 - center[0] * s
    ty = output_size / 2.0 - center[1] * s
    return np.array([[s, 0, tx], [0, s, ty]], dtype=np.float32)


def crop_resize_by_warp_affine(img: np.ndarray, center, scale,
                               output_size: int,
                               interpolation: str = "linear") -> np.ndarray:
    trans = get_affine_transform(center, scale, output_size)
    if cv2 is not None:
        flag = cv2.INTER_LINEAR if interpolation == "linear" else cv2.INTER_NEAREST
        return cv2.warpAffine(img, trans, (output_size, output_size), flags=flag)
    # numpy fallback (nearest)
    ys, xs = np.meshgrid(np.arange(output_size), np.arange(output_size),
                         indexing="ij")
    sx = (xs - trans[0, 2]) / trans[0, 0]
    sy = (ys - trans[1, 2]) / trans[1, 1]
    sxi = np.clip(np.round(sx).astype(int), 0, img.shape[1] - 1)
    syi = np.clip(np.round(sy).astype(int), 0, img.shape[0] - 1)
    out = img[syi, sxi]
    inb = (sx >= 0) & (sx < img.shape[1]) & (sy >= 0) & (sy < img.shape[0])
    return np.where(inb[..., None] if out.ndim == 3 else inb, out, 0)


def get_2d_coord(width: int, height: int, low: float = 0.0,
                 high: float = 1.0) -> np.ndarray:
    """(H, W, 2) normalized image coordinates (endpoint excluded)."""
    x = np.linspace(low, high, width, dtype=np.float32, endpoint=False)
    y = np.linspace(low, high, height, dtype=np.float32, endpoint=False)
    xx, yy = np.meshgrid(x, y)
    return np.stack([xx, yy], axis=-1)


# ---------------------------------------------------------------------------
# color augmentation (AAE-style, explicit numpy ops — no eval'd imgaug code)
# ---------------------------------------------------------------------------

def color_aug(img: np.ndarray, rng: np.random.Generator,
              prob: float = 0.8) -> np.ndarray:
    """img float32 (H, W, 3) in [0,1]. Random subset of: coarse dropout,
    gaussian blur, add, multiply (shared + per-channel), contrast, grayscale
    blend (the reference's default AAE chain, base_data_loader.py:230-250)."""
    if rng.random() > prob:
        return img
    out = img.copy()
    if rng.random() < 0.5:    # coarse dropout
        h, w = out.shape[:2]
        gh, gw = max(h // 20, 1), max(w // 20, 1)
        drop = rng.random((gh, gw)) < 0.2
        drop = np.kron(drop, np.ones((h // gh + 1, w // gw + 1)))[:h, :w]
        out = out * (1 - drop[..., None])
    if rng.random() < 0.5 and cv2 is not None:    # gaussian blur
        sig = 1.2 * rng.random()
        if sig > 0.3:
            out = cv2.GaussianBlur(out, (5, 5), sig)
    if rng.random() < 0.5:    # add
        out = out + rng.uniform(-0.1, 0.1)
    if rng.random() < 0.3:    # per-channel add
        out = out + rng.uniform(-0.06, 0.06, 3)
    if rng.random() < 0.5:    # multiply
        out = out * rng.uniform(0.75, 1.25)
    if rng.random() < 0.3:    # per-channel multiply
        out = out * rng.uniform(0.85, 1.15, 3)
    if rng.random() < 0.5:    # contrast
        mean = out.mean()
        out = (out - mean) * rng.uniform(0.7, 1.3) + mean
    if rng.random() < 0.3:    # grayscale blend
        g = out.mean(axis=-1, keepdims=True)
        alpha = rng.random()
        out = alpha * g + (1 - alpha) * out
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def replace_bg(img: np.ndarray, mask: np.ndarray, bg: np.ndarray,
               truncate_fg: bool = False,
               rng: np.random.Generator | None = None) -> np.ndarray:
    """Composite the foreground (mask>0) over a random background image
    (reference GDRN loader bg replacement, data_loader.py:398-430)."""
    h, w = img.shape[:2]
    if bg.shape[:2] != (h, w) and cv2 is not None:
        bg = cv2.resize(bg, (w, h))
    m = (mask > 0).astype(np.float32)
    if truncate_fg and rng is not None:
        # randomly truncate half of the fg region along a random axis
        ys, xs = np.nonzero(m)
        if len(ys) > 0:
            if rng.random() < 0.5:
                cut = rng.integers(xs.min(), max(xs.max(), xs.min() + 1))
                m[:, cut:] = 0 if rng.random() < 0.5 else m[:, cut:]
            else:
                cut = rng.integers(ys.min(), max(ys.max(), ys.min() + 1))
                m[cut:, :] = 0 if rng.random() < 0.5 else m[cut:, :]
    return img * m[..., None] + bg * (1 - m[..., None])


def add_noise_depth(depth: np.ndarray, rng: np.random.Generator,
                    level: float = 0.1) -> np.ndarray:
    """Gaussian depth noise with a uniformly drawn per-image level
    (reference core/utils/depth_aug.py:5 add_noise_depth, from
    DeepIM-PyTorch). depth (H, W) [or (H, W, C), shared noise per pixel]."""
    noise_level = rng.uniform(0, level)
    gauss = noise_level * rng.standard_normal(depth.shape[:2])
    if depth.ndim == 3:
        gauss = np.repeat(gauss[:, :, None], depth.shape[2], axis=2)
    return (depth + gauss).astype(np.float32)
