"""Visualization helpers (lib/vis_utils parity): image grids, bbox drawing,
flow->RGB, heatmaps, pose-axis overlay. Matplotlib-free numpy renderers so
they work headless."""

from __future__ import annotations

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    lo, hi = float(img.min()), float(img.max())
    if hi - lo < 1e-12:
        return np.zeros_like(img, dtype=np.uint8)
    return ((img - lo) / (hi - lo) * 255).astype(np.uint8)


def grid_show(images: list[np.ndarray], titles: list[str] | None = None,
              ncol: int = 4, pad: int = 2) -> np.ndarray:
    """Compose images into one grid image (lib/vis_utils grid_show without
    matplotlib). Images are normalized to uint8 RGB and resized to the max
    cell size."""
    import cv2
    cells = []
    for im in images:
        im = to_uint8(im)
        if im.ndim == 2:
            im = np.stack([im] * 3, axis=-1)
        cells.append(im[..., :3])
    ch = max(c.shape[0] for c in cells)
    cw = max(c.shape[1] for c in cells)
    cells = [cv2.resize(c, (cw, ch)) for c in cells]
    ncol = min(ncol, len(cells))
    nrow = -(-len(cells) // ncol)
    grid = np.zeros((nrow * (ch + pad), ncol * (cw + pad), 3), np.uint8)
    for i, c in enumerate(cells):
        r, col = divmod(i, ncol)
        grid[r * (ch + pad) : r * (ch + pad) + ch,
             col * (cw + pad) : col * (cw + pad) + cw] = c
    return grid


def heatmap(x: np.ndarray) -> np.ndarray:
    """Scalar map -> RGB jet-ish colormap (lib/vis_utils heatmap role)."""
    import cv2
    return cv2.applyColorMap(to_uint8(x), cv2.COLORMAP_JET)[..., ::-1]


def flow_to_rgb(flow: np.ndarray, max_mag: float | None = None) -> np.ndarray:
    """(H, W, 2) flow -> HSV-coded RGB (lib/vis_utils flow2rgb)."""
    import cv2
    mag = np.linalg.norm(flow, axis=-1)
    ang = np.arctan2(flow[..., 0], flow[..., 1])      # dh, dw
    mm = max_mag or max(float(mag.max()), 1e-6)
    hsv = np.zeros(flow.shape[:2] + (3,), np.uint8)
    hsv[..., 0] = ((ang + np.pi) / (2 * np.pi) * 179).astype(np.uint8)
    hsv[..., 1] = 255
    hsv[..., 2] = np.clip(mag / mm * 255, 0, 255).astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def draw_bbox(img: np.ndarray, box, color=(0, 255, 0), text: str = "",
              thickness: int = 2) -> np.ndarray:
    import cv2
    out = to_uint8(img).copy()
    x1, y1, x2, y2 = [int(v) for v in box]
    cv2.rectangle(out, (x1, y1), (x2, y2), color, thickness)
    if text:
        cv2.putText(out, text, (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return out


def draw_pose_axes(img: np.ndarray, K: np.ndarray, R: np.ndarray,
                   t: np.ndarray, length: float = 0.05) -> np.ndarray:
    """Draw object-frame XYZ axes projected at the pose (red/green/blue)."""
    import cv2
    out = to_uint8(img).copy()
    pts = np.float32([[0, 0, 0], [length, 0, 0], [0, length, 0],
                      [0, 0, length]])
    cam = pts @ R.T + t
    uv = (cam @ K.T)
    uv = (uv[:, :2] / uv[:, 2:3]).astype(int)
    for i, color in enumerate([(255, 0, 0), (0, 255, 0), (0, 0, 255)]):
        cv2.line(out, tuple(uv[0]), tuple(uv[i + 1]), color, 2)
    return out
