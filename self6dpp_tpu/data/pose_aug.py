"""Pose and depth augmentation (host numpy).

Parity targets: core/utils/pose_aug.py (pose perturbation for DeepIM-style
init-pose generation and stage-II POSE_VARIATED_AUG,
configs/self6dpp/new_cfg/base.py:34-50) and core/utils/depth_aug.py
(sensor-noise simulation on real depth maps).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation


def perturb_poses(R: np.ndarray, t: np.ndarray, rng: np.random.Generator,
                  rot_std_deg: float = 15.0,
                  trans_std: tuple[float, float, float] = (0.01, 0.01, 0.05),
                  rot_max_deg: float = 45.0,
                  trans_max: float = 0.25) -> tuple[np.ndarray, np.ndarray]:
    """Gaussian pose noise with clipping (the reference's gt_noise init-pose
    scheme, configs/_base_/deepim_base.py:38-62). R (N,3,3), t (N,3)."""
    n = len(R)
    ang = np.clip(rng.normal(0, rot_std_deg, (n, 3)),
                  -rot_max_deg, rot_max_deg)
    dR = Rotation.from_euler("xyz", ang, degrees=True).as_matrix()
    dt = np.clip(rng.normal(0, trans_std, (n, 3)), -trans_max, trans_max)
    return (dR @ R).astype(np.float32), (t + dt).astype(np.float32)


def uniform_z_flip_aug(R: np.ndarray, rng: np.random.Generator,
                       prob: float = 0.5) -> np.ndarray:
    """Random 180° in-plane flip (symmetric-object augmentation)."""
    out = R.copy()
    flip = np.diag([-1.0, -1.0, 1.0]).astype(R.dtype)
    for i in range(len(R)):
        if rng.random() < prob:
            out[i] = R[i] @ flip
    return out


def aug_depth(depth: np.ndarray, rng: np.random.Generator,
              noise_std: float = 0.003, dropout_prob: float = 0.005,
              quantize_mm: float = 1.0) -> np.ndarray:
    """Simulate RGB-D sensor artifacts: additive gaussian noise, random
    pixel dropout (invalid returns), mm quantization (depth_aug.py role)."""
    d = depth.copy()
    valid = d > 0
    d = d + rng.normal(0, noise_std, d.shape) * valid
    drop = rng.random(d.shape) < dropout_prob
    d = np.where(drop, 0.0, d)
    if quantize_mm > 0:
        q = quantize_mm / 1000.0
        d = np.round(d / q) * q
    return np.maximum(d, 0.0).astype(np.float32)


def jitter_K(K: np.ndarray, rng: np.random.Generator,
             f_ratio: float = 0.0, c_px: float = 0.0) -> np.ndarray:
    """Optional intrinsics jitter for robustness training."""
    out = K.copy()
    if f_ratio > 0:
        s = 1.0 + rng.uniform(-f_ratio, f_ratio)
        out[0, 0] *= s
        out[1, 1] *= s
    if c_px > 0:
        out[0, 2] += rng.uniform(-c_px, c_px)
        out[1, 2] += rng.uniform(-c_px, c_px)
    return out
