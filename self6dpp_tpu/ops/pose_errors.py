"""6D pose error metrics (ADD / ADD-S / re / te / proj) — batched jax + host.

Reference semantics: lib/pysixd/pose_error.py:256-460 (add, adi, re, te, proj)
and the recall-table protocol of
core/gdrn_modeling/engine/gdrn_custom_evaluator.py:605-736
(ad_2/5/10, rete_2/5/10, re_2/5/10, te_2/5/10, proj_2/5/10).

The jax versions are batched/jittable with padded point sets; `adi` uses a
full pairwise distance matrix (MXU matmul via the |a-b|^2 expansion) instead
of a KD-tree — exact for the <=10k-vertex BOP models and TPU-fast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .geometry import rot_angle_deg, transform_pts, project_pts

Array = jax.Array


def add_error(R_est, t_est, R_gt, t_gt, pts) -> Array:
    """Mean distance between correspondingly transformed model points.

    pts: (..., N, 3). Returns (...,).
    """
    pe = transform_pts(pts, R_est, t_est)
    pg = transform_pts(pts, R_gt, t_gt)
    return jnp.linalg.norm(pe - pg, axis=-1).mean(axis=-1)


def adi_error(R_est, t_est, R_gt, t_gt, pts) -> Array:
    """Mean nearest-neighbor distance (symmetric objects). pts (..., N, 3).

    Pairwise |a-b|^2 = |a|^2 + |b|^2 - 2 a.b — the cross term is a matmul,
    which XLA maps onto the MXU.
    """
    pe = transform_pts(pts, R_est, t_est)      # (..., N, 3)
    pg = transform_pts(pts, R_gt, t_gt)
    sq_e = jnp.sum(pe * pe, axis=-1)           # (..., N)
    sq_g = jnp.sum(pg * pg, axis=-1)
    cross = jnp.einsum("...nd,...md->...nm", pg, pe)  # (..., Ngt, Nest)
    d2 = sq_g[..., :, None] + sq_e[..., None, :] - 2.0 * cross
    d2 = jnp.maximum(d2, 0.0)
    return jnp.sqrt(d2.min(axis=-1)).mean(axis=-1)


def re_error(R_est, R_gt) -> Array:
    """Rotation geodesic error in degrees."""
    return rot_angle_deg(R_est, R_gt)


def te_error(t_est, t_gt) -> Array:
    """Translation error (same unit as inputs, metres for BOP)."""
    return jnp.linalg.norm(t_est - t_gt, axis=-1)


def proj_error(R_est, t_est, R_gt, t_gt, K, pts) -> Array:
    """Mean 2D reprojection distance in pixels (Brachmann CVPR'16)."""
    p_est = project_pts(pts, K, R_est, t_est)
    p_gt = project_pts(pts, K, R_gt, t_gt)
    return jnp.linalg.norm(p_est - p_gt, axis=-1).mean(axis=-1)


def add_or_adi_error(R_est, t_est, R_gt, t_gt, pts, is_sym) -> Array:
    """ADD(-S): per-element select between add and adi by `is_sym` (bool ...)."""
    a = add_error(R_est, t_est, R_gt, t_gt, pts)
    s = adi_error(R_est, t_est, R_gt, t_gt, pts)
    return jnp.where(is_sym, s, a)


# ---------------------------------------------------------------------------
# recall tables (host-side, numpy) — evaluator protocol parity
# ---------------------------------------------------------------------------

def recall_table(
    add_errs: np.ndarray,
    re_errs: np.ndarray,
    te_errs: np.ndarray,
    proj_errs: np.ndarray,
    diameter: float,
    ad_threshs=(0.02, 0.05, 0.10),
    rete_threshs=(2.0, 5.0, 10.0),
    proj_threshs=(2.0, 5.0, 10.0),
) -> dict[str, float]:
    """Compute the reference evaluator's recall table.

    ad_k:   ADD(-S) < k% of diameter     (gdrn_custom_evaluator.py:605-736)
    rete_k: re < k deg AND te < k cm;  re_k / te_k: individual
    proj_k: mean reprojection < k px
    Returns percentages (0-100) plus mean errors.
    """
    out: dict[str, float] = {}
    n = max(len(add_errs), 1)
    for th in ad_threshs:
        out[f"ad_{int(th * 100)}"] = 100.0 * float(np.sum(add_errs < th * diameter)) / n
    for th in rete_threshs:
        k = int(th)
        out[f"rete_{k}"] = 100.0 * float(
            np.sum((re_errs < th) & (te_errs < th / 100.0))) / n
        out[f"re_{k}"] = 100.0 * float(np.sum(re_errs < th)) / n
        out[f"te_{k}"] = 100.0 * float(np.sum(te_errs < th / 100.0)) / n
    for th in proj_threshs:
        out[f"proj_{int(th)}"] = 100.0 * float(np.sum(proj_errs < th)) / n
    out["re"] = float(np.mean(re_errs)) if len(re_errs) else 0.0
    out["te"] = float(np.mean(te_errs)) if len(te_errs) else 0.0
    return out


def auc_add(errs: np.ndarray, max_thresh: float = 0.10, step: float = 0.001) -> float:
    """Area-under-curve of ADD(-S) recall vs threshold, YCB-V protocol.

    Reference: lib/pysixd scripts use VOCap-style AUC up to 10cm.
    Returns percentage (0-100).
    """
    if len(errs) == 0:
        return 0.0
    threshs = np.arange(0.0, max_thresh + 1e-9, step)
    recalls = np.array([np.mean(errs < t) for t in threshs])
    return 100.0 * float(np.trapezoid(recalls, threshs) / max_thresh)
