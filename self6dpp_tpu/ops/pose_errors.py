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


def mssd_error(R_est, t_est, R_gt, t_gt, pts, sym_rots, sym_valid) -> Array:
    """Maximum symmetry-aware surface distance (BOP19,
    lib/pysixd/pose_error.py:131): min over sym poses of the max point
    distance. pts (...,N,3); sym_rots (...,S,3,3); sym_valid (...,S)."""
    pe = transform_pts(pts, R_est, t_est)                       # (...,N,3)
    R_sym = jnp.einsum("...ij,...sjk->...sik", R_gt, sym_rots)  # (...,S,3,3)
    pg = jnp.einsum("...sij,...nj->...sni", R_sym, pts) + t_gt[..., None, None, :]
    d = jnp.linalg.norm(pe[..., None, :, :] - pg, axis=-1)      # (...,S,N)
    dmax = d.max(axis=-1)                                       # (...,S)
    return jnp.where(sym_valid, dmax, jnp.inf).min(axis=-1)


def mspd_error(R_est, t_est, R_gt, t_gt, K, pts, sym_rots, sym_valid) -> Array:
    """Maximum symmetry-aware projection distance (BOP19, pose_error.py:156)."""
    pe = project_pts(pts, K, R_est, t_est)                      # (...,N,2)
    S = sym_rots.shape[-3]
    R_sym = jnp.einsum("...ij,...sjk->...sik", R_gt, sym_rots)
    Kb = jnp.broadcast_to(K[..., None, :, :], R_sym.shape[:-2] + (3, 3))
    tb = jnp.broadcast_to(t_gt[..., None, :], R_sym.shape[:-2] + (3,))
    pts_b = jnp.broadcast_to(pts[..., None, :, :],
                             R_sym.shape[:-2] + pts.shape[-2:])
    pg = project_pts(pts_b, Kb, R_sym, tb)                      # (...,S,N,2)
    d = jnp.linalg.norm(pe[..., None, :, :] - pg, axis=-1)
    dmax = d.max(axis=-1)
    return jnp.where(sym_valid, dmax, jnp.inf).min(axis=-1)


def vsd_error(depth_est: Array, depth_gt: Array, depth_obs: Array,
              taus=(0.05,), delta: float = 0.015) -> Array:
    """Visible surface discrepancy (BOP, pose_error.py:22) from pre-rendered
    depth maps (use ops.rasterizer hard mode): mean over visible pixels of
    1[|d_est - d_gt| > tau], averaged over taus. depth_* (..., H, W)."""
    vis_gt = (depth_gt > 0) & (
        (depth_obs <= 0) | (depth_gt < depth_obs + delta))
    vis_est = (depth_est > 0) & (
        (depth_obs <= 0) | (depth_est < depth_obs + delta))
    vis = vis_gt | vis_est
    n = jnp.maximum(vis.sum(axis=(-2, -1)), 1)
    costs = []
    for tau in taus:
        diff = jnp.abs(depth_est - depth_gt)
        err = jnp.where(vis_gt & vis_est, (diff > tau).astype(jnp.float32),
                        1.0)
        costs.append(jnp.where(vis, err, 0.0).sum(axis=(-2, -1)) / n)
    return jnp.stack(costs, axis=0).mean(axis=0)


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
