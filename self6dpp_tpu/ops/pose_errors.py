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


def depth_to_dist(depth: Array, K: Array) -> Array:
    """Depth image -> distance image (misc.depth_im_to_dist_im_fast,
    lib/pysixd/misc.py:634): multiply each pixel's Z by the norm of its
    viewing ray. depth (..., H, W); K (..., 3, 3)."""
    H, W = depth.shape[-2], depth.shape[-1]
    fx = K[..., 0, 0][..., None, None]
    fy = K[..., 1, 1][..., None, None]
    cx = K[..., 0, 2][..., None, None]
    cy = K[..., 1, 2][..., None, None]
    xs = jnp.arange(W, dtype=depth.dtype)
    ys = jnp.arange(H, dtype=depth.dtype)
    xn = (xs[None, :] - cx) / fx                 # (..., 1|H, W)
    yn = (ys[:, None] - cy) / fy
    ray = jnp.sqrt(xn * xn + yn * yn + 1.0)
    return depth * ray


def vsd_error(depth_est: Array, depth_gt: Array, depth_obs: Array,
              taus=(0.05,), delta: float = 0.015, K: Array | None = None,
              diameter: Array | float | None = None) -> Array:
    """BOP19 Visible Surface Discrepancy (lib/pysixd/pose_error.py:22-128,
    'step' cost, visib_mode 'bop19' — lib/pysixd/visibility.py:34-37,75-76).

    depth_* (..., H, W): rendered est/gt depths (ops.rasterizer hard mode)
    and the observed scene depth (zeros when no depth sensor — every
    rendered pixel then counts visible, exactly what the toolkit computes
    for d_test=0). Pass K to convert depths to distance images first (the
    toolkit always does); pass diameter to normalize pixel distances
    (BOP19 vsd_normalized_by_diameter=True — taus are then fractions of
    the diameter). Returns (..., len(taus)).
    """
    if K is not None:
        depth_est = depth_to_dist(depth_est, K)
        depth_gt = depth_to_dist(depth_gt, K)
        depth_obs = depth_to_dist(depth_obs, K)
    # visibility masks: object VISIBLE at missing-depth pixels (bop19 mode)
    visib_gt = (depth_gt > 0) & (
        ((depth_gt - depth_obs) <= delta) | (depth_obs == 0))
    ve = (depth_est > 0) & (
        ((depth_est - depth_obs) <= delta) | (depth_obs == 0))
    visib_est = ve | (visib_gt & (depth_est > 0))
    inter = visib_gt & visib_est
    union = visib_gt | visib_est
    union_n = union.sum(axis=(-2, -1))
    comp_n = union_n - inter.sum(axis=(-2, -1))
    dists = jnp.abs(depth_gt - depth_est)
    if diameter is not None:
        dists = dists / jnp.asarray(diameter)[..., None, None]
    errs = []
    for tau in taus:
        costs = ((dists >= tau) & inter).sum(axis=(-2, -1))
        e = (costs + comp_n) / jnp.maximum(union_n, 1)
        errs.append(jnp.where(union_n == 0, 1.0, e))
    return jnp.stack(errs, axis=-1)


# ---------------------------------------------------------------------------
# BOP19 average-recall aggregation (host-side, numpy)
# ---------------------------------------------------------------------------

# correctness thresholds (eval_pose_results_more.py:58-70): VSD/MSSD
# theta in 0.05..0.50 step 0.05 (fractions of error / of diameter);
# MSPD theta in 5..50 px step 5 after the 640/im_width scaling
BOP19_TH = tuple(np.arange(0.05, 0.51, 0.05).tolist())
BOP19_MSPD_TH = tuple(range(5, 51, 5))


def bop19_average_recalls(vsd_errs: np.ndarray, mssd_errs: np.ndarray,
                          mspd_errs: np.ndarray, diameter: float,
                          im_width: int) -> dict[str, float]:
    """BOP19 AR scores for one object (SISO matching: one estimate per GT).

    vsd_errs (N, 10): per-tau VSD errors (taus = BOP19_TH fractions of the
    diameter, vsd_error with diameter normalization); mssd_errs (N,) metres
    — normalized by the diameter before thresholding
    (eval_calc_scores.py:70,249-253); mspd_errs (N,) px — scaled by
    640/im_width (:258). AR_x = mean recall over the threshold grid
    (× taus for VSD); bop19_ar = their mean (eval_pose_results_more.py:
    365-371). Returns percentages.
    """
    if len(mssd_errs) == 0:
        return {"ar_vsd": 0.0, "ar_mssd": 0.0, "ar_mspd": 0.0,
                "bop19_ar": 0.0}
    v = np.asarray(vsd_errs)
    ar_vsd = float(np.mean([
        (v[:, i] < th).mean() for i in range(v.shape[1])
        for th in BOP19_TH]))
    mssd_n = np.asarray(mssd_errs) / diameter
    ar_mssd = float(np.mean([(mssd_n < th).mean() for th in BOP19_TH]))
    mspd_n = np.asarray(mspd_errs) * 640.0 / im_width
    ar_mspd = float(np.mean([(mspd_n < th).mean() for th in BOP19_MSPD_TH]))
    return {
        "ar_vsd": 100.0 * ar_vsd,
        "ar_mssd": 100.0 * ar_mssd,
        "ar_mspd": 100.0 * ar_mspd,
        "bop19_ar": 100.0 * (ar_vsd + ar_mssd + ar_mspd) / 3.0,
    }


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
