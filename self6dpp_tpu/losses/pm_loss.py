"""Point-matching (PM) loss with symmetry handling, fully batched.

Parity target: core/gdrn_modeling/losses/pm_loss.py (PyPMLoss) and
core/utils/pose_utils.py get_closest_rot_batch. The reference iterates over
per-instance python lists of symmetry rotations; here symmetries are a padded
(B, S, 3, 3) tensor + validity mask so the closest-sym search is one
vectorized argmin — jittable and MXU-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.geometry import transform_pts
from .common import pointwise_loss

Array = jax.Array


def closest_sym_rot(pred_R: Array, gt_R: Array, sym_rots: Array,
                    sym_valid: Array) -> Array:
    """For each instance pick gt_R @ S_k minimizing geodesic distance to pred_R.

    pred_R, gt_R: (B, 3, 3); sym_rots: (B, S, 3, 3); sym_valid: (B, S) bool.
    Identity must be included in the sym set (slot 0 by convention).
    """
    cand = jnp.einsum("bij,bsjk->bsik", gt_R, sym_rots)          # (B,S,3,3)
    m = jnp.einsum("bij,bskj->bsik", pred_R, cand)               # pred @ candᵀ
    tr = jnp.trace(m, axis1=-2, axis2=-1)                        # (B,S)
    score = jnp.where(sym_valid, tr, -jnp.inf)                   # larger = closer
    idx = jnp.argmax(score, axis=1)
    return jnp.take_along_axis(cand, idx[:, None, None, None], axis=1)[:, 0]


def pm_loss(
    pred_rots: Array,            # (B, 3, 3)
    gt_rots: Array,              # (B, 3, 3)
    points: Array,               # (B, N, 3) model points
    pred_transes: Array | None = None,
    gt_transes: Array | None = None,
    extents: Array | None = None,
    sym_rots: Array | None = None,     # (B, S, 3, 3) padded, identity in slot 0
    sym_valid: Array | None = None,    # (B, S)
    loss_type: str = "l1",
    beta: float = 1.0,
    loss_weight: float = 1.0,
    norm_by_extent: bool = False,
    symmetric: bool = False,
    disentangle_t: bool = False,
    disentangle_z: bool = False,
    t_loss_use_points: bool = True,
    r_only: bool = False,
) -> dict[str, Array]:
    """Returns a dict of weighted loss terms (keys mirror the reference)."""
    if symmetric:
        assert sym_rots is not None and sym_valid is not None
        gt_rots = closest_sym_rot(pred_rots, gt_rots, sym_rots, sym_valid)

    points_est = transform_pts(points, pred_rots)
    points_tgt = transform_pts(points, gt_rots)

    if norm_by_extent:
        assert extents is not None
        w = 1.0 / jnp.maximum(extents.max(axis=1), 1e-6)
        weights = w[:, None, None]
    else:
        weights = 1.0

    pl = lambda a, b: pointwise_loss(loss_type, a, b, beta)
    out: dict[str, Array] = {}

    if r_only or pred_transes is None:
        out["loss_PM_R"] = pl(weights * points_est, weights * points_tgt).mean() * 3.0
    elif disentangle_z:
        # R / xy / z disentangled (reference pm_loss.py:135-170)
        out["loss_PM_R"] = pl(weights * points_est, weights * points_tgt).mean() * 3.0
        if t_loss_use_points:
            pts_xy = points_tgt + jnp.concatenate(
                [pred_transes[:, :2], gt_transes[:, 2:3]], axis=1)[:, None, :]
            pts_z = points_tgt + jnp.concatenate(
                [gt_transes[:, :2], pred_transes[:, 2:3]], axis=1)[:, None, :]
            tgt = points_tgt + gt_transes[:, None, :]
            out["loss_PM_xy"] = pl(weights * pts_xy, weights * tgt).mean() * 3.0
            out["loss_PM_z"] = pl(weights * pts_z, weights * tgt).mean() * 3.0
        else:
            out["loss_PM_xy_noP"] = pl(pred_transes[:, :2], gt_transes[:, :2]).mean()
            out["loss_PM_z_noP"] = pl(pred_transes[:, 2], gt_transes[:, 2]).mean()
    elif disentangle_t:
        out["loss_PM_R"] = pl(weights * points_est, weights * points_tgt).mean() * 3.0
        if t_loss_use_points:
            pts_t = points_tgt + pred_transes[:, None, :]
            tgt = points_tgt + gt_transes[:, None, :]
            out["loss_PM_T"] = pl(weights * pts_t, weights * tgt).mean() * 3.0
        else:
            out["loss_PM_T_noP"] = pl(pred_transes, gt_transes).mean()
    else:
        est = points_est + pred_transes[:, None, :]
        tgt = points_tgt + gt_transes[:, None, :]
        out["loss_PM_RT"] = pl(weights * est, weights * tgt).mean() * 3.0

    return {k: v * loss_weight for k, v in out.items()}
