"""Flow EPE losses (core/deepim/losses/flow_loss.py: one_scale_EPE,
multiscaleEPE) — valid-masked endpoint error, with mean downscaling of GT to
each prediction scale."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _downscale(x: Array, factor: int) -> Array:
    """Average-pool (B, H, W, C) by integer factor."""
    if factor == 1:
        return x
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, factor, factor, 1), (1, factor, factor, 1),
        "VALID") / float(factor * factor)


def one_scale_epe(pred_flow: Array, gt_flow: Array, valid: Array,
                  div_flow: float = 1.0) -> Array:
    """pred_flow (B, h, w, 2); gt_flow (B, H, W, 2) full-res; valid (B, H, W).

    GT flow and validity are average-pooled to the prediction scale; the flow
    values are scaled by the spatial ratio so units stay consistent.
    """
    H, h = gt_flow.shape[1], pred_flow.shape[1]
    factor = H // h
    gt = _downscale(gt_flow, factor) / factor
    v = _downscale(valid[..., None], factor)[..., 0]
    epe = jnp.linalg.norm(pred_flow * div_flow - gt, axis=-1)
    return (epe * v).sum() / jnp.maximum(v.sum(), 1.0)


def multiscale_epe(pred_flows: list[Array], gt_flow: Array, valid: Array,
                   weights: tuple[float, ...] = (0.005, 0.01, 0.02, 0.08, 0.32),
                   ) -> Array:
    """flow2..flow6 weighted EPE sum (FlowNet training protocol)."""
    total = 0.0
    for w, pf in zip(weights, pred_flows):
        total = total + w * one_scale_epe(pf, gt_flow, valid)
    return total
