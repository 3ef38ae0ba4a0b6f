"""Bidirectional nearest-neighbor (chamfer) distance — MXU matmul form.

Parity target: core/csrc/torch_nndistance (NmDistanceKernel,
nnd_cuda_kernel.cu:8 — shared-mem tiled pairwise distances) and its user
core/self6dpp/losses/depth_bp_chamfer_loss.py:12-60 (threshold-filtered
masked chamfer between backprojected rendered/observed depths).

The CUDA kernel's tiling becomes |a-b|² = |a|² + |b|² - 2a·b with the cross
term on the MXU; variable point counts become padded points + weight masks
(SURVEY.md §7 'fixed shapes everywhere').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def nn_distance(p1: Array, p2: Array, w1: Array | None = None,
                w2: Array | None = None) -> tuple[Array, Array]:
    """Squared NN distances both ways.

    p1 (B, N, 3), p2 (B, M, 3); w1/w2 boolean or {0,1} float validity masks.
    Returns (d1 (B,N): min over valid p2; d2 (B,M)). Invalid *query* rows get
    d=0 so masked reductions ignore them; invalid *target* rows never win.
    """
    sq1 = jnp.sum(p1 * p1, axis=-1)
    sq2 = jnp.sum(p2 * p2, axis=-1)
    cross = jnp.einsum("bnd,bmd->bnm", p1, p2)
    d = sq1[:, :, None] + sq2[:, None, :] - 2.0 * cross            # (B,N,M)
    d = jnp.maximum(d, 0.0)
    big = jnp.asarray(jnp.inf, d.dtype)
    if w2 is not None:
        d1 = jnp.where(w2[:, None, :] > 0, d, big).min(axis=2)
    else:
        d1 = d.min(axis=2)
    if w1 is not None:
        d2 = jnp.where(w1[:, :, None] > 0, d, big).min(axis=1)
    else:
        d2 = d.min(axis=1)
    if w1 is not None:
        d1 = jnp.where(w1 > 0, d1, 0.0)
    if w2 is not None:
        d2 = jnp.where(w2 > 0, d2, 0.0)
    # guard: if one side is fully invalid, inf-min leaks through
    d1 = jnp.where(jnp.isfinite(d1), d1, 0.0)
    d2 = jnp.where(jnp.isfinite(d2), d2, 0.0)
    return d1, d2


def chamfer_loss(p1: Array, p2: Array, w1: Array | None = None,
                 w2: Array | None = None, dist_thr: float = 0.0,
                 center_lw: float = 0.0) -> Array:
    """Masked, threshold-filtered chamfer (depth_bp_chamfer_loss.py:38-54):
    distances above dist_thr (occlusion outliers) are dropped from the mean;
    optional center-offset term compares masked centroids."""
    d1, d2 = nn_distance(p1, p2, w1, w2)
    m1 = w1 if w1 is not None else jnp.ones(p1.shape[:2], p1.dtype)
    m2 = w2 if w2 is not None else jnp.ones(p2.shape[:2], p2.dtype)
    if dist_thr > 0:
        m1 = m1 * (d1 < dist_thr ** 2)
        m2 = m2 * (d2 < dist_thr ** 2)
    loss = (d1 * m1).sum() / jnp.maximum(m1.sum(), 1.0) \
         + (d2 * m2).sum() / jnp.maximum(m2.sum(), 1.0)
    if center_lw > 0:
        c1 = (p1 * m1[..., None]).sum(1) / jnp.maximum(m1.sum(1, keepdims=True), 1.0)
        c2 = (p2 * m2[..., None]).sum(1) / jnp.maximum(m2.sum(1, keepdims=True), 1.0)
        loss = loss + center_lw * jnp.abs(c1 - c2).mean()
    return loss
