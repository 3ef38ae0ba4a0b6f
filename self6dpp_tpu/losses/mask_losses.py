"""Mask losses: BCE, reweighted-EX BCE, soft dice, L1, CE.

Parity target: core/gdrn_modeling/losses/mask_losses.py
(weighted_ex_loss_probs:63, soft_dice_loss:442). The reference's boolean
fancy indexing becomes masked arithmetic — same values, static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import sigmoid_bce, softmax_ce

Array = jax.Array


def weighted_ex_loss_probs(probs: Array, target: Array,
                           weight: Array | None = None) -> Array:
    """Integral-object-mining EX loss on probabilities.

    pos pixels (target>0): -target*log(p); neg: -log(1-p); each term averaged
    over its own pixel count, then summed.
    """
    probs = jnp.clip(probs, 1e-7, 1 - 1e-7)
    pos = (target > 0).astype(probs.dtype)
    neg = (target == 0).astype(probs.dtype)
    w = weight if weight is not None else 1.0
    pos_loss = -target * jnp.log(probs) * w * pos
    neg_loss = -jnp.log(1 - probs + 1e-8) * w * neg
    num_pos = jnp.maximum(pos.sum(), 1.0)
    num_neg = jnp.maximum(neg.sum(), 1.0)
    return pos_loss.sum() / num_pos + neg_loss.sum() / num_neg


def soft_dice_loss(probs: Array, labels: Array, smooth: float = 0.0,
                   eps: float = 1e-7, reduction: str = "mean") -> Array:
    b = probs.shape[0]
    m1 = probs.reshape(b, -1)
    m2 = labels.reshape(b, -1)
    inter = (m1 * m2).sum(axis=1)
    score = 2.0 * (inter + smooth) / (m1.sum(axis=1) + m2.sum(axis=1) + smooth + eps)
    loss = 1.0 - score
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def mask_loss(out_mask: Array, gt_mask: Array, loss_type: str = "BCE") -> Array:
    """Dispatch over the reference's MASK_LOSS_TYPE options (GDRN.py:341-361).

    out_mask: (B, H, W, C) logits (C=1 except CE); gt_mask: (B, H, W).
    """
    if loss_type == "L1":
        return jnp.abs(out_mask[..., 0] - gt_mask).mean()
    if loss_type == "BCE":
        return sigmoid_bce(out_mask[..., 0], gt_mask).mean()
    if loss_type == "RW_BCE":
        return weighted_ex_loss_probs(jax.nn.sigmoid(out_mask[..., 0]), gt_mask)
    if loss_type == "dice":
        return soft_dice_loss(jax.nn.sigmoid(out_mask[..., 0]), gt_mask, eps=0.002)
    if loss_type == "CE":
        return softmax_ce(out_mask, gt_mask.astype(jnp.int32), axis=-1).mean()
    raise ValueError(f"unknown mask loss: {loss_type}")


def get_mask_prob(mask_logits: Array, loss_type: str = "BCE") -> Array:
    """Logits -> probability map, matching how each loss type trains the head
    (reference models/model_utils.py get_mask_prob)."""
    if loss_type in ("BCE", "RW_BCE", "dice"):
        return jax.nn.sigmoid(mask_logits[..., :1])
    if loss_type == "L1":
        return mask_logits[..., :1]
    if loss_type == "CE":
        return jax.nn.softmax(mask_logits, axis=-1)[..., 1:2]
    raise ValueError(f"unknown mask loss: {loss_type}")
