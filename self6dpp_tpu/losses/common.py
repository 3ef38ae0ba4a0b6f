"""Elementary loss helpers shared across models (pure jnp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def l1(pred: Array, gt: Array) -> Array:
    return jnp.abs(pred - gt)


def l2(pred: Array, gt: Array, eps: float = 1e-8) -> Array:
    """Euclidean norm over the last axis (reference losses/l2_loss.py)."""
    return jnp.sqrt(jnp.sum((pred - gt) ** 2, axis=-1) + eps)


def mse(pred: Array, gt: Array) -> Array:
    return (pred - gt) ** 2


def smooth_l1(pred: Array, gt: Array, beta: float = 1.0) -> Array:
    d = jnp.abs(pred - gt)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def reduce(x: Array, reduction: str = "mean") -> Array:
    if reduction == "mean":
        return x.mean()
    if reduction == "sum":
        return x.sum()
    return x


def pointwise_loss(name: str, pred: Array, gt: Array, beta: float = 1.0) -> Array:
    name = name.lower()
    if name == "l1":
        return l1(pred, gt)
    if name in ("mse", "l2sq"):
        return mse(pred, gt)
    if name == "smooth_l1":
        return smooth_l1(pred, gt, beta)
    raise ValueError(f"unknown pointwise loss: {name}")


def sigmoid_bce(logits: Array, targets: Array) -> Array:
    """Numerically-stable BCEWithLogits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def softmax_ce(logits: Array, labels: Array, axis: int = -1) -> Array:
    """Cross entropy with integer labels along `axis`."""
    logp = jax.nn.log_softmax(logits, axis=axis)
    lab = jnp.expand_dims(labels, axis)
    return -jnp.take_along_axis(logp, lab, axis=axis).squeeze(axis)
