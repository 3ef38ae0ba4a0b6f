"""Typed pose/detection containers (lib/structures parity).

The reference wraps tensors in Poses/Quaternions/Translations/Keypoints/Masks
classes (lib/structures/*.py). In a functional jax codebase these become
frozen chex dataclasses that ARE pytrees: they jit/vmap/shard transparently
while giving the same named-access + validation ergonomics.
"""

from __future__ import annotations

import chex
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@chex.dataclass(frozen=True)
class Poses:
    """Batch of rigid poses. R (N,3,3), t (N,3)."""
    R: Array
    t: Array

    @classmethod
    def create(cls, R, t) -> "Poses":
        R = jnp.asarray(R)
        t = jnp.asarray(t)
        chex.assert_shape(R, (None, 3, 3))
        chex.assert_shape(t, (None, 3))
        return cls(R=R, t=t)

    def __len__(self):
        return self.R.shape[0]

    def compose(self, other: "Poses") -> "Poses":
        """self ∘ other: apply `other` first."""
        return Poses(R=self.R @ other.R,
                     t=jnp.einsum("nij,nj->ni", self.R, other.t) + self.t)

    def inverse(self) -> "Poses":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return Poses(R=Rt, t=-jnp.einsum("nij,nj->ni", Rt, self.t))

    def transform(self, pts: Array) -> Array:
        """pts (N, P, 3) -> transformed points."""
        return jnp.einsum("nij,npj->npi", self.R, pts) + self.t[:, None]

    def as_matrix(self) -> Array:
        """(N, 3, 4) [R|t]."""
        return jnp.concatenate([self.R, self.t[..., None]], axis=-1)


@chex.dataclass(frozen=True)
class Boxes:
    """2D boxes, xyxy (N,4)."""
    xyxy: Array

    @property
    def centers(self) -> Array:
        return (self.xyxy[:, :2] + self.xyxy[:, 2:]) / 2.0

    @property
    def wh(self) -> Array:
        return self.xyxy[:, 2:] - self.xyxy[:, :2]

    def area(self) -> Array:
        wh = jnp.maximum(self.wh, 0.0)
        return wh[:, 0] * wh[:, 1]

    def scaled(self, factor: float) -> "Boxes":
        c = self.centers
        half = self.wh * factor / 2.0
        return Boxes(xyxy=jnp.concatenate([c - half, c + half], axis=1))

    def clipped(self, h: int, w: int) -> "Boxes":
        x1 = jnp.clip(self.xyxy[:, 0], 0, w - 1)
        y1 = jnp.clip(self.xyxy[:, 1], 0, h - 1)
        x2 = jnp.clip(self.xyxy[:, 2], 0, w - 1)
        y2 = jnp.clip(self.xyxy[:, 3], 0, h - 1)
        return Boxes(xyxy=jnp.stack([x1, y1, x2, y2], axis=1))


@chex.dataclass(frozen=True)
class Instances:
    """Per-image detection/annotation set with padded static shapes."""
    boxes: Boxes
    classes: Array        # (N,) int32
    scores: Array         # (N,)
    valid: Array          # (N,) bool

    def topk(self, k: int) -> "Instances":
        score = jnp.where(self.valid, self.scores, -jnp.inf)
        _, idx = jax.lax.top_k(score, k)
        return Instances(
            boxes=Boxes(xyxy=self.boxes.xyxy[idx]),
            classes=self.classes[idx], scores=self.scores[idx],
            valid=self.valid[idx])
