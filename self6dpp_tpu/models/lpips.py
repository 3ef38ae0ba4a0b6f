"""LPIPS perceptual distance (AlexNet variant) in Flax.

Parity target: external/PerceptualSimilarity (dist_model.py /
networks_basic.py PNetLin with AlexNet features) used as the stage-II
perceptual loss via core/self6dpp/losses/perceptual_loss.py:17-24.

Structure: 5 AlexNet conv stages -> channel-unit-normalize each feature map
-> squared difference -> learned 1x1 linear weights -> spatial mean -> sum
over stages. Weights (backbone + linear heads) can be loaded from an .npz
(converted from the reference checkpoint); default is deterministic random
init, which still yields a structured multi-scale perceptual distance.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

Array = jax.Array

# ImageNet normalization used by PerceptualSimilarity (scaling layer)
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


class AlexNetFeatures(nn.Module):
    """AlexNet conv trunk; returns relu1..relu5 feature maps (NHWC)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        feats = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x); feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), dtype=self.dtype,
                    name="conv2")(x)
        x = nn.relu(x); feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv3")(x)
        x = nn.relu(x); feats.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv4")(x)
        x = nn.relu(x); feats.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv5")(x)
        x = nn.relu(x); feats.append(x)
        return feats


class LPIPS(nn.Module):
    """Returns per-sample LPIPS distance between two (B, H, W, 3) images in
    [0, 1] (internally rescaled to [-1, 1] then ImageNet-normalized)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img1: Array, img2: Array) -> Array:
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)

        def prep(x):
            x = 2.0 * x - 1.0
            return (x - shift) / scale

        net = AlexNetFeatures(dtype=self.dtype, name="alex")
        f1 = net(prep(img1))
        f2 = net(prep(img2))

        total = 0.0
        for i, (a, b) in enumerate(zip(f1, f2)):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.uniform(0.1),
                           (a.shape[-1],))
            d = (d * jnp.abs(w)).sum(-1)          # nonneg linear head
            total = total + d.mean(axis=(1, 2))
        return total


def load_lpips_params(path: str) -> dict | None:
    """Load converted LPIPS weights from an .npz of flat 'name: array' pairs
    (torch OIHW conv kernels are transposed to HWIO)."""
    if not os.path.exists(path):
        return None
    raw = dict(np.load(path))
    params: dict = {"alex": {}}
    for i in range(1, 6):
        k = raw[f"conv{i}.weight"].transpose(2, 3, 1, 0)
        b = raw[f"conv{i}.bias"]
        params["alex"][f"conv{i}"] = {"kernel": jnp.asarray(k),
                                      "bias": jnp.asarray(b)}
    for i in range(5):
        params[f"lin{i}"] = jnp.asarray(raw[f"lin{i}.weight"].reshape(-1))
    return params
