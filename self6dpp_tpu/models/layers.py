"""Shared Flax layers. NHWC everywhere (XLA TPU's preferred conv layout)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


def get_act(name: str) -> Callable[[Array], Array]:
    name = name.lower()
    if name in ("relu",):
        return nn.relu
    if name in ("lrelu", "leakyrelu", "leaky_relu"):
        return lambda x: nn.leaky_relu(x, negative_slope=0.1)
    if name in ("gelu",):
        # exact erf form (torch nn.GELU default; jax defaults to tanh approx)
        return lambda x: nn.gelu(x, approximate=False)
    if name in ("silu", "swish"):
        return nn.silu
    if name in ("mish",):
        return lambda x: x * jnp.tanh(nn.softplus(x))
    if name in ("sigmoid",):
        return nn.sigmoid
    if name in ("none", "identity"):
        return lambda x: x
    raise ValueError(f"unknown act: {name}")


class ConvNormAct(nn.Module):
    """conv -> norm -> act (reference lib/torch_utils/layers/conv_module.py)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    norm: str = "GN"
    num_gn_groups: int = 32
    act: str = "gelu"
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME",
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        x = make_norm(self.norm, self.num_gn_groups, dtype=self.dtype)(x, train=train)
        return get_act(self.act)(x)


class Norm(nn.Module):
    """Dispatchable norm layer; BN carries running stats via `batch_stats`."""

    kind: str = "GN"
    num_gn_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.kind == "GN":
            groups = min(self.num_gn_groups, x.shape[-1])
            while x.shape[-1] % groups != 0:
                groups -= 1
            # epsilon matches torch GroupNorm (1e-5; flax default is 1e-6)
            return nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=self.dtype)(x)
        if self.kind == "BN":
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype
            )(x)
        if self.kind in ("none", ""):
            return x
        raise ValueError(f"unknown norm: {self.kind}")


def make_norm(kind: str, num_gn_groups: int = 32, dtype=jnp.float32) -> Norm:
    return Norm(kind=kind, num_gn_groups=num_gn_groups, dtype=dtype)


def upsample2x(x: Array, method: str = "bilinear") -> Array:
    """2x spatial upsample, NHWC."""
    n, h, w, c = x.shape
    if method == "nearest":
        return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="nearest")
    # align_corners=True bilinear (torch UpsamplingBilinear2d parity)
    return _resize_align_corners(x, 2 * h, 2 * w)


def _resize_align_corners(x: Array, out_h: int, out_w: int) -> Array:
    """Bilinear resize with align_corners=True semantics (torch parity).

    jax.image.resize implements half-pixel centers; torch's
    UpsamplingBilinear2d (used by the reference geo head,
    top_down_mask_xyz_region_head.py:75) aligns corner pixels.
    """
    n, h, w, c = x.shape
    ys = jnp.linspace(0.0, h - 1.0, out_h)
    xs = jnp.linspace(0.0, w - 1.0, out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class ConvTranspose2x(nn.Module):
    """Stride-2 transposed conv used by 'deconv' up-blocks.

    Matches torch ConvTranspose2d(k=3, stride=2, padding=1, output_padding=1)
    output sizing (exactly 2x).
    """

    features: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_size
        y = nn.ConvTranspose(
            self.features,
            (k, k),
            strides=(2, 2),
            padding=((k - 1, k - 1), (k - 1, k - 1)) if k != 4 else "SAME",
            use_bias=False,
            dtype=self.dtype,
        )(x)
        # torch ConvTranspose2d(k=3, s=2, p=1, op=1) equals this padded
        # conv_transpose cropped at offset k-1-p = (k-1)//2 (verified against
        # torch in tests/test_weight_convert.py; imported kernels are
        # spatially flipped by the converter since lax.conv_transpose does
        # not flip). k=4 keeps the 'SAME' path (exact 2x already).
        n, h, w, c = y.shape
        th, tw = 2 * x.shape[1], 2 * x.shape[2]
        if (h, w) != (th, tw):
            oy = ox = (k - 1) // 2
            y = y[:, oy : oy + th, ox : ox + tw, :]
        return y


class DropBlock(nn.Module):
    """DropBlock2D regularizer (reference lib/torch_utils/layers/dropblock.py).

    Spatially-structured dropout: drops contiguous blocks, implemented as
    max-pool dilation of a Bernoulli seed mask — fully vectorized.
    """

    drop_prob: float = 0.0
    block_size: int = 5

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if not train or self.drop_prob <= 0.0:
            return x
        rng = self.make_rng("dropout")
        n, h, w, c = x.shape
        gamma = (
            self.drop_prob
            / (self.block_size ** 2)
            * (h * w)
            / max((h - self.block_size + 1) * (w - self.block_size + 1), 1)
        )
        seed = jax.random.bernoulli(rng, gamma, (n, h, w, 1)).astype(x.dtype)
        block = nn.max_pool(
            seed,
            (self.block_size, self.block_size),
            strides=(1, 1),
            padding="SAME",
        )
        keep = 1.0 - block
        denom = jnp.maximum(keep.mean(axis=(1, 2, 3), keepdims=True), 1e-6)
        return x * keep / denom
