"""Darknet-53 backbone (YOLOv3 trunk).

Parity target: the reference's mmdetection-style Darknet backbone registered
for GDRN (core/gdrn_modeling/models/backbones/mm_nets/darknet.py:1-202,
net_factory.py:7,38) — conv-BN-LeakyReLU stem, five downsample stages with
(1, 2, 8, 8, 4) residual blocks. No reference config selects it (every
shipped config uses the timm resnet/resnest family), so this is registry
breadth: stride-32 output, drop-in for `BackboneConfig.name="darknet53"`.

TPU notes: plain 3x3/1x1 convs in NHWC — XLA fuses the BN+LeakyReLU chains
into the conv epilogues; no custom kernels warranted.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
_PAD1 = ((1, 1), (1, 1))


class _ConvUnit(nn.Module):
    out_c: int
    kernel: int = 3
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        pad = ((self.kernel // 2,) * 2,) * 2
        x = nn.Conv(self.out_c, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides), padding=pad,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.1)


class _ResBlock(nn.Module):
    """1x1 half-width squeeze -> 3x3 expand + residual (darknet.py:24-60)."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        y = _ConvUnit(self.channels // 2, kernel=1, dtype=self.dtype)(x, train)
        y = _ConvUnit(self.channels, kernel=3, dtype=self.dtype)(y, train)
        return x + y


class DarknetBackbone(nn.Module):
    """Darknet-53; returns features at the requested stage strides
    (out_indices 1..5 -> strides 2, 4, 8, 16, 32)."""

    depths: Sequence[int] = (1, 2, 8, 8, 4)
    base_width: int = 32
    out_indices: Sequence[int] = (5,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        x = _ConvUnit(self.base_width, kernel=3, dtype=self.dtype)(x, train)
        outs = []
        c = self.base_width
        for stage, d in enumerate(self.depths, start=1):
            c *= 2
            x = _ConvUnit(c, kernel=3, strides=2, dtype=self.dtype)(x, train)
            for _ in range(d):
                x = _ResBlock(c, dtype=self.dtype)(x, train)
            if stage in self.out_indices:
                outs.append(x)
        return outs if len(outs) > 1 else outs[0]
