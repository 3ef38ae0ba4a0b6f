"""ResNet / ResNet-D / ResNeSt backbones in Flax (NHWC).

Functional parity with the reference's backbone registry
(core/gdrn_modeling/models/net_factory.py:37-73; default backbone
`timm/resnest50d`, configs/self6dpp/new_cfg/base.py:117-123) — re-designed
for TPU: NHWC layout, fused conv+BN inference mode via flax BatchNorm,
bfloat16 compute with float32 params/stats.

Padding is torch-exact (explicit symmetric pads, not XLA "SAME") so that
checkpoints imported via tools/convert_torch_weights.py reproduce the
reference activations bit-for-bit at stride-2 layers; verified numerically
against a torch twin in tests/test_weight_convert.py.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array

# torch Conv2d(k, stride, padding=k//2) pads symmetrically; XLA "SAME" pads
# asymmetrically at stride 2 — use explicit pads for torch weight parity.
_PAD1 = ((1, 1), (1, 1))
_PAD3 = ((3, 3), (3, 3))


class SplitAttention(nn.Module):
    """ResNeSt split-attention conv block (radix-wise soft attention).

    Semantics follow the ResNeSt paper (Zhang et al. 2020): the 3x3 conv
    produces radix*C channels; per-radix feature maps are summed, globally
    pooled, squeezed through an inter-channel bottleneck, and an r-softmax
    re-weights each radix branch.
    """

    features: int
    radix: int = 2
    reduction: int = 4
    strides: int = 1
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        C, r = self.features, self.radix
        y = nn.Conv(
            C * r, (3, 3), strides=(self.strides, self.strides), padding=_PAD1,
            feature_group_count=self.groups * r, use_bias=False, dtype=self.dtype,
        )(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(y)
        y = nn.relu(y)

        n, h, w, _ = y.shape
        y = y.reshape(n, h, w, r, C)
        gap = y.sum(axis=3).mean(axis=(1, 2))                     # (N, C)
        inter = max(C * r // self.reduction, 32)
        a = nn.Dense(inter, dtype=self.dtype)(gap)
        a = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(a)
        a = nn.relu(a)
        a = nn.Dense(C * r, dtype=self.dtype)(a).reshape(n, r, C)
        a = jax.nn.softmax(a, axis=1) if r > 1 else jax.nn.sigmoid(a)
        return (y * a[:, None, None, :, :]).sum(axis=3)           # (N, H, W, C)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    avg_down: bool = False
    dilation: int = 1       # >1 replaces striding in dilated-8s backbones
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)
        identity = x
        d = self.dilation
        pad = ((d, d), (d, d))
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=pad, kernel_dilation=(d, d),
                    use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(bn()(y))
        y = nn.Conv(self.features, (3, 3), padding=pad, kernel_dilation=(d, d),
                    use_bias=False, dtype=self.dtype)(y)
        y = bn()(y)
        if x.shape[-1] != self.features or self.strides != 1:
            if self.avg_down and self.strides != 1:
                identity = nn.avg_pool(identity, (2, 2), strides=(2, 2))
                identity = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(identity)
            else:
                identity = nn.Conv(self.features, (1, 1), strides=(self.strides, self.strides),
                                   use_bias=False, dtype=self.dtype)(identity)
            identity = bn()(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int           # bottleneck width; out = 4x
    strides: int = 1
    avg_down: bool = False
    use_splat: bool = False
    radix: int = 2
    dilation: int = 1       # >1 replaces striding in dilated-8s backbones
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)
        out_c = self.features * 4
        identity = x

        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(bn()(y))

        if self.use_splat:
            # ResNeSt-d: stride moves into an avg-pool AFTER the splat conv
            # (avd_first=False as in the reference's timm resnest50d)
            y = SplitAttention(self.features, radix=self.radix, dtype=self.dtype)(y, train=train)
            if self.strides != 1:
                y = nn.avg_pool(y, (3, 3), strides=(self.strides, self.strides),
                                padding=_PAD1)
        else:
            d = self.dilation
            y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                        padding=((d, d), (d, d)), kernel_dilation=(d, d),
                        use_bias=False, dtype=self.dtype)(y)
            y = nn.relu(bn()(y))

        y = nn.Conv(out_c, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = bn()(y)

        if x.shape[-1] != out_c or self.strides != 1:
            if self.avg_down and self.strides != 1:
                identity = nn.avg_pool(identity, (2, 2), strides=(2, 2))
                identity = nn.Conv(out_c, (1, 1), use_bias=False, dtype=self.dtype)(identity)
            else:
                identity = nn.Conv(out_c, (1, 1), strides=(self.strides, self.strides),
                                   use_bias=False, dtype=self.dtype)(identity)
            identity = bn()(identity)
        return nn.relu(y + identity)


_STAGE_SPECS = {
    # 'micro': 1 basic block per stage at 1/8 width — for fast test compiles
    "micro": ("basic", (1, 1, 1, 1)),
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet50d": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnest26d": ("splat", (2, 2, 2, 2)),
    "resnest50d": ("splat", (3, 4, 6, 3)),
}


class ResNetBackbone(nn.Module):
    """Four-stage ResNet; returns features at requested stage strides.

    out_indices: 1..4 -> strides 4, 8, 16, 32.
    '-d' variants use the deep 3-conv stem and avg-pool downsampling.
    """

    arch: str = "resnest50d"
    in_channels: int = 3
    out_indices: Sequence[int] = (4,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        block_kind, depths = _STAGE_SPECS[self.arch]
        deep_stem = self.arch.endswith("d")
        avg_down = deep_stem
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)

        # stem (stride 4 after maxpool)
        if deep_stem:
            for i, c in enumerate((32, 32, 64)):
                x = nn.Conv(c, (3, 3), strides=(2, 2) if i == 0 else (1, 1),
                            padding=_PAD1, use_bias=False, dtype=self.dtype)(x)
                x = nn.relu(bn()(x))
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=_PAD3,
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.relu(bn()(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=_PAD1)

        widths = (8, 16, 32, 64) if self.arch == "micro" else (64, 128, 256, 512)
        outs = []
        for stage, (w, d) in enumerate(zip(widths, depths), start=1):
            for blk in range(d):
                strides = 2 if (blk == 0 and stage > 1) else 1
                if block_kind == "basic":
                    x = BasicBlock(w, strides=strides, avg_down=avg_down,
                                   dtype=self.dtype)(x, train=train)
                elif block_kind == "bottleneck":
                    x = Bottleneck(w, strides=strides, avg_down=avg_down,
                                   dtype=self.dtype)(x, train=train)
                else:  # splat (ResNeSt)
                    x = Bottleneck(w, strides=strides, avg_down=avg_down,
                                   use_splat=True, dtype=self.dtype)(x, train=train)
            if stage in self.out_indices:
                outs.append(x)
        return outs if len(outs) > 1 else outs[0]
