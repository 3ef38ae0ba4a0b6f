"""PVNet dilated resnet-8s encoder-decoder backbone.

Parity target: core/gdrn_modeling/models/backbones/pvnet_net/
model_repository.py (Resnet18_8s / Resnet34_8s / Resnet50_8s) over
pvnet_net/resnet.py's fully-convolutional resnet (output_stride=8: stages 3
and 4 trade their stride for dilation 2 / 4). The decoder fuses skip
connections at strides 8/4/2 and returns a full-resolution feature map of
``raw_dim`` channels; pair it with GeoHeadConfig.name=
"ConvMaskXyzRegionHead" (the head family PVNet-style dense prediction
expects — no shipped reference config wires these backbones either,
net_factory.py:40-43; they exist for architecture-surface parity).

TPU notes: dilated convs lower to regular XLA convolutions (MXU-eligible);
the decoder's bilinear x2 upsamples are jax.image.resize, fused by XLA into
the surrounding convs' epilogues where profitable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .resnet import _PAD1, _PAD3, _STAGE_SPECS, BasicBlock, Bottleneck

Array = jax.Array


class PVNetResNet8s(nn.Module):
    """arch: resnet18 | resnet34 | resnet50 (the _8s reference trio)."""

    arch: str = "resnet18"
    in_channels: int = 3
    fcdim: int = 256
    s8dim: int = 128
    s4dim: int = 64
    s2dim: int = 32
    raw_dim: int = 32
    concat_input: bool = False
    # stride of the returned decoder feature: 1 = full resolution (the
    # reference's return value); 4/8 stop the decoder at the matching skip
    # fusion — GDRN pairs out_stride = input_res // output_res with the
    # ConvMaskXyzRegionHead so the dense maps land at output_res directly
    out_stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        block_kind, depths = _STAGE_SPECS[self.arch]
        bn = lambda: nn.BatchNorm(use_running_average=not train,
                                  momentum=0.9, dtype=self.dtype)

        def conv_bn_act(y, feats, act=nn.relu, leaky=False):
            y = nn.Conv(feats, (3, 3), padding=_PAD1, use_bias=False,
                        dtype=self.dtype)(y)
            y = bn()(y)
            return nn.leaky_relu(y, 0.1) if leaky else nn.relu(y)

        inp = x
        widths = ((8, 16, 32, 64) if self.arch == "micro"
                  else (64, 128, 256, 512))
        # stem: conv7x7 stride 2 -> x2s; maxpool -> stride 4
        y = nn.Conv(widths[0], (7, 7), strides=(2, 2), padding=_PAD3,
                    use_bias=False, dtype=self.dtype)(x)
        x2s = nn.relu(bn()(y))
        y = nn.max_pool(x2s, (3, 3), strides=(2, 2), padding=_PAD1)
        # output_stride=8: stage 3 dilates by 2, stage 4 by 4
        # (pvnet_net/resnet.py _make_layer's multi-grid-free dilation chain)
        stage_strides = (1, 2, 1, 1)
        stage_dilations = (1, 1, 2, 4)
        skips = {}
        for stage, (w, depth) in enumerate(zip(widths, depths), start=1):
            for blk in range(depth):
                strides = stage_strides[stage - 1] if blk == 0 else 1
                dil = stage_dilations[stage - 1]
                if block_kind == "basic":
                    y = BasicBlock(w, strides=strides, dilation=dil,
                                   dtype=self.dtype)(y, train=train)
                else:
                    y = Bottleneck(w, strides=strides, dilation=dil,
                                   dtype=self.dtype)(y, train=train)
            if stage == 1:
                skips["x4s"] = y
            elif stage == 2:
                skips["x8s"] = y

        # fc conv head at stride 8 (model_repository.py:34-39)
        xfc = conv_bn_act(y, self.fcdim)

        def up2(y):
            n, h, w, c = y.shape
            return jax.image.resize(y, (n, h * 2, w * 2, c), "bilinear")

        # decoder: cat skip, conv+BN+leakyrelu, x2 (model_repository.py:92-106)
        fm = conv_bn_act(jnp.concatenate([xfc, skips["x8s"]], -1),
                         self.s8dim, leaky=True)
        if self.out_stride == 8:
            return fm
        fm = up2(fm)
        fm = conv_bn_act(jnp.concatenate([fm, skips["x4s"]], -1),
                         self.s4dim, leaky=True)
        if self.out_stride == 4:
            return fm
        fm = up2(fm)
        fm = conv_bn_act(jnp.concatenate([fm, x2s], -1),
                         self.s2dim, leaky=True)
        fm = up2(fm)
        if self.concat_input:
            fm = jnp.concatenate([fm, inp], -1)
        return conv_bn_act(fm, self.raw_dim, leaky=True)
