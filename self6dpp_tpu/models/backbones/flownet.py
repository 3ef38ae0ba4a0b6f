"""FlowNetS encoder/decoder in Flax (NHWC).

Parity target: core/deepim/models/backbones/flownets.py:18-180 — 6-level
conv encoder (7/5/5/3... kernels, stride-2 halvings to 1/64) and the flow
decoder (predict_flow + deconv + upsampled-flow concat chain) emitting
flow4 (or all of flow2..flow6) plus the concat4 deconv feature used by the
DeepIM mask head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class _Conv(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    use_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch-exact symmetric padding (k-1)//2 (flownets.py conv())
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    use_bias=not self.use_bn, dtype=self.dtype)(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(x)
        return _leaky(x)


class _Deconv(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch ConvTranspose2d(4, stride 2, pad 1, bias=True) == flax SAME
        # transpose conv with k=4,s=2 (same sizing AND same symmetric pads;
        # imported kernels are spatially flipped by the converter)
        return _leaky(nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                                       padding="SAME", use_bias=True,
                                       dtype=self.dtype)(x))


class _PredictFlow(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # reference predict_flow: conv3x3, bias=True (flownets.py:239)
        return nn.Conv(2, (3, 3), padding="SAME", use_bias=True,
                       dtype=self.dtype)(x)


class _UpFlow(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(2, (4, 4), strides=(2, 2), padding="SAME",
                                use_bias=False, dtype=self.dtype)(x)


class FlowNetS(nn.Module):
    in_channels: int = 6
    use_bn: bool = False
    out_flow_level: str = "flow4"     # flow4 | all | none
    out_concat4: bool = True
    # per-level encoder widths (levels 1-6); decoder deconv widths follow the
    # reference coupling deconv_l = widths[l-2] (flownets.py:18-60). Non-
    # default widths keep every module NAME identical, so the torch-import
    # key map (tools/convert_torch_weights.py::flownet_key_map) applies to
    # scaled variants — the golden conversion fixture uses a micro instance.
    widths: tuple[int, ...] = (64, 128, 256, 512, 512, 1024)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        """x (B, H, W, C). Returns (conv6 feat (B,H/64,W/64,1024),
        concat4 (B,H/16,W/16,770) | None, flow (B,H/16,W/16,2) | list | None).
        """
        c = lambda f, k, s: _Conv(f, k, s, self.use_bn, self.dtype)
        w = self.widths
        out1 = c(w[0], 7, 2)(x, train)
        out2 = c(w[1], 5, 2)(out1, train)
        out3 = c(w[2], 5, 2)(out2, train)
        out3 = c(w[2], 3, 1)(out3, train)
        out4 = c(w[3], 3, 2)(out3, train)
        out4 = c(w[3], 3, 1)(out4, train)
        out5 = c(w[4], 3, 2)(out4, train)
        out5 = c(w[4], 3, 1)(out5, train)
        out6 = c(w[5], 3, 2)(out5, train)
        out6 = c(w[5], 3, 1)(out6, train)

        if self.out_flow_level == "none" and not self.out_concat4:
            return out6, None, None

        flow6 = _PredictFlow(self.dtype)(out6)
        up6 = _UpFlow(self.dtype)(flow6)
        d5 = _Deconv(w[3], self.dtype)(out6)
        concat5 = jnp.concatenate([out5, d5, up6], axis=-1)       # 512+512+2

        flow5 = _PredictFlow(self.dtype)(concat5)
        up5 = _UpFlow(self.dtype)(flow5)
        d4 = _Deconv(w[2], self.dtype)(concat5)
        concat4 = jnp.concatenate([out4, d4, up5], axis=-1)       # 512+256+2

        flow = None
        if self.out_flow_level == "flow4":
            flow = _PredictFlow(self.dtype)(concat4)
        elif self.out_flow_level == "all":
            flow4 = _PredictFlow(self.dtype)(concat4)
            up4 = _UpFlow(self.dtype)(flow4)
            d3 = _Deconv(w[1], self.dtype)(concat4)
            concat3 = jnp.concatenate([out3, d3, up4], axis=-1)   # 256+128+2
            flow3 = _PredictFlow(self.dtype)(concat3)
            up3 = _UpFlow(self.dtype)(flow3)
            d2 = _Deconv(w[0], self.dtype)(concat3)
            concat2 = jnp.concatenate([out2, d2, up3], axis=-1)   # 128+64+2
            flow2 = _PredictFlow(self.dtype)(concat2)
            flow = [flow2, flow3, flow4, flow5, flow6]

        return out6, (concat4 if self.out_concat4 else None), flow
