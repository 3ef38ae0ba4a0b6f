"""Numerical parity of torch-checkpoint import (tools/convert_torch_weights).

Builds torch twins of the backbones with timm state-dict naming (the
reference wraps timm models — core/gdrn_modeling/models/net_factory.py),
converts their random weights through the real conversion path
(torch .state_dict() -> numpy -> convert_resnet -> npz -> load_params_npz)
and checks the Flax backbone reproduces the torch activations.
"""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
from torch import nn as tnn
import torch.nn.functional as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from convert_torch_weights import (convert_resnet, resnet_key_map,
                                   torch_state_to_numpy)

from self6dpp_tpu.engine.checkpoint import load_params_npz, save_params_npz
from self6dpp_tpu.models.backbones.resnet import ResNetBackbone


# ---------------------------------------------------------------- torch twins
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


def _avg_down(cin, cout, stride):
    pool = (tnn.AvgPool2d(2, stride, ceil_mode=True, count_include_pad=False)
            if stride != 1 else tnn.Identity())
    return tnn.Sequential(pool, tnn.Conv2d(cin, cout, 1, 1, bias=False),
                          tnn.BatchNorm2d(cout))


class TBottleneck(tnn.Module):
    def __init__(self, cin, w, stride=1, avg_down=False):
        super().__init__()
        cout = w * 4
        self.conv1 = tnn.Conv2d(cin, w, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(w)
        self.conv2 = tnn.Conv2d(w, w, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(w)
        self.conv3 = tnn.Conv2d(w, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = (_avg_down(cin, cout, stride) if avg_down else
                               tnn.Sequential(tnn.Conv2d(cin, cout, 1, stride, bias=False),
                                              tnn.BatchNorm2d(cout)))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        return F.relu(self.bn3(self.conv3(y)) + idn)


class TSplitAttn(tnn.Module):
    """timm SplitAttn (radix 2, cardinality 1)."""

    def __init__(self, c, radix=2):
        super().__init__()
        inter = max(c * radix // 4, 32)
        self.radix = radix
        self.conv = tnn.Conv2d(c, c * radix, 3, 1, 1, groups=radix, bias=False)
        self.bn0 = tnn.BatchNorm2d(c * radix)
        self.fc1 = tnn.Conv2d(c, inter, 1)
        self.bn1 = tnn.BatchNorm2d(inter)
        self.fc2 = tnn.Conv2d(inter, c * radix, 1)

    def forward(self, x):
        x = F.relu(self.bn0(self.conv(x)))
        b, rc, h, w = x.shape
        r, c = self.radix, rc // self.radix
        xs = x.reshape(b, r, c, h, w)
        gap = xs.sum(1).mean((2, 3), keepdim=True)
        a = F.relu(self.bn1(self.fc1(gap)))
        a = self.fc2(a).reshape(b, r, c)
        a = torch.softmax(a, 1).reshape(b, r, c, 1, 1)
        return (xs * a).sum(1)


class TResNestBottleneck(tnn.Module):
    """timm ResNestBottleneck, avd_first=False."""

    def __init__(self, cin, w, stride=1):
        super().__init__()
        cout = w * 4
        self.conv1 = tnn.Conv2d(cin, w, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(w)
        self.conv2 = TSplitAttn(w)
        self.avd_last = tnn.AvgPool2d(3, stride, 1) if stride != 1 else None
        self.conv3 = tnn.Conv2d(w, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = _avg_down(cin, cout, stride)

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.conv2(y)
        if self.avd_last is not None:
            y = self.avd_last(y)
        return F.relu(self.bn3(self.conv3(y)) + idn)


class TResNet(tnn.Module):
    def __init__(self, kind, depths, deep_stem):
        super().__init__()
        if deep_stem:
            self.conv1 = tnn.Sequential(
                tnn.Conv2d(3, 32, 3, 2, 1, bias=False), tnn.BatchNorm2d(32),
                tnn.ReLU(), tnn.Conv2d(32, 32, 3, 1, 1, bias=False),
                tnn.BatchNorm2d(32), tnn.ReLU(),
                tnn.Conv2d(32, 64, 3, 1, 1, bias=False))
            self.bn1 = tnn.BatchNorm2d(64)
        else:
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64
        for stage, (w, d) in enumerate(zip((64, 128, 256, 512), depths), 1):
            blocks = []
            for b in range(d):
                stride = 2 if (b == 0 and stage > 1) else 1
                if kind == "basic":
                    blocks.append(TBasic(cin, w, stride))
                    cin = w
                elif kind == "bottleneck":
                    blocks.append(TBottleneck(cin, w, stride, avg_down=deep_stem))
                    cin = w * 4
                else:
                    blocks.append(TResNestBottleneck(cin, w, stride))
                    cin = w * 4
            setattr(self, f"layer{stage}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
        return x


_TWINS = {
    "resnet18": ("basic", (2, 2, 2, 2), False),
    "resnet50": ("bottleneck", (3, 4, 6, 3), False),
    "resnet50d": ("bottleneck", (3, 4, 6, 3), True),
    "resnest50d": ("splat", (3, 4, 6, 3), True),
}


def _randomize_bn(model, gen):
    for mod in model.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            with torch.no_grad():
                mod.weight.copy_(torch.rand(mod.weight.shape, generator=gen) + 0.5)
                mod.bias.copy_(torch.randn(mod.bias.shape, generator=gen) * 0.1)
                mod.running_mean.copy_(torch.randn(mod.running_mean.shape,
                                                   generator=gen) * 0.1)
                mod.running_var.copy_(torch.rand(mod.running_var.shape,
                                                 generator=gen) + 0.5)


@pytest.mark.parametrize("arch", sorted(_TWINS))
def test_backbone_torch_parity(arch, tmp_path):
    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    tm = TResNet(*_TWINS[arch]).eval()
    _randomize_bn(tm, gen)

    flat = convert_resnet(torch_state_to_numpy(tm.state_dict()), arch)
    npz = tmp_path / f"{arch}.npz"
    np.savez(npz, **flat)

    fm = ResNetBackbone(arch=arch)
    x = np.random.default_rng(2).normal(size=(2, 64, 64, 3)).astype(np.float32)
    variables = jax.jit(fm.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = load_params_npz(str(npz), variables)

    y_flax = np.asarray(jax.jit(fm.apply)(variables, jnp.asarray(x)))
    with torch.no_grad():
        y_torch = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    y_torch = y_torch.numpy().transpose(0, 2, 3, 1)

    assert y_flax.shape == y_torch.shape
    np.testing.assert_allclose(y_flax, y_torch, rtol=1e-3, atol=5e-4)


def test_key_map_covers_full_state_dict():
    """Every torch array maps somewhere; nothing silently dropped."""
    tm = TResNet(*_TWINS["resnest50d"])
    mapped = set()
    for tpath in resnet_key_map("resnest50d"):
        for suf in (".weight", ".bias", ".running_mean", ".running_var"):
            mapped.add(tpath + suf)
    missing = [k for k in tm.state_dict()
               if k not in mapped and not k.endswith("num_batches_tracked")]
    assert not missing, missing[:8]


class TGeoHead(tnn.Module):
    """torch twin of the reference TopDownMaskXyzRegionHead (default cfg:
    up_types=(deconv, bilinear, bilinear), 2 convs/block, GN+GELU, shared
    out conv)."""

    def __init__(self, in_dim=128, feat=64, groups=8, out_dim=13):
        super().__init__()
        feats = []
        feats += [tnn.ConvTranspose2d(in_dim, feat, 3, 2, 1, 1, bias=False),
                  tnn.GroupNorm(groups, feat), tnn.GELU()]
        feats += [_conv_module(feat, feat, groups), _conv_module(feat, feat, groups)]
        for _ in range(2):
            feats += [tnn.UpsamplingBilinear2d(scale_factor=2),
                      _conv_module(feat, feat, groups),
                      _conv_module(feat, feat, groups)]
        self.features = tnn.ModuleList(feats)
        self.out_layer = tnn.Conv2d(feat, out_dim, 1)

    def forward(self, x):
        for l in self.features:
            x = l(x)
        return self.out_layer(x)


class _conv_module(tnn.Module):
    """reference ConvModule(conv3x3 p1 no-bias, gn, gelu)."""

    def __init__(self, cin, cout, groups):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 3, 1, 1, bias=False)
        self.gn = tnn.GroupNorm(groups, cout)

    def forward(self, x):
        return F.gelu(self.gn(self.conv(x)))


class TPnPNet(tnn.Module):
    """torch twin of the reference ConvPnPNet (3 stride-2 convs, GN, GELU,
    flatten, fc1024/fc256/fc_r/fc_t)."""

    def __init__(self, nin, featdim=32, groups=8, spatial=8, rot_dim=6):
        super().__init__()
        feats = []
        cin = nin
        for _ in range(3):
            feats += [tnn.Conv2d(cin, featdim, 3, 2, 1, bias=False),
                      tnn.GroupNorm(groups, featdim), tnn.GELU()]
            cin = featdim
        self.features = tnn.ModuleList(feats)
        self.fc1 = tnn.Linear(featdim * spatial * spatial, 1024)
        self.fc2 = tnn.Linear(1024, 256)
        self.fc_r = tnn.Linear(256, rot_dim)
        self.fc_t = tnn.Linear(256, 3)

    def forward(self, x):
        for l in self.features:
            x = l(x)
        x = F.gelu(self.fc1(x.flatten(1)))
        x = F.gelu(self.fc2(x))
        return self.fc_r(x), self.fc_t(x)


def test_geo_head_torch_parity(tmp_path):
    from convert_torch_weights import _map_block, geo_head_key_map
    from self6dpp_tpu.config.base import GeoHeadConfig
    from self6dpp_tpu.models.heads.top_down_head import TopDownGeoHead

    torch.manual_seed(3)
    tm = TGeoHead().eval()
    for p in tm.parameters():          # non-trivial GN scales etc.
        with torch.no_grad():
            p.add_(torch.randn_like(p) * 0.05)

    out, used = {}, set()
    _map_block(torch_state_to_numpy(tm.state_dict()), geo_head_key_map(),
               "", out, used)
    npz = tmp_path / "geo.npz"
    np.savez(npz, **out)

    fm = TopDownGeoHead(cfg=GeoHeadConfig(feat_dim=64, num_gn_groups=8,
                                          num_regions=8, xyz_bin=1))
    x = np.random.default_rng(4).normal(size=(2, 4, 4, 128)).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = load_params_npz(str(npz), variables)
    maps = fm.apply(variables, jnp.asarray(x))
    y_flax = np.concatenate(
        [np.asarray(maps[k]) for k in ("mask", "xyz", "region")], axis=-1)
    with torch.no_grad():
        y_torch = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(y_flax, y_torch.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)


def test_pnp_net_torch_parity(tmp_path):
    from convert_torch_weights import _map_block, pnp_key_map
    from self6dpp_tpu.config.base import PnPNetConfig
    from self6dpp_tpu.models.heads.conv_pnp_net import ConvPnPNet

    torch.manual_seed(5)
    nin = 14                                       # 3 xyz + 2 coords + 9 region
    tm = TPnPNet(nin).eval()
    out, used = {}, set()
    _map_block(torch_state_to_numpy(tm.state_dict()), pnp_key_map(),
               "", out, used, flat_channels=32)
    npz = tmp_path / "pnp.npz"
    np.savez(npz, **out)

    fm = ConvPnPNet(cfg=PnPNetConfig(featdim=32, num_gn_groups=8, act="gelu",
                                     denormalize_by_extent=False), rot_dim=6)
    x = np.random.default_rng(6).normal(size=(2, 64, 64, 5)).astype(np.float32)
    reg = np.random.default_rng(7).normal(size=(2, 64, 64, 9)).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(reg))
    variables = load_params_npz(str(npz), variables)
    r_flax, t_flax = fm.apply(variables, jnp.asarray(x), jnp.asarray(reg))
    xt = torch.from_numpy(
        np.concatenate([x, reg], axis=-1).transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        r_torch, t_torch = tm(xt)
    np.testing.assert_allclose(np.asarray(r_flax), r_torch.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_flax), t_torch.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_full_gdrn_convert_structural(tmp_path):
    """backbone.+geo_head_net.+pnp_net. state dict -> full GDRN tree load."""
    from convert_torch_weights import convert_gdrn
    from self6dpp_tpu.config.base import (BackboneConfig, Config,
                                          GeoHeadConfig, PnPNetConfig,
                                          PoseNetConfig)
    from self6dpp_tpu.data.synthetic import make_gdrn_batch
    from self6dpp_tpu.models.gdrn import GDRN

    torch.manual_seed(8)
    gen = torch.Generator().manual_seed(9)
    sd = {}
    for pre, mod in (("backbone", TResNet(*_TWINS["resnet18"])),
                     ("geo_head_net", TGeoHead(in_dim=512, feat=64, groups=8,
                                               out_dim=13)),
                     # 3 xyz + 2 coords + 8 regions (bg channel dropped)
                     ("pnp_net", TPnPNet(13, featdim=32, spatial=8))):
        _randomize_bn(mod, gen)
        for p in mod.parameters():     # shift 1/0-init norm params off default
            with torch.no_grad():
                p.add_(torch.randn(p.shape, generator=gen) * 0.05)
        for k, v in mod.state_dict().items():
            sd[f"{pre}.{k}"] = v
    flat = convert_gdrn(torch_state_to_numpy(sd), "resnet18")
    npz = tmp_path / "gdrn.npz"
    np.savez(npz, **flat)

    cfg = Config(model=PoseNetConfig(
        num_classes=2, input_res=256, output_res=64,
        backbone=BackboneConfig(name="resnet18"),
        geo_head=GeoHeadConfig(feat_dim=64, num_gn_groups=8, num_regions=8,
                               xyz_bin=1),
        pnp_net=PnPNetConfig(featdim=32, num_gn_groups=8)))
    model = GDRN(cfg=cfg.model)
    batch = {k: jnp.asarray(v) for k, v in make_gdrn_batch(
        cfg, 2, input_res=256, output_res=64, n_points=64).items()}
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["roi_img"], batch["roi_cls"],
        batch["roi_cam"], batch["roi_center"], batch["roi_wh"],
        batch["roi_extent"], batch["resize_ratio"], batch["roi_coord_2d"],
        train=False)
    loaded = load_params_npz(str(npz), dict(variables), strict=False)
    # every converted array landed somewhere (no strict-false silent drops)
    for scope in ("backbone", "geo_head", "pnp_net"):
        a = jax.tree.leaves(variables["params"][scope])
        b = jax.tree.leaves(loaded["params"][scope])
        changed = sum(not np.allclose(np.asarray(x), np.asarray(y))
                      for x, y in zip(a, b))
        assert changed >= len(a) - 1, (scope, changed, len(a))
    out = model.apply(
        loaded, batch["roi_img"], batch["roi_cls"], batch["roi_cam"],
        batch["roi_center"], batch["roi_wh"], batch["roi_extent"],
        batch["resize_ratio"], batch["roi_coord_2d"], train=False)
    assert np.isfinite(np.asarray(out["rot"])).all()


class TFlowNetS(tnn.Module):
    """torch twin of reference FlowNetS (no-BN, flow4, concat4)."""

    def __init__(self):
        super().__init__()
        conv = lambda cin, cout, k, s: tnn.Sequential(
            tnn.Conv2d(cin, cout, k, s, (k - 1) // 2), tnn.LeakyReLU(0.1))
        self.conv1 = conv(6, 64, 7, 2)
        self.conv2 = conv(64, 128, 5, 2)
        self.conv3 = conv(128, 256, 5, 2)
        self.conv3_1 = conv(256, 256, 3, 1)
        self.conv4 = conv(256, 512, 3, 2)
        self.conv4_1 = conv(512, 512, 3, 1)
        self.conv5 = conv(512, 512, 3, 2)
        self.conv5_1 = conv(512, 512, 3, 1)
        self.conv6 = conv(512, 1024, 3, 2)
        self.conv6_1 = conv(1024, 1024, 3, 1)
        deconv = lambda cin, cout: tnn.Sequential(
            tnn.ConvTranspose2d(cin, cout, 4, 2, 1, bias=True),
            tnn.LeakyReLU(0.1))
        self.predict_flow6 = tnn.Conv2d(1024, 2, 3, 1, 1)
        self.upsampled_flow6_to_5 = tnn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False)
        self.deconv5 = deconv(1024, 512)
        self.predict_flow5 = tnn.Conv2d(1026, 2, 3, 1, 1)
        self.upsampled_flow5_to_4 = tnn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False)
        self.deconv4 = deconv(1026, 256)
        self.predict_flow4 = tnn.Conv2d(770, 2, 3, 1, 1)

    def forward(self, x):
        o1 = self.conv1(x)
        o2 = self.conv2(o1)
        o3 = self.conv3_1(self.conv3(o2))
        o4 = self.conv4_1(self.conv4(o3))
        o5 = self.conv5_1(self.conv5(o4))
        o6 = self.conv6_1(self.conv6(o5))
        f6 = self.predict_flow6(o6)
        cat5 = torch.cat([o5, self.deconv5(o6), self.upsampled_flow6_to_5(f6)], 1)
        f5 = self.predict_flow5(cat5)
        cat4 = torch.cat([o4, self.deconv4(cat5), self.upsampled_flow5_to_4(f5)], 1)
        return o6, cat4, self.predict_flow4(cat4)


def test_flownet_torch_parity(tmp_path):
    from convert_torch_weights import convert_flownet
    from self6dpp_tpu.models.backbones.flownet import FlowNetS

    torch.manual_seed(11)
    tm = TFlowNetS().eval()
    flat = convert_flownet(torch_state_to_numpy(tm.state_dict()))
    npz = tmp_path / "fn.npz"
    np.savez(npz, **flat)

    fm = FlowNetS()
    x = np.random.default_rng(12).normal(size=(1, 128, 128, 6)).astype(np.float32)
    variables = jax.jit(fm.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = load_params_npz(str(npz), variables)
    o6, cat4, flow = jax.jit(fm.apply)(variables, jnp.asarray(x))
    with torch.no_grad():
        to6, tcat4, tflow = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    # concat channel order differs (NHWC concat == NCHW concat on C) — same
    np.testing.assert_allclose(np.asarray(o6), to6.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cat4),
                               tcat4.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(flow),
                               tflow.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)


def test_deepim_convert(tmp_path):
    """backbone+pose_head+mask_head reference state dict -> DeepIM tree."""
    from convert_torch_weights import convert_deepim
    from self6dpp_tpu.config.base import DeepIMConfig
    from self6dpp_tpu.models.deepim import DeepIM

    class TPoseHead(tnn.Module):
        def __init__(self, in_dim=1024, feat=256, rot_dim=6):
            super().__init__()
            self.linears = tnn.ModuleList(
                [tnn.Linear(in_dim, feat), tnn.Identity(), tnn.LeakyReLU(0.1),
                 tnn.Linear(feat, feat), tnn.Identity(), tnn.LeakyReLU(0.1)])
            self.fc_r = tnn.Linear(feat, rot_dim)
            self.fc_t = tnn.Linear(feat, 3)

    class TMaskHead(tnn.Module):
        def __init__(self, in_dim=770):
            super().__init__()
            self.out_layer = tnn.Conv2d(in_dim, 1, 1)

    torch.manual_seed(13)
    sd = {}
    for pre, mod in (("backbone", TFlowNetS()),
                     ("pose_head", TPoseHead()),
                     ("mask_head", TMaskHead())):
        for k, v in mod.state_dict().items():
            sd[f"{pre}.{k}"] = v
    flat = convert_deepim(torch_state_to_numpy(sd))
    npz = tmp_path / "deepim.npz"
    np.savez(npz, **flat)

    cfg = DeepIMConfig(num_classes=1, input_h=128, input_w=128,
                       pose_feat_dim=256, mask_class_aware=False)
    model = DeepIM(cfg=cfg)
    b = 2
    x = jnp.zeros((b, 128, 128, 6))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
        jnp.tile(jnp.asarray([0.0, 0.0, 0.5]), (b, 1)),
        jnp.broadcast_to(jnp.asarray([[100.0, 0, 64], [0, 100.0, 64],
                                      [0, 0, 1.0]]), (b, 3, 3)), train=False)
    loaded = load_params_npz(str(npz), dict(variables))
    out = model.apply(
        loaded, x, jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
        jnp.tile(jnp.asarray([0.0, 0.0, 0.5]), (b, 1)),
        jnp.broadcast_to(jnp.asarray([[100.0, 0, 64], [0, 100.0, 64],
                                      [0, 0, 1.0]]), (b, 3, 3)), train=False)
    assert np.isfinite(np.asarray(out["rot"])).all()
    assert "mask_logits" in out


def test_partial_load_into_gdrn_tree(tmp_path):
    """Backbone-only npz under prefix='backbone' inits a full GDRN tree."""
    from self6dpp_tpu.config.base import (BackboneConfig, Config,
                                          GeoHeadConfig, PnPNetConfig,
                                          PoseNetConfig)
    from self6dpp_tpu.data.synthetic import make_gdrn_batch
    from self6dpp_tpu.models.gdrn import GDRN

    tm = TResNet(*_TWINS["resnet18"]).eval()
    flat = convert_resnet(torch_state_to_numpy(tm.state_dict()), "resnet18",
                          prefix="backbone")
    npz = tmp_path / "bb.npz"
    np.savez(npz, **flat)

    cfg = Config(model=PoseNetConfig(
        num_classes=2, input_res=64, output_res=16,
        backbone=BackboneConfig(name="resnet18"),
        geo_head=GeoHeadConfig(feat_dim=32, num_gn_groups=8, num_regions=8,
                               xyz_bin=1),
        pnp_net=PnPNetConfig(featdim=32, num_gn_groups=8)))
    model = GDRN(cfg=cfg.model)
    batch = {k: jnp.asarray(v) for k, v in make_gdrn_batch(
        cfg, 2, input_res=64, output_res=16, n_points=64).items()}
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["roi_img"], batch["roi_cls"],
        batch["roi_cam"], batch["roi_center"], batch["roi_wh"],
        batch["roi_extent"], batch["resize_ratio"], batch["roi_coord_2d"],
        train=False)
    before = variables["params"]["backbone"]["Conv_0"]["kernel"]
    loaded = load_params_npz(str(npz), dict(variables), strict=False)
    after = loaded["params"]["backbone"]["Conv_0"]["kernel"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # heads untouched
    chex = jax.tree.leaves(variables["params"]["geo_head"])
    chex2 = jax.tree.leaves(loaded["params"]["geo_head"])
    for a, b in zip(chex, chex2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
