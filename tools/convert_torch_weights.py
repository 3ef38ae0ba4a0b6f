"""Convert reference PyTorch checkpoints to flat .npz for Flax loading.

Parity context (SURVEY.md §7 hard part 3 — weight parity): the reference
model zoo ships .pth checkpoints (timm resnest50d backbone, GDRN heads,
FlowNetS). This tool dumps any torch checkpoint to a flat
'name -> numpy array' .npz with layout conversion:
  conv OIHW -> HWIO, linear (out,in) -> (in,out), BN buffers kept.
Model-specific name mapping into the Flax trees lives in MAPPING_* tables
below (extend per architecture as checkpoints are ported).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def torch_state_to_numpy(state_dict) -> dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        a = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        if a.ndim == 4:                      # conv OIHW -> HWIO
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 2 and (k.endswith("weight") or ".fc" in k):
            a = a.T                          # linear (out,in) -> (in,out)
        out[k] = a
    return out


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "model_state"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    assert isinstance(ckpt, dict), type(ckpt)
    return torch_state_to_numpy(ckpt)


# LPIPS (external/PerceptualSimilarity alexnet) name mapping into
# models/lpips.py load_lpips_params contract
LPIPS_ALEX_MAP = {
    "net.slice1.0": "conv1", "net.slice2.3": "conv2", "net.slice3.6": "conv3",
    "net.slice4.8": "conv4", "net.slice5.10": "conv5",
    "lin0.model.1": "lin0", "lin1.model.1": "lin1", "lin2.model.1": "lin2",
    "lin3.model.1": "lin3", "lin4.model.1": "lin4",
}


def convert_lpips(src: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out = {}
    for tk, ok in LPIPS_ALEX_MAP.items():
        if f"{tk}.weight" in src:
            w = src[f"{tk}.weight"]
            if ok.startswith("lin"):
                out[f"{ok}.weight"] = w.reshape(-1)
            else:
                out[f"{ok}.weight"] = w
        if f"{tk}.bias" in src:
            out[f"{ok}.bias"] = src[f"{tk}.bias"]
    return out


# ---------------------------------------------------------------------------
# ResNet / ResNet-D / ResNeSt backbone (timm state-dict names -> the Flax
# auto-names of self6dpp_tpu.models.backbones.resnet.ResNetBackbone).
#
# The reference wraps timm models (core/gdrn_modeling/models/net_factory.py),
# so checkpoints carry timm names: conv1/bn1 (or conv1.{0,1,3,4,6}+bn1 for
# the deep '-d' stem), layer{s}.{b}.conv{1..3}/bn{1..3},
# downsample.{0|1}/{1|2} (conv/bn; avg-down variants put an AvgPool at
# index 0), and for ResNeSt conv2 = SplitAttn{conv, bn0, fc1, bn1, fc2}.
# ---------------------------------------------------------------------------

_ARCH_SPECS = {
    # name: (block kind, depths) — mirrors resnet.py _STAGE_SPECS
    "micro": ("basic", (1, 1, 1, 1)),     # golden-fixture / test arch
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet50d": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnest26d": ("splat", (2, 2, 2, 2)),
    "resnest50d": ("splat", (3, 4, 6, 3)),
}


def resnet_key_map(arch: str) -> dict[str, tuple[str, str]]:
    """{timm module path: (kind, flax module path)}; kind in conv|bn|dense.

    Flax paths follow linen auto-naming of ResNetBackbone.__call__: stem
    Conv_i/BatchNorm_i, then BasicBlock_i / Bottleneck_i across all stages,
    with inner Conv_j/BatchNorm_j in call order (see resnet.py).
    """
    kind, depths = _ARCH_SPECS[arch]
    deep = arch.endswith("d")
    m: dict[str, tuple[str, str]] = {}
    if deep:
        m["conv1.0"] = ("conv", "Conv_0")
        m["conv1.1"] = ("bn", "BatchNorm_0")
        m["conv1.3"] = ("conv", "Conv_1")
        m["conv1.4"] = ("bn", "BatchNorm_1")
        m["conv1.6"] = ("conv", "Conv_2")
        m["bn1"] = ("bn", "BatchNorm_2")
    else:
        m["conv1"] = ("conv", "Conv_0")
        m["bn1"] = ("bn", "BatchNorm_0")

    flax_block = {"basic": "BasicBlock", "bottleneck": "Bottleneck",
                  "splat": "Bottleneck"}[kind]
    widths = (8, 16, 32, 64) if arch == "micro" else (64, 128, 256, 512)
    i = 0
    cin = 64                               # stem output channels
    for stage, (w, d) in enumerate(zip(widths, depths), start=1):
        cout = w if kind == "basic" else w * 4
        for b in range(d):
            t = f"layer{stage}.{b}"
            f = f"{flax_block}_{i}"
            i += 1
            stride = 2 if (b == 0 and stage > 1) else 1
            # downsample exists when channels change or stride != 1 (for
            # micro, stage-1 block 0 changes 64 -> 8 at stride 1)
            has_down = b == 0 and (stride != 1 or cin != cout)
            cin = cout
            if kind == "basic":
                m[f"{t}.conv1"] = ("conv", f"{f}.Conv_0")
                m[f"{t}.bn1"] = ("bn", f"{f}.BatchNorm_0")
                m[f"{t}.conv2"] = ("conv", f"{f}.Conv_1")
                m[f"{t}.bn2"] = ("bn", f"{f}.BatchNorm_1")
                dn_conv, dn_bn = f"{f}.Conv_2", f"{f}.BatchNorm_2"
            elif kind == "bottleneck":
                m[f"{t}.conv1"] = ("conv", f"{f}.Conv_0")
                m[f"{t}.bn1"] = ("bn", f"{f}.BatchNorm_0")
                m[f"{t}.conv2"] = ("conv", f"{f}.Conv_1")
                m[f"{t}.bn2"] = ("bn", f"{f}.BatchNorm_1")
                m[f"{t}.conv3"] = ("conv", f"{f}.Conv_2")
                m[f"{t}.bn3"] = ("bn", f"{f}.BatchNorm_2")
                dn_conv, dn_bn = f"{f}.Conv_3", f"{f}.BatchNorm_3"
            else:  # splat (ResNeSt)
                sa = f"{f}.SplitAttention_0"
                m[f"{t}.conv1"] = ("conv", f"{f}.Conv_0")
                m[f"{t}.bn1"] = ("bn", f"{f}.BatchNorm_0")
                m[f"{t}.conv2.conv"] = ("conv", f"{sa}.Conv_0")
                m[f"{t}.conv2.bn0"] = ("bn", f"{sa}.BatchNorm_0")
                m[f"{t}.conv2.fc1"] = ("dense", f"{sa}.Dense_0")
                m[f"{t}.conv2.bn1"] = ("bn", f"{sa}.BatchNorm_1")
                m[f"{t}.conv2.fc2"] = ("dense", f"{sa}.Dense_1")
                m[f"{t}.conv3"] = ("conv", f"{f}.Conv_1")
                m[f"{t}.bn3"] = ("bn", f"{f}.BatchNorm_1")
                dn_conv, dn_bn = f"{f}.Conv_2", f"{f}.BatchNorm_2"
            if has_down:
                if deep:   # avg-down: Sequential(pool, conv, bn)
                    m[f"{t}.downsample.1"] = ("conv", dn_conv)
                    m[f"{t}.downsample.2"] = ("bn", dn_bn)
                else:      # Sequential(conv, bn)
                    m[f"{t}.downsample.0"] = ("conv", dn_conv)
                    m[f"{t}.downsample.1"] = ("bn", dn_bn)
    return m


def convert_resnet(src: dict[str, np.ndarray], arch: str,
                   prefix: str = "") -> dict[str, np.ndarray]:
    """Map a numpy-converted timm state dict to flat Flax variable names.

    Output keys are 'params.<path>.kernel' / 'batch_stats.<path>.mean' etc.
    (dot-joined, loadable via engine.checkpoint.load_params_npz). `prefix`
    inserts a submodule scope, e.g. prefix='backbone' for the GDRN tree.
    Conv kernels are expected already HWIO (torch_state_to_numpy). timm
    SplitAttn fc1/fc2 are 1x1 convs -> squeezed into Dense (in, out) kernels.
    """
    pre = f"{prefix}." if prefix else ""
    out: dict[str, np.ndarray] = {}
    used = set()
    for tpath, (kind, fpath) in resnet_key_map(arch).items():
        if kind == "bn":
            pairs = [(f"{tpath}.weight", f"params.{pre}{fpath}.scale"),
                     (f"{tpath}.bias", f"params.{pre}{fpath}.bias"),
                     (f"{tpath}.running_mean", f"batch_stats.{pre}{fpath}.mean"),
                     (f"{tpath}.running_var", f"batch_stats.{pre}{fpath}.var")]
        else:
            pairs = [(f"{tpath}.weight", f"params.{pre}{fpath}.kernel"),
                     (f"{tpath}.bias", f"params.{pre}{fpath}.bias")]
        for tk, fk in pairs:
            if tk not in src:
                if tk.endswith(".bias") and kind == "conv":
                    continue                    # backbone convs are bias-free
                raise KeyError(f"{arch}: missing source key {tk}")
            a = src[tk]
            if kind == "dense" and tk.endswith(".weight"):
                a = a.reshape(a.shape[-2], a.shape[-1])   # (1,1,in,out)->(in,out)
            out[fk] = a
            used.add(tk)
    skipped = [k for k in src
               if k not in used and not k.endswith("num_batches_tracked")]
    if skipped:
        print(f"note: {len(skipped)} source arrays not mapped "
              f"(classifier head etc.): {skipped[:6]} ...")
    return out


# ---------------------------------------------------------------------------
# FlowNetS (reference core/deepim/models/backbones/flownets.py; also matches
# the public flownets_EPE1.951 pretrained checkpoint naming).
# ---------------------------------------------------------------------------

_FLOWNET_CONVS = ("conv1", "conv2", "conv3", "conv3_1", "conv4", "conv4_1",
                  "conv5", "conv5_1", "conv6", "conv6_1")


def flownet_key_map(out_flow_level: str = "flow4", use_bn: bool = False) \
        -> dict[str, tuple[str, str]]:
    """{reference FlowNetS path: (kind, flax path)} for models.backbones.flownet."""
    m: dict[str, tuple[str, str]] = {}
    for i, name in enumerate(_FLOWNET_CONVS):
        m[f"{name}.0"] = ("conv", f"_Conv_{i}.Conv_0")
        if use_bn:
            m[f"{name}.1"] = ("bn", f"_Conv_{i}.BatchNorm_0")
    if out_flow_level == "none":
        return m
    # decoder: predict_flow / upsampled_flow / deconv chain in call order
    m["predict_flow6"] = ("conv", "_PredictFlow_0.Conv_0")
    m["upsampled_flow6_to_5"] = ("deconv", "_UpFlow_0.ConvTranspose_0")
    m["deconv5.0"] = ("deconv", "_Deconv_0.ConvTranspose_0")
    m["predict_flow5"] = ("conv", "_PredictFlow_1.Conv_0")
    m["upsampled_flow5_to_4"] = ("deconv", "_UpFlow_1.ConvTranspose_0")
    m["deconv4.0"] = ("deconv", "_Deconv_1.ConvTranspose_0")
    m["predict_flow4"] = ("conv", "_PredictFlow_2.Conv_0")
    if out_flow_level == "all":
        m["upsampled_flow4_to_3"] = ("deconv", "_UpFlow_2.ConvTranspose_0")
        m["deconv3.0"] = ("deconv", "_Deconv_2.ConvTranspose_0")
        m["predict_flow3"] = ("conv", "_PredictFlow_3.Conv_0")
        m["upsampled_flow3_to_2"] = ("deconv", "_UpFlow_3.ConvTranspose_0")
        m["deconv2.0"] = ("deconv", "_Deconv_3.ConvTranspose_0")
        m["predict_flow2"] = ("conv", "_PredictFlow_4.Conv_0")
    return m


def convert_flownet(src: dict[str, np.ndarray],
                    out_flow_level: str = "flow4", use_bn: bool = False,
                    prefix: str = "") -> dict[str, np.ndarray]:
    """FlowNetS torch checkpoint -> flat Flax names (see flownet_key_map)."""
    out: dict[str, np.ndarray] = {}
    pre = f"{prefix}." if prefix else ""
    _map_block(src, flownet_key_map(out_flow_level, use_bn), pre, out, set())
    return out


def convert_deepim(src: dict[str, np.ndarray],
                   out_flow_level: str = "flow4", use_bn: bool = False,
                   pose_num_layers: int = 2, mask_feat_layers: int = 0,
                   flat_op: str = "avg") -> dict[str, np.ndarray]:
    """Full reference DeepIM_FlowNet checkpoint -> flat Flax names.

    Submodules (DeepIM_FlowNet.py:42-45): backbone (FlowNetS), pose_head
    (FC_RotTransHead: linears.{3i} Linear + Identity norm + act, then
    fc_r/fc_t), mask_head (ConvOutHead: features.{i} ConvModule + out_layer).
    With flat_op='flatten' the first pose Linear is permuted from the torch
    C-major flatten order to NHWC.
    """
    out: dict[str, np.ndarray] = {}
    bb = {k[len("backbone."):]: v for k, v in src.items()
          if k.startswith("backbone.")}
    _map_block(bb, flownet_key_map(out_flow_level, use_bn), "backbone.",
               out, set())

    pm: dict[str, tuple[str, str]] = {}
    for i in range(pose_num_layers):
        kind = "fc_flat" if (i == 0 and flat_op == "flatten") else "fc"
        pm[f"linears.{3 * i}"] = (kind, f"Dense_{i}")
    pm["fc_r"] = ("fc", "fc_r")
    pm["fc_t"] = ("fc", "fc_t")
    ph = {k[len("pose_head."):]: v for k, v in src.items()
          if k.startswith("pose_head.")}
    _map_block(ph, pm, "pose_head.", out, set(),
               flat_channels=1024 if flat_op == "flatten" else None)

    mh = {k[len("mask_head."):]: v for k, v in src.items()
          if k.startswith("mask_head.")}
    if mh:
        mm: dict[str, tuple[str, str]] = {}
        for i in range(mask_feat_layers):
            mm[f"features.{i}.conv"] = ("conv", f"ConvNormAct_{i}.Conv_0")
            mm[f"features.{i}.gn"] = ("gn", f"ConvNormAct_{i}.Norm_0.GroupNorm_0")
        mm["out_layer"] = ("conv", f"Conv_{0}")
        _map_block(mh, mm, "mask_head.", out, set())
    return out


# ---------------------------------------------------------------------------
# GDRN heads (reference core/gdrn_modeling/models/GDRN.py submodules
# `geo_head_net` / `pnp_net`; torch names follow the ModuleList layout of
# top_down_mask_xyz_region_head.py:52-100 and conv_pnp_net.py:56-98).
# ---------------------------------------------------------------------------


def geo_head_key_map(up_types=("deconv", "bilinear", "bilinear"),
                     num_conv_per_block=2) -> dict[str, tuple[str, str]]:
    """{reference 'features.<i>' path: (kind, flax path)} for TopDownGeoHead."""
    m: dict[str, tuple[str, str]] = {}
    idx = nd = nnorm = ncna = 0
    for up in up_types:
        if up == "deconv":
            m[f"features.{idx}"] = ("deconv", f"ConvTranspose2x_{nd}.ConvTranspose_0")
            m[f"features.{idx + 1}"] = ("gn", f"Norm_{nnorm}.GroupNorm_0")
            nd += 1
            nnorm += 1
            idx += 3                              # deconv, norm, act
        else:
            idx += 1                              # parameter-free upsample
        for _ in range(num_conv_per_block):
            m[f"features.{idx}.conv"] = ("conv", f"ConvNormAct_{ncna}.Conv_0")
            m[f"features.{idx}.gn"] = ("gn", f"ConvNormAct_{ncna}.Norm_0.GroupNorm_0")
            ncna += 1
            idx += 1
    m["out_layer"] = ("conv", "Conv_0")           # shared mask|xyz|region conv
    return m


def pnp_key_map(num_stride2_layers=3, num_extra_layers=0) \
        -> dict[str, tuple[str, str]]:
    """{reference pnp_net path: (kind, flax path)} for ConvPnPNet."""
    m: dict[str, tuple[str, str]] = {}
    for i in range(num_stride2_layers + num_extra_layers):
        m[f"features.{3 * i}"] = ("conv", f"Conv_{i}")
        m[f"features.{3 * i + 1}"] = ("gn", f"Norm_{i}.GroupNorm_0")
    m["fc1"] = ("fc_flat", "Dense_0")             # flatten-order permutation
    m["fc2"] = ("fc", "Dense_1")
    m["fc_r"] = ("fc", "fc_r")
    m["fc_t"] = ("fc", "fc_t")
    return m


def _map_block(src, key_map, pre, out, used, flat_channels=None):
    """Apply a {torch: (kind, flax)} map over numpy-converted arrays.

    flat_channels: conv channel count feeding a 'fc_flat' Linear — used to
    permute its input dim from torch C-major flatten order to NHWC.
    """
    for tpath, (kind, fpath) in key_map.items():
        if kind in ("gn", "bn"):
            pairs = [(f"{tpath}.weight", f"params.{pre}{fpath}.scale"),
                     (f"{tpath}.bias", f"params.{pre}{fpath}.bias")]
            if kind == "bn":
                pairs += [(f"{tpath}.running_mean",
                           f"batch_stats.{pre}{fpath}.mean"),
                          (f"{tpath}.running_var",
                           f"batch_stats.{pre}{fpath}.var")]
        else:
            pairs = [(f"{tpath}.weight", f"params.{pre}{fpath}.kernel"),
                     (f"{tpath}.bias", f"params.{pre}{fpath}.bias")]
        for tk, fk in pairs:
            if tk not in src:
                if tk.endswith(".bias") and kind in ("conv", "deconv"):
                    continue                       # bias-free convs
                raise KeyError(f"missing source key {tk}")
            a = src[tk]
            if kind == "deconv" and tk.endswith(".weight"):
                # torch convT (in,out,kh,kw) -> generic transpose gave
                # (kh,kw,out,in); flax wants (kh,kw,in,out) and
                # lax.conv_transpose does NOT flip spatially (torch does)
                a = a.transpose(0, 1, 3, 2)[::-1, ::-1].copy()
            elif kind == "fc_flat" and tk.endswith(".weight"):
                # torch flattens NCHW (C-major); flax flattens NHWC
                cin, cout = a.shape               # generic transpose: (in,out)
                feat = flat_channels
                assert feat, "fc_flat mapping needs flat_channels"
                hw = cin // feat
                s = int(round(hw ** 0.5))
                assert s * s == hw, (cin, feat)
                a = (a.reshape(feat, s, s, cout).transpose(1, 2, 0, 3)
                     .reshape(cin, cout))
            out[fk] = a
            used.add(tk)


def convert_gdrn(src: dict[str, np.ndarray], arch: str = "resnest50d",
                 up_types=("deconv", "bilinear", "bilinear"),
                 num_conv_per_block=2, num_stride2_layers=3,
                 num_extra_layers=0) -> dict[str, np.ndarray]:
    """Full reference GDRN checkpoint -> flat Flax GDRN variable names.

    Covers backbone (timm), geo_head_net -> geo_head, pnp_net -> pnp_net.
    Unknown arrays (MTL log-vars etc.) are reported and skipped; load the
    result with load_params_npz(..., strict=False) over a fresh init tree.
    """
    bb = {k[len("backbone."):]: v for k, v in src.items()
          if k.startswith("backbone.")}
    out = convert_resnet(bb, arch, prefix="backbone")
    used: set[str] = set()
    gh = {k[len("geo_head_net."):]: v for k, v in src.items()
          if k.startswith("geo_head_net.")}
    pn = {k[len("pnp_net."):]: v for k, v in src.items()
          if k.startswith("pnp_net.")}
    _map_block(gh, geo_head_key_map(up_types, num_conv_per_block),
               "geo_head.", out, used)
    featdim = pn["features.1.weight"].shape[0]    # first GN width
    _map_block(pn, pnp_key_map(num_stride2_layers, num_extra_layers),
               "pnp_net.", out, used, flat_channels=featdim)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="torch .pth checkpoint")
    p.add_argument("--out", required=True, help="output .npz")
    p.add_argument("--kind", default="raw",
                   choices=["raw", "lpips", "resnet", "gdrn", "flownet"])
    p.add_argument("--arch", default="resnest50d", choices=sorted(_ARCH_SPECS),
                   help="backbone architecture (for --kind resnet)")
    p.add_argument("--prefix", default="",
                   help="Flax submodule scope, e.g. 'backbone' for GDRN")
    args = p.parse_args()
    flat = load_torch_checkpoint(args.src)
    if args.kind == "lpips":
        flat = convert_lpips(flat)
    elif args.kind == "resnet":
        flat = convert_resnet(flat, args.arch, prefix=args.prefix)
    elif args.kind == "gdrn":
        flat = convert_gdrn(flat, args.arch)
    elif args.kind == "flownet":
        flat = convert_flownet(flat, prefix=args.prefix)
    np.savez(args.out, **flat)
    print(f"wrote {len(flat)} arrays -> {args.out}")


if __name__ == "__main__":
    main()
