"""Top-down geometry head: stride-32 feature -> stride-4 dense maps.

Parity target: core/gdrn_modeling/models/heads/top_down_mask_xyz_region_head.py
(3 up-blocks deconv/bilinear, GN+GELU, shared 1x1 out conv emitting
mask | xyz | region channels) and its double-mask / VF / normal variants
(core/self6dpp/models/heads/*). One Flax module covers the whole family via
config flags; outputs are NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...config.base import GeoHeadConfig
from ..layers import ConvNormAct, ConvTranspose2x, get_act, make_norm, upsample2x

Array = jax.Array


class TopDownGeoHead(nn.Module):
    """Emits a dict of dense geometry maps at output_res.

    Channels (class-aware heads multiply by num_classes and are gathered by
    the caller):
      mask:   num_masks (visib [+ full])
      xyz:    3 (regression) or 3*(xyz_bin+1) (binned classification)
      region: num_regions + 1
      vf:     4*num_vf_points (vis uv*f ++ full uv*f)  when with_vf
              (reference vf_out_dim = 2*2*16,
              top_down_doublemask_doublevf_xyz_region_head.py:31; the raw
              output is tanh-squashed to unit-range directions there via
              _post_process_vf — here downstream losses normalize instead)
      norm:   3                      when with_norm
    """

    cfg: GeoHeadConfig
    num_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> dict[str, Array]:
        c = self.cfg
        for i, up_type in enumerate(c.up_types):
            if up_type == "deconv":
                x = ConvTranspose2x(c.feat_dim, c.deconv_kernel_size, dtype=self.dtype)(x)
                x = make_norm(c.norm, c.num_gn_groups, dtype=self.dtype)(x, train=train)
                x = get_act(c.act)(x)
            else:
                x = upsample2x(x, method=up_type)
            for _ in range(c.num_conv_per_block if up_type != "deconv" else c.num_conv_per_block):
                x = ConvNormAct(
                    c.feat_dim, c.feat_kernel_size, norm=c.norm,
                    num_gn_groups=c.num_gn_groups, act=c.act, dtype=self.dtype,
                )(x, train=train)

        return emit_geo_maps(x, c, self.num_classes, self.dtype)


def geo_map_channels(c: GeoHeadConfig, num_classes: int) -> dict[str, int]:
    """Output channel plan shared by every geo-head architecture."""
    xyz_dim = 3 if c.xyz_bin <= 1 else 3 * (c.xyz_bin + 1)
    region_dim = c.num_regions + 1
    mask_mult = num_classes if c.mask_class_aware else 1
    xyz_mult = num_classes if c.xyz_class_aware else 1
    region_mult = num_classes if c.region_class_aware else 1
    chans = {
        "mask": c.num_masks * mask_mult,
        "xyz": xyz_dim * xyz_mult,
        "region": region_dim * region_mult,
    }
    if c.with_vf:
        chans["vf"] = 4 * c.num_vf_points * xyz_mult
    if c.with_norm:
        chans["norm"] = 3 * xyz_mult
    return chans


def emit_geo_maps(x: Array, c: GeoHeadConfig, num_classes: int,
                  dtype=jnp.float32) -> dict[str, Array]:
    """Shared/split output conv(s) emitting the mask|xyz|region[|vf|norm]
    map dict — the common tail of all reference geo heads
    (e.g. top_down_mask_xyz_region_head.py get_output / fpn_..._head.py
    get_output / conv_..._head.py get_output)."""
    chans = geo_map_channels(c, num_classes)
    if c.out_layer_shared:
        total = sum(chans.values())
        out = nn.Conv(total, (c.out_kernel_size, c.out_kernel_size),
                      padding="SAME", dtype=dtype,
                      kernel_init=nn.initializers.normal(0.01))(x)
        maps, ofs = {}, 0
        for k, n in chans.items():
            maps[k] = out[..., ofs : ofs + n]
            ofs += n
    else:
        maps = {
            k: nn.Conv(n, (c.out_kernel_size, c.out_kernel_size),
                       padding="SAME", dtype=dtype, name=f"out_{k}",
                       kernel_init=nn.initializers.normal(0.01))(x)
            for k, n in chans.items()
        }
    return maps


class ConvGeoHead(nn.Module):
    """Plain conv geometry head — no upsampling; the feature must already be
    at the head's working resolution (conv_mask_xyz_region_head.py:9-143:
    num_feat_layers ConvModules then the shared/split out conv). Pairs with
    high-res backbones (PVNet resnet-8s) or an FPN level."""

    cfg: GeoHeadConfig
    num_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> dict[str, Array]:
        c = self.cfg
        for _ in range(c.num_feat_layers):
            x = ConvNormAct(c.feat_dim, c.feat_kernel_size, norm=c.norm,
                            num_gn_groups=c.num_gn_groups, act=c.act,
                            dtype=self.dtype)(x, train=train)
        return emit_geo_maps(x, c, self.num_classes, self.dtype)


class FPNGeoHead(nn.Module):
    """Semantic-FPN geometry head (fpn_mask_xyz_region_head.py:139-306,
    Panoptic FPN): per-level scale heads (3x3 ConvNormAct + bilinear x2,
    repeated log2(stride_i / stride_0) times) summed at the finest stride,
    then the shared/split out conv. Consumes the FPN pyramid finest-first."""

    cfg: GeoHeadConfig
    num_classes: int = 1
    feature_strides: tuple[int, ...] = (4, 8, 16, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: list[Array],
                 train: bool = False) -> dict[str, Array]:
        c = self.cfg
        assert len(feats) == len(self.feature_strides), \
            (len(feats), self.feature_strides)
        import numpy as np
        base = self.feature_strides[0]
        out = None
        for i, (f, stride) in enumerate(zip(feats, self.feature_strides)):
            head_len = max(1, int(np.log2(stride) - np.log2(base)))
            x = f
            for k in range(head_len):
                x = ConvNormAct(c.feat_dim, 3, norm=c.norm,
                                num_gn_groups=c.num_gn_groups, act=c.act,
                                dtype=self.dtype)(x, train=train)
                if stride != base:
                    x = upsample2x(x, method="bilinear")
            out = x if out is None else out + x
        return emit_geo_maps(out, c, self.num_classes, self.dtype)


def gather_class_aware(maps: dict[str, Array], cfg: GeoHeadConfig,
                       num_classes: int, roi_cls: Array) -> dict[str, Array]:
    """Select the per-ROI class slice from class-aware output channels.

    Reference: core/gdrn_modeling/models/GDRN.py:106-124. NHWC: channel is the
    last axis, so the gather is a reshape + take_along_axis (one XLA gather).
    """
    out = dict(maps)
    flags = {
        "mask": cfg.mask_class_aware, "xyz": cfg.xyz_class_aware,
        "region": cfg.region_class_aware, "vf": cfg.xyz_class_aware,
        "norm": cfg.xyz_class_aware,
    }
    for k, v in maps.items():
        if not flags.get(k, False):
            continue
        n, h, w, c = v.shape
        per = c // num_classes
        v = v.reshape(n, h, w, num_classes, per)
        idx = roi_cls[:, None, None, None, None]
        out[k] = jnp.take_along_axis(
            v, jnp.broadcast_to(idx, (n, h, w, 1, per)), axis=3
        )[..., 0, :]
    return out
