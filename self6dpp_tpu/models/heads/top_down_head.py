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

        xyz_dim = 3 if c.xyz_bin <= 1 else 3 * (c.xyz_bin + 1)
        region_dim = c.num_regions + 1
        mask_mult = self.num_classes if c.mask_class_aware else 1
        xyz_mult = self.num_classes if c.xyz_class_aware else 1
        region_mult = self.num_classes if c.region_class_aware else 1

        chans = {
            "mask": c.num_masks * mask_mult,
            "xyz": xyz_dim * xyz_mult,
            "region": region_dim * region_mult,
        }
        if c.with_vf:
            chans["vf"] = 4 * c.num_vf_points * xyz_mult
        if c.with_norm:
            chans["norm"] = 3 * xyz_mult

        if c.out_layer_shared:
            total = sum(chans.values())
            out = nn.Conv(total, (c.out_kernel_size, c.out_kernel_size),
                          padding="SAME", dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01))(x)
            maps, ofs = {}, 0
            for k, n in chans.items():
                maps[k] = out[..., ofs : ofs + n]
                ofs += n
        else:
            maps = {
                k: nn.Conv(n, (c.out_kernel_size, c.out_kernel_size),
                           padding="SAME", dtype=self.dtype, name=f"out_{k}",
                           kernel_init=nn.initializers.normal(0.01))(x)
                for k, n in chans.items()
            }
        return maps


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
