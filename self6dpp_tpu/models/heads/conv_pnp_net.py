"""Patch-PnP head: dense geometry maps -> (rot_rep, centroid+z).

Parity target: core/gdrn_modeling/models/heads/conv_pnp_net.py (ConvPnPNet:
denormalize coords by extents, concat region/2d-coord/mask-attention, 3
stride-2 GN convs, fc1024 -> fc256 -> fc_r + fc_t) plus the variant family
(ConvPnPNetAll with VF input, ConvPnPNetNoRegion, point-net style
SimplePointPnPNet) — covered here by input composition flags.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...config.base import PnPNetConfig
from ..layers import DropBlock, get_act, make_norm

Array = jax.Array


class ConvPnPNet(nn.Module):
    cfg: PnPNetConfig
    rot_dim: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        coor_feat: Array,                 # (B, H, W, 3[+2]) xyz (+2d coords)
        region: Array | None = None,      # (B, H, W, R) softmaxed region
        extents: Array | None = None,     # (B, 3)
        mask_attention: Array | None = None,
        extra_feat: Array | None = None,  # (B, H, W, E) vf/norm channels
        train: bool = False,
    ) -> tuple[Array, Array]:
        c = self.cfg
        if c.denormalize_by_extent and extents is not None and coor_feat.shape[-1] in (3, 5):
            xyz = (coor_feat[..., :3] - 0.5) * extents[:, None, None, :]
            coor_feat = jnp.concatenate([xyz, coor_feat[..., 3:]], axis=-1)

        x = coor_feat
        if region is not None:
            x = jnp.concatenate([x, region], axis=-1)
        if c.mask_attention == "mul":
            x = x * mask_attention
        elif c.mask_attention == "concat":
            x = jnp.concatenate([x, mask_attention], axis=-1)
        if extra_feat is not None:
            # ConvPnPNetMaskNormVF: predicted vf+norm maps join the input
            # after the mask attention (conv_pnp_net_mask_vf_norm.py:145-150)
            x = jnp.concatenate([x, extra_feat], axis=-1)

        if c.drop_prob > 0:
            x = DropBlock(drop_prob=c.drop_prob)(x, train=train)

        act = get_act(c.act)
        for i in range(c.num_stride2_layers):
            # explicit symmetric pad = torch Conv2d(3, stride=2, padding=1)
            x = nn.Conv(c.featdim, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.001))(x)
            x = make_norm(c.norm, c.num_gn_groups, dtype=self.dtype)(x, train=train)
            x = act(x)
        for i in range(c.num_extra_layers):
            x = nn.Conv(c.featdim, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype,
                        kernel_init=nn.initializers.normal(0.001))(x)
            x = make_norm(c.norm, c.num_gn_groups, dtype=self.dtype)(x, train=train)
            x = act(x)

        b = x.shape[0]
        flat = x.reshape(b, -1, x.shape[-1])          # (B, HW, C)
        if c.flat_op == "flatten":
            feat = flat.reshape(b, -1)
        elif c.flat_op == "avg":
            feat = flat.mean(axis=1)
        elif c.flat_op == "avg-max":
            feat = jnp.concatenate([flat.mean(axis=1), flat.max(axis=1)], axis=-1)
        elif c.flat_op == "avg-max-min":
            feat = jnp.concatenate(
                [flat.mean(axis=1), flat.max(axis=1), flat.min(axis=1)], axis=-1)
        else:
            raise ValueError(f"unknown flat_op: {c.flat_op}")

        if c.with_extent_feat and extents is not None:
            # ConvPnPNetCls-style explicit extent feature: the two-layer
            # 3->64->128 object-size embedding (conv_pnp_net_cls.py:102-103,
            # 173-174)
            ext = act(nn.Dense(64, dtype=self.dtype, name="fc_extent1",
                               kernel_init=nn.initializers.normal(0.001))(
                extents))
            ext = act(nn.Dense(128, dtype=self.dtype, name="fc_extent2",
                               kernel_init=nn.initializers.normal(0.001))(
                ext))
            feat = jnp.concatenate([feat, ext], axis=-1)

        feat = act(nn.Dense(1024, dtype=self.dtype,
                            kernel_init=nn.initializers.normal(0.001))(feat))
        feat = act(nn.Dense(256, dtype=self.dtype,
                            kernel_init=nn.initializers.normal(0.001))(feat))
        rot = nn.Dense(self.rot_dim, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01), name="fc_r")(feat)
        t = nn.Dense(3, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(0.01), name="fc_t")(feat)
        return rot, t


class SimplePointPnPNet(nn.Module):
    """Point-net style PnP head (point_pnp_net.py:208 SimplePointPnPNet,
    after github.com/cvlab-epfl/single-stage-pose): per-pixel 1x1 convs
    128-128-1024 over the (denormalized xyz ++ region ++ 2d-coord) feature
    set, global max pool, fc512 -> fc256 -> pose. NHWC: 1x1 convs are Dense
    layers over the channel axis — pure MXU matmuls."""

    cfg: PnPNetConfig
    rot_dim: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, coor_feat: Array, region: Array | None = None,
                 extents: Array | None = None,
                 mask_attention: Array | None = None,
                 extra_feat: Array | None = None,
                 train: bool = False) -> tuple[Array, Array]:
        c = self.cfg
        if c.denormalize_by_extent and extents is not None and \
                coor_feat.shape[-1] in (3, 5):
            xyz = (coor_feat[..., :3] - 0.5) * extents[:, None, None, :]
            coor_feat = jnp.concatenate([xyz, coor_feat[..., 3:]], axis=-1)
        x = coor_feat
        if region is not None:
            x = jnp.concatenate([x, region], axis=-1)
        if extra_feat is not None:
            x = jnp.concatenate([x, extra_feat], axis=-1)
        if c.mask_attention == "mul":
            x = x * mask_attention
        elif c.mask_attention == "concat":
            x = jnp.concatenate([x, mask_attention], axis=-1)

        act = get_act("leakyrelu")
        b = x.shape[0]
        pts = x.reshape(b, -1, x.shape[-1])           # (B, P, C)
        ini = nn.initializers.normal(0.001)
        pts = act(nn.Dense(128, dtype=self.dtype, kernel_init=ini)(pts))
        pts = act(nn.Dense(128, dtype=self.dtype, kernel_init=ini)(pts))
        pts = act(nn.Dense(1024, dtype=self.dtype, kernel_init=ini)(pts))
        feat = pts.max(axis=1)                        # global max pool
        feat = act(nn.Dense(512, dtype=self.dtype, kernel_init=ini)(feat))
        feat = act(nn.Dense(256, dtype=self.dtype, kernel_init=ini)(feat))
        pose = nn.Dense(self.rot_dim + 3, dtype=self.dtype, name="fc_pose",
                        kernel_init=nn.initializers.normal(0.01))(feat)
        return pose[:, : self.rot_dim], pose[:, self.rot_dim :]
