"""DeepIM render-and-compare refiner in Flax.

Parity target: core/deepim/models/DeepIM_FlowNet.py:34-310 (FlowNetS backbone
on concatenated ren|obs input, FC_RotTransHead delta pose, ConvOutHead mask,
optional flow output) + deepim_loss (:214-310). The iterative refinement loop
lives in engine/deepim_engine.py as lax.scan with in-graph rendering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config.base import DeepIMConfig
from ..losses.common import sigmoid_bce
from ..losses.flow_loss import multiscale_epe, one_scale_epe
from ..losses.pm_loss import pm_loss
from ..ops import pose_decode
from .backbones.flownet import FlowNetS
from .layers import get_act

Array = jax.Array


class FCRotTransHead(nn.Module):
    """core/deepim/models/heads/fc_rot_trans_head.py parity."""
    feat_dim: int = 256
    num_layers: int = 2
    rot_dim: int = 6
    num_classes: int = 1
    act: str = "leakyrelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        act = get_act(self.act)
        for _ in range(self.num_layers):
            x = act(nn.Dense(self.feat_dim, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.001))(x))
        rot = nn.Dense(self.rot_dim * self.num_classes, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name="fc_r")(x)
        t = nn.Dense(3 * self.num_classes, dtype=self.dtype,
                     kernel_init=nn.initializers.normal(0.01),
                     name="fc_t")(x)
        return rot, t


class ConvMaskHead(nn.Module):
    """Conv head on the deconv feature (heads/conv_out_head.py parity:
    num_feat_layers ConvModules (GN+GELU, bias-free) then a biased out conv;
    the reference default is out-layer only, deepim_base.py:141-150)."""
    feat_dim: int = 256
    num_feat_layers: int = 0
    norm: str = "GN"
    num_gn_groups: int = 32
    act: str = "gelu"
    out_kernel_size: int = 1
    out_dim: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        from .layers import ConvNormAct
        for _ in range(self.num_feat_layers):
            x = ConvNormAct(self.feat_dim, 3, norm=self.norm,
                            num_gn_groups=self.num_gn_groups, act=self.act,
                            dtype=self.dtype)(x, train=train)
        k = self.out_kernel_size
        return nn.Conv(self.out_dim, (k, k), padding="SAME", dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01))(x)


class DeepIM(nn.Module):
    """The three reference refiner architectures behind one module, selected
    by DeepIMConfig.name:

      DeepIM_FlowNet  — FlowNetS trunk on concat(ren, obs)
                        (core/deepim/models/DeepIM_FlowNet.py:34-310);
      DeepIM_Shared   — one generic CNN backbone on concat(ren, obs)
                        (core/deepim/models/DeepIM_Shared.py:34-205);
      DeepIM_Unshared — separate obs / ren backbones, conv features fused by
                        channel concat for the pose head, mask head on the
                        obs features (core/deepim/models/DeepIM_Unshared.py:
                        33-215).

    Shared/Unshared take any ResNetBackbone arch via DeepIMConfig.backbone;
    their optional flow head is not carried over (no reference config
    instantiates it — net_factory.py registers them but configs/ contains
    zero DeepIM_Shared/Unshared entries; the variants exist here for the
    same reason: architecture-surface parity)."""
    cfg: DeepIMConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        if c.name == "DeepIM_FlowNet":
            self.backbone = FlowNetS(
                in_channels=c.in_channels, use_bn=c.use_bn,
                out_flow_level="flow4" if c.with_flow else "none",
                out_concat4=c.with_mask_head, dtype=self.dtype)
        elif c.name in ("DeepIM_Shared", "DeepIM_Unshared"):
            if c.with_flow:
                raise ValueError(
                    f"{c.name}: with_flow is FlowNet-only (no reference "
                    "config pairs a flow head with the Shared/Unshared "
                    "variants)")
            from .backbones.resnet import ResNetBackbone
            arch = c.backbone if c.backbone != "flownets" else "resnet18"
            if c.name == "DeepIM_Shared":
                # one trunk on the full concat(ren, obs) stack
                self.backbone = ResNetBackbone(
                    arch=arch, in_channels=c.in_channels,
                    out_indices=(4,), dtype=self.dtype)
            else:
                # separate obs / ren trunks, each on half the channels
                assert c.in_channels % 2 == 0, \
                    "Unshared splits ren|obs channel-wise"
                half = c.in_channels // 2
                self.backbone = ResNetBackbone(
                    arch=arch, in_channels=half, out_indices=(4,),
                    dtype=self.dtype)
                self.backbone_ren = ResNetBackbone(
                    arch=arch, in_channels=half, out_indices=(4,),
                    dtype=self.dtype)
        else:
            raise ValueError(f"unknown DeepIM variant: {c.name!r}")
        rot_dim = 6 if c.rot_type.endswith("rot6d") else 4
        self.pose_head = FCRotTransHead(
            feat_dim=c.pose_feat_dim, num_layers=c.pose_num_layers,
            rot_dim=rot_dim, dtype=self.dtype)
        if c.with_mask_head:
            self.mask_head = ConvMaskHead(
                out_dim=c.num_classes if c.mask_class_aware else 1,
                dtype=self.dtype)

    def __call__(
        self,
        x: Array,                  # (B, H, W, C) concat(ren, obs)
        init_rot: Array,           # (B, 3, 3)
        init_trans: Array,         # (B, 3)
        K_zoom: Array,             # (B, 3, 3)
        obj_class: Array | None = None,
        train: bool = False,
    ) -> dict[str, Array]:
        c = self.cfg
        if c.name == "DeepIM_FlowNet":
            conv6, concat4, flow = self.backbone(x, train=train)
        elif c.name == "DeepIM_Shared":
            conv6 = self.backbone(x, train=train)
            concat4, flow = conv6, None
        else:
            # DeepIM_Unshared: split the engine's input stack
            # [ren_rgb(3) | obs_rgb(3) | ren_mask(1) | obs_mask(1)]
            # (deepim_engine.py::render_and_zoom) back into per-stream inputs
            if c.in_channels == 8:
                x_ren = jnp.concatenate([x[..., 0:3], x[..., 6:7]], axis=-1)
                x_obs = jnp.concatenate([x[..., 3:6], x[..., 7:8]], axis=-1)
            else:
                half = c.in_channels // 2
                x_ren, x_obs = x[..., :half], x[..., half:]
            feat_ren = self.backbone_ren(x_ren, train=train)
            feat_obs = self.backbone(x_obs, train=train)
            conv6 = jnp.concatenate([feat_obs, feat_ren], axis=-1)
            # mask is predicted from the OBS features only
            # (DeepIM_Unshared.py:114-121)
            concat4, flow = feat_obs, None

        b = conv6.shape[0]
        flat = conv6.reshape(b, -1, conv6.shape[-1])
        if c.flat_op == "flatten":
            feat = flat.reshape(b, -1)
        elif c.flat_op == "avg":
            feat = flat.mean(axis=1)
        elif c.flat_op == "avg-max":
            feat = jnp.concatenate([flat.mean(1), flat.max(1)], axis=-1)
        elif c.flat_op == "avg-max-min":
            feat = jnp.concatenate([flat.mean(1), flat.max(1), flat.min(1)], -1)
        else:
            raise ValueError(c.flat_op)

        rot_rep, trans_delta = self.pose_head(feat)
        rot_delta = pose_decode.rot_rep_to_mat(rot_rep, c.rot_type)
        rot_new, trans_new = pose_decode.pose_from_delta_init(
            rot_delta, trans_delta, init_rot, init_trans, Ks=K_zoom,
            K_aware=True, delta_T_space=c.t_space, delta_T_weight=c.t_weight,
            delta_z_style=c.z_style, is_allo="allo" in c.rot_type)

        out = {"rot": rot_new, "trans": trans_new, "rot_delta": rot_delta,
               "trans_delta": trans_delta}
        if flow is not None:
            out["flow"] = flow
        if c.with_mask_head and concat4 is not None:
            mask = self.mask_head(concat4)
            if c.mask_class_aware:
                assert obj_class is not None
                mask = jnp.take_along_axis(
                    mask, obj_class[:, None, None, None], axis=-1)
            # upsample to input res
            out["mask_logits"] = jax.image.resize(
                mask, (b, x.shape[1], x.shape[2], mask.shape[-1]), "bilinear")
        return out


def deepim_loss(cfg: DeepIMConfig, out: dict[str, Array],
                batch: dict[str, Array]) -> dict[str, Array]:
    """Per-refine-iteration losses (DeepIM_FlowNet.py:214-310).

    batch keys: gt_rot, gt_trans, gt_points, roi_extent, sym_rots, sym_valid,
    gt_flow (B,H,W,2), gt_flow_valid (B,H,W), gt_mask_visib (B,H,W).
    """
    loss: dict[str, Array] = {}
    if cfg.pm_lw > 0:
        loss.update(pm_loss(
            out["rot"], batch["gt_rot"], batch["gt_points"],
            pred_transes=out["trans"], gt_transes=batch["gt_trans"],
            extents=batch.get("roi_extent"),
            sym_rots=batch.get("sym_rots"), sym_valid=batch.get("sym_valid"),
            loss_weight=cfg.pm_lw, symmetric=cfg.pm_loss_sym,
            r_only=cfg.pm_r_only, disentangle_z=cfg.pm_disentangle_z,
            norm_by_extent=True))
    if cfg.flow_lw > 0 and "flow" in out and "gt_flow" in batch:
        f = out["flow"]
        if isinstance(f, list):
            loss["loss_flow"] = cfg.flow_lw * multiscale_epe(
                f, batch["gt_flow"], batch["gt_flow_valid"])
        else:
            loss["loss_flow"] = cfg.flow_lw * one_scale_epe(
                f, batch["gt_flow"], batch["gt_flow_valid"])
    if cfg.mask_lw > 0 and "mask_logits" in out and "gt_mask_visib" in batch:
        loss["loss_mask"] = cfg.mask_lw * sigmoid_bce(
            out["mask_logits"][..., 0], batch["gt_mask_visib"]).mean()
    if cfg.trans_lw > 0:
        loss["loss_trans_xy"] = cfg.trans_lw * jnp.abs(
            out["trans"][:, :2] - batch["gt_trans"][:, :2]).mean()
        loss["loss_trans_z"] = cfg.trans_lw * jnp.abs(
            out["trans"][:, 2] - batch["gt_trans"][:, 2]).mean()
    if cfg.rot_lw > 0:
        m = out["rot"] @ jnp.swapaxes(batch["gt_rot"], -1, -2)
        tr = jnp.trace(m, axis1=-2, axis2=-1)
        loss["loss_rot"] = cfg.rot_lw * ((1 - (tr - 1) / 2) / 2).mean()
    return loss
