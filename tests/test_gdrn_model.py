"""Smoke + correctness tests for the Flax GDRN model and its loss."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self6dpp_tpu.config.base import (
    BackboneConfig, Config, GeoHeadConfig, LossConfig, PnPNetConfig, PoseNetConfig,
)
from self6dpp_tpu.data.synthetic import make_gdrn_batch
from self6dpp_tpu.losses.gdrn_loss import gdrn_loss
from self6dpp_tpu.models.gdrn import GDRN


def tiny_cfg(**model_kw) -> Config:
    model = PoseNetConfig(
        num_classes=3,
        input_res=64,
        output_res=16,
        backbone=BackboneConfig(name="resnet18"),
        geo_head=GeoHeadConfig(feat_dim=32, num_gn_groups=8, num_regions=8,
                               xyz_bin=1),
        pnp_net=PnPNetConfig(featdim=32, num_gn_groups=8),
        loss=LossConfig(pm_loss_sym=True, pm_r_only=False, pm_disentangle_z=True),
        **model_kw,
    )
    return Config(model=model)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = GDRN(cfg=cfg.model)
    batch = {k: jnp.asarray(v) for k, v in make_gdrn_batch(cfg, 2, input_res=64,
                                                           output_res=16,
                                                           n_points=64).items()}
    variables = model.init(
        jax.random.PRNGKey(0), batch["roi_img"], batch["roi_cls"],
        batch["roi_cam"], batch["roi_center"], batch["roi_wh"],
        batch["roi_extent"], batch["resize_ratio"], batch["roi_coord_2d"],
        train=False,
    )
    return cfg, model, batch, variables


def test_forward_shapes(setup):
    cfg, model, batch, variables = setup
    out = model.apply(
        variables, batch["roi_img"], batch["roi_cls"], batch["roi_cam"],
        batch["roi_center"], batch["roi_wh"], batch["roi_extent"],
        batch["resize_ratio"], batch["roi_coord_2d"], train=False,
    )
    assert out["rot"].shape == (2, 3, 3)
    assert out["trans"].shape == (2, 3)
    assert out["coor"].shape == (2, 16, 16, 3)
    assert out["mask_logits"].shape == (2, 16, 16, 1)
    assert out["region_logits"].shape == (2, 16, 16, 9)
    # rotation validity
    eye = np.asarray(jnp.swapaxes(out["rot"], -1, -2) @ out["rot"])
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-4)


def test_geo_mode_skips_pose(setup):
    cfg, model, batch, variables = setup
    out = model.apply(
        variables, batch["roi_img"], batch["roi_cls"], batch["roi_cam"],
        batch["roi_center"], batch["roi_wh"], batch["roi_extent"],
        batch["resize_ratio"], batch["roi_coord_2d"], train=False,
        forward_mode="geo",
    )
    assert "rot" not in out and "coor" in out


def test_loss_finite_and_grads(setup):
    cfg, model, batch, variables = setup

    def loss_fn(params):
        out, _ = model.apply(
            {**variables, "params": params}, batch["roi_img"], batch["roi_cls"],
            batch["roi_cam"], batch["roi_center"], batch["roi_wh"],
            batch["roi_extent"], batch["resize_ratio"], batch["roi_coord_2d"],
            train=True, mutable=["batch_stats"],
        )
        ld = gdrn_loss(cfg.model.loss, cfg.model.pnp_net, out, batch,
                       num_regions=cfg.model.geo_head.num_regions)
        return sum(jax.tree.leaves(ld)), ld

    (total, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(total)), ld
    expected_keys = {"loss_coor_x", "loss_coor_y", "loss_coor_z", "loss_mask",
                     "loss_region", "loss_PM_R", "loss_PM_xy", "loss_PM_z",
                     "loss_centroid", "loss_z"}
    assert expected_keys <= set(ld.keys()), set(ld.keys())
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_binned_xyz_variant():
    cfg = tiny_cfg()
    m = dataclasses.replace(
        cfg.model,
        geo_head=dataclasses.replace(cfg.model.geo_head, xyz_bin=16),
        loss=dataclasses.replace(cfg.model.loss, xyz_loss_type="CE_coor"),
    )
    model = GDRN(cfg=m)
    batch = {k: jnp.asarray(v) for k, v in make_gdrn_batch(
        Config(model=m), 2, input_res=64, output_res=16, n_points=64).items()}
    batch["gt_xyz_bin"] = jnp.clip(batch["gt_xyz_bin"], 0, 16)
    variables = model.init(
        jax.random.PRNGKey(0), batch["roi_img"], batch["roi_cls"],
        batch["roi_cam"], batch["roi_center"], batch["roi_wh"],
        batch["roi_extent"], batch["resize_ratio"], batch["roi_coord_2d"])
    out = model.apply(
        variables, batch["roi_img"], batch["roi_cls"], batch["roi_cam"],
        batch["roi_center"], batch["roi_wh"], batch["roi_extent"],
        batch["resize_ratio"], batch["roi_coord_2d"])
    assert out["coor_logits"].shape == (2, 16, 16, 3, 17)
    assert out["coor"].shape == (2, 16, 16, 3)
    ld = gdrn_loss(m.loss, m.pnp_net, out, batch, xyz_bin=16)
    assert np.isfinite(float(sum(jax.tree.leaves(ld))))


def test_double_mask_vf_variant():
    """GDRN_double_mask_double_vf parity: 2 masks + VF head."""
    cfg = tiny_cfg()
    m = dataclasses.replace(
        cfg.model,
        geo_head=dataclasses.replace(cfg.model.geo_head, num_masks=2,
                                     with_vf=True, with_norm=True),
    )
    model = GDRN(cfg=m)
    batch = {k: jnp.asarray(v) for k, v in make_gdrn_batch(
        Config(model=m), 2, input_res=64, output_res=16, n_points=64).items()}
    variables = model.init(
        jax.random.PRNGKey(0), batch["roi_img"], batch["roi_cls"],
        batch["roi_cam"], batch["roi_center"], batch["roi_wh"],
        batch["roi_extent"], batch["resize_ratio"], batch["roi_coord_2d"])
    out = model.apply(
        variables, batch["roi_img"], batch["roi_cls"], batch["roi_cam"],
        batch["roi_center"], batch["roi_wh"], batch["roi_extent"],
        batch["resize_ratio"], batch["roi_coord_2d"])
    assert out["mask_logits"].shape[-1] == 2
    # {u,v} x {vis,full} x num_vf_points (reference vf_out_dim = 2*2*16)
    assert out["vf"].shape == (2, 16, 16, 4 * m.geo_head.num_vf_points)
    assert out["norm"].shape == (2, 16, 16, 3)


def test_class_aware_gather():
    cfg = tiny_cfg()
    m = dataclasses.replace(
        cfg.model,
        geo_head=dataclasses.replace(cfg.model.geo_head, xyz_class_aware=True,
                                     mask_class_aware=True,
                                     region_class_aware=True),
    )
    model = GDRN(cfg=m)
    batch = {k: jnp.asarray(v) for k, v in make_gdrn_batch(
        Config(model=m), 2, input_res=64, output_res=16, n_points=64).items()}
    variables = model.init(
        jax.random.PRNGKey(0), batch["roi_img"], batch["roi_cls"],
        batch["roi_cam"], batch["roi_center"], batch["roi_wh"],
        batch["roi_extent"], batch["resize_ratio"], batch["roi_coord_2d"])
    out = model.apply(
        variables, batch["roi_img"], batch["roi_cls"], batch["roi_cam"],
        batch["roi_center"], batch["roi_wh"], batch["roi_extent"],
        batch["resize_ratio"], batch["roi_coord_2d"])
    assert out["coor"].shape == (2, 16, 16, 3)
    assert out["mask_logits"].shape == (2, 16, 16, 1)
    assert out["region_logits"].shape == (2, 16, 16, 9)


def test_resnest_backbone_smoke():
    from self6dpp_tpu.models.backbones.resnet import ResNetBackbone
    model = ResNetBackbone(arch="resnest50d")
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 2, 2, 2048)


def test_mask_norm_vf_pnp_head():
    """ConvPnPNetMaskNormVF (conv_pnp_net_mask_vf_norm.py, the new_cfg
    GDRN_MaskNormVF family): predicted vf+norm maps feed the PnP input."""
    import dataclasses
    cfg = tiny_cfg()
    m = dataclasses.replace(
        cfg.model,
        geo_head=dataclasses.replace(cfg.model.geo_head, with_vf=True,
                                     with_norm=True, num_vf_points=4),
        pnp_net=dataclasses.replace(cfg.model.pnp_net,
                                    name="ConvPnPNetMaskNormVF"))
    model = GDRN(cfg=m)
    batch = {k: jnp.asarray(v) for k, v in make_gdrn_batch(
        Config(model=m), 2, input_res=64, output_res=16).items()}
    args = (batch["roi_img"], batch["roi_cls"], batch["roi_cam"],
            batch["roi_center"], batch["roi_wh"], batch["roi_extent"],
            batch["resize_ratio"], batch["roi_coord_2d"])
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)
    out = model.apply(variables, *args, train=False)
    assert out["rot"].shape == (2, 3, 3)
    assert out["vf"].shape == (2, 16, 16, 16)      # 4*num_vf_points
    assert out["norm"].shape == (2, 16, 16, 3)


def test_resnest26d_backbone_smoke():
    """timm/resnest26d — the only other resnest arch reference configs use."""
    from self6dpp_tpu.models.backbones.resnet import ResNetBackbone
    model = ResNetBackbone(arch="resnest26d")
    x = jnp.zeros((1, 64, 64, 3))
    y = model.apply(model.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 2, 2, 2048)


def test_darknet53_backbone_in_gdrn():
    """darknet53 registry breadth (mm_nets/darknet.py): stride-32 output,
    drop-in for the GDRN backbone slot."""
    import dataclasses
    from self6dpp_tpu.models.backbones.darknet import DarknetBackbone
    model = DarknetBackbone()
    x = jnp.zeros((1, 64, 64, 3))
    y = model.apply(model.init(jax.random.PRNGKey(0), x), x,
                    mutable=["batch_stats"])[0]
    assert y.shape == (1, 2, 2, 1024)

    cfg = tiny_cfg()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, backbone=dataclasses.replace(cfg.model.backbone,
                                                name="darknet53")))
    gdrn = GDRN(cfg=cfg.model)
    batch = {k: jnp.asarray(v) for k, v in make_gdrn_batch(
        cfg, 2, input_res=64, output_res=16).items()}
    variables = gdrn.init(jax.random.PRNGKey(0), batch["roi_img"],
                          batch["roi_cls"], batch["roi_cam"],
                          batch["roi_center"], batch["roi_wh"],
                          batch["roi_extent"], batch["resize_ratio"],
                          batch["roi_coord_2d"])
    out = gdrn.apply(variables, batch["roi_img"], batch["roi_cls"],
                     batch["roi_cam"], batch["roi_center"], batch["roi_wh"],
                     batch["roi_extent"], batch["resize_ratio"],
                     batch["roi_coord_2d"])
    assert out["rot"].shape == (2, 3, 3)


def test_mtl_uncertainty_weighting():
    """USE_MTL path: log-var params reweight losses (GDRN.py:493-497)."""
    import jax.numpy as jnp
    from self6dpp_tpu.losses.gdrn_loss import gdrn_loss
    cfg = tiny_cfg()
    model = GDRN(cfg=cfg.model)
    batch = {k: jnp.asarray(v) for k, v in make_gdrn_batch(
        cfg, 2, input_res=64, output_res=16, n_points=64).items()}
    variables = model.init(
        jax.random.PRNGKey(0), batch["roi_img"], batch["roi_cls"],
        batch["roi_cam"], batch["roi_center"], batch["roi_wh"],
        batch["roi_extent"], batch["resize_ratio"], batch["roi_coord_2d"])
    out = model.apply(
        variables, batch["roi_img"], batch["roi_cls"], batch["roi_cam"],
        batch["roi_center"], batch["roi_wh"], batch["roi_extent"],
        batch["resize_ratio"], batch["roi_coord_2d"])
    base = gdrn_loss(cfg.model.loss, cfg.model.pnp_net, out, batch)
    mtl_vars = {k.replace("loss_", ""): jnp.asarray([1.0]) for k in base}
    weighted = gdrn_loss(cfg.model.loss, cfg.model.pnp_net, out, batch,
                         mtl_log_vars=mtl_vars)
    # L' = L * exp(-1) + log(1+e) for every term
    import math
    for k in base:
        expected = float(base[k]) * math.exp(-1) + math.log(1 + math.e)
        np.testing.assert_allclose(float(weighted[k]), expected, rtol=1e-4)


def test_simple_point_pnp_variant():
    """SimplePointPnPNet head (point_pnp_net.py:208) + ConvPnPNetCls-style
    extent feature flag both produce valid poses."""
    cfg = tiny_cfg()
    for name, ext_feat in (("SimplePointPnPNet", False), ("ConvPnPNet", True)):
        m = dataclasses.replace(
            cfg.model,
            pnp_net=dataclasses.replace(cfg.model.pnp_net, name=name,
                                        with_extent_feat=ext_feat))
        model = GDRN(cfg=m)
        batch = {k: jnp.asarray(v) for k, v in make_gdrn_batch(
            Config(model=m), 2, input_res=64, output_res=16,
            n_points=64).items()}
        variables = model.init(
            jax.random.PRNGKey(0), batch["roi_img"], batch["roi_cls"],
            batch["roi_cam"], batch["roi_center"], batch["roi_wh"],
            batch["roi_extent"], batch["resize_ratio"], batch["roi_coord_2d"])
        out = model.apply(
            variables, batch["roi_img"], batch["roi_cls"], batch["roi_cam"],
            batch["roi_center"], batch["roi_wh"], batch["roi_extent"],
            batch["resize_ratio"], batch["roi_coord_2d"])
        assert out["rot"].shape == (2, 3, 3)
        assert out["trans"].shape == (2, 3)
        eye = np.asarray(jnp.einsum("bij,bkj->bik", out["rot"], out["rot"]))
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (2, 3, 3)),
                                   atol=1e-4)


def _run_gdrn(m):
    model = GDRN(cfg=m)
    batch = {k: jnp.asarray(v) for k, v in make_gdrn_batch(
        Config(model=m), 2, input_res=64, output_res=16,
        n_points=64).items()}
    variables = model.init(
        jax.random.PRNGKey(0), batch["roi_img"], batch["roi_cls"],
        batch["roi_cam"], batch["roi_center"], batch["roi_wh"],
        batch["roi_extent"], batch["resize_ratio"], batch["roi_coord_2d"])
    out = model.apply(
        variables, batch["roi_img"], batch["roi_cls"], batch["roi_cam"],
        batch["roi_center"], batch["roi_wh"], batch["roi_extent"],
        batch["resize_ratio"], batch["roi_coord_2d"])
    assert out["rot"].shape == (2, 3, 3)
    assert out["coor"].shape == (2, 16, 16, 3)
    assert out["mask_logits"].shape == (2, 16, 16, 1)
    eye = np.asarray(jnp.einsum("bij,bkj->bik", out["rot"], out["rot"]))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (2, 3, 3)),
                               atol=1e-4)
    return out


def test_pvnet_backbone_conv_head():
    """pvnet_*_8s dilated encoder-decoder backbone (model_repository.py)
    paired with the plain-conv geo head (conv_mask_xyz_region_head.py):
    the decoder stops at output_res's stride so the dense maps land at
    output_res directly."""
    cfg = tiny_cfg()
    m = dataclasses.replace(
        cfg.model,
        backbone=BackboneConfig(name="pvnet_micro_8s"),
        geo_head=dataclasses.replace(cfg.model.geo_head,
                                     name="ConvMaskXyzRegionHead",
                                     num_feat_layers=1, feat_dim=32))
    _run_gdrn(m)


def test_fpn_neck_and_head():
    """FPN neck (gdrn_base.py:47-57) + Semantic-FPN geo head
    (fpn_mask_xyz_region_head.py:139-306): pyramid from backbone stages
    1-4, per-level scale heads summed at stride 4 = output_res."""
    cfg = tiny_cfg()
    m = dataclasses.replace(
        cfg.model,
        backbone=BackboneConfig(name="micro", out_indices=(1, 2, 3, 4)),
        neck="fpn", neck_out_channels=32,
        geo_head=dataclasses.replace(cfg.model.geo_head,
                                     name="FPNMaskXyzRegionHead",
                                     feat_dim=32))
    _run_gdrn(m)


def test_conv_head_on_fpn_level():
    """ConvMaskXyzRegionHead consuming the finest FPN level."""
    cfg = tiny_cfg()
    m = dataclasses.replace(
        cfg.model,
        backbone=BackboneConfig(name="micro", out_indices=(1, 2, 3, 4)),
        neck="fpn", neck_out_channels=32,
        geo_head=dataclasses.replace(cfg.model.geo_head,
                                     name="ConvMaskXyzRegionHead",
                                     num_feat_layers=1, feat_dim=32))
    _run_gdrn(m)


def test_pvnet_backbone_train_step():
    """One supervised train step through the PVNet encoder-decoder backbone:
    BN batch_stats mutate and the loss is finite."""
    from self6dpp_tpu.config.base import SolverConfig
    from self6dpp_tpu.engine import gdrn_engine as eng

    cfg = tiny_cfg()
    m = dataclasses.replace(
        cfg.model,
        backbone=BackboneConfig(name="pvnet_micro_8s"),
        geo_head=dataclasses.replace(cfg.model.geo_head,
                                     name="ConvMaskXyzRegionHead",
                                     num_feat_layers=1, feat_dim=32))
    cfg = Config(model=m, solver=SolverConfig(
        optimizer="adam", base_lr=1e-4, total_iters=10, warmup_iters=0,
        ims_per_batch=2, reference_bs=2))
    model = GDRN(cfg=m)
    batch = {k: jnp.asarray(v) for k, v in make_gdrn_batch(
        cfg, 2, input_res=64, output_res=16, n_points=64).items()}
    state = eng.init_state(cfg, model, batch)
    step = eng.jit_train_step(cfg, model)
    before = jax.tree.leaves(state.batch_stats)[0].copy()
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
    after = jax.tree.leaves(state.batch_stats)[0]
    assert float(jnp.abs(after - before).max()) > 0, "BN stats did not move"
