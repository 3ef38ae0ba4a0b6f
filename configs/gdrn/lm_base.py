"""GDR-Net Stage-I config for LINEMOD (13 objects), mirroring
configs/gdrn/lmPbrSingleObj/resnest50d_a6_AugCosyAAEGray_BG05_mlBCE_lm_pbr_100e
(reference hyperparameters; see SURVEY.md §6 for expected metrics)."""

from self6dpp_tpu.config.base import (
    BackboneConfig, Config, DataConfig, DZIConfig, GeoHeadConfig, LossConfig,
    PnPNetConfig, PoseNetConfig, SolverConfig, TestConfig,
)


def get_config() -> Config:
    return Config(
        exp_name="gdrn_lm_base",
        model=PoseNetConfig(
            name="GDRN",
            num_classes=13,
            input_res=256,
            output_res=64,
            backbone=BackboneConfig(name="resnest50d"),
            geo_head=GeoHeadConfig(
                up_types=("deconv", "bilinear", "bilinear"),
                feat_dim=256, num_regions=64, xyz_bin=1,
            ),
            pnp_net=PnPNetConfig(
                rot_type="allo_rot6d", trans_type="centroid_z", z_type="REL",
                region_attention=True, with_2d_coord=True,
            ),
            loss=LossConfig(
                xyz_loss_type="L1", xyz_lw=1.0,
                mask_loss_type="BCE", mask_lw=1.0,        # mlBCE family
                region_loss_type="CE", region_lw=1.0,
                pm_lw=1.0, pm_loss_sym=True, pm_r_only=True,
                centroid_lw=1.0, z_lw=1.0,
            ),
        ),
        solver=SolverConfig(
            optimizer="ranger", base_lr=1e-4, anneal_method="cosine",
            anneal_point=0.72, total_iters=100_000, ims_per_batch=24,
            reference_bs=24, grad_clip_norm=35.0,
        ),
        data=DataConfig(
            train_datasets=("lm_pbr",), test_datasets=("lm",),
            dzi=DZIConfig(type="uniform", pad_scale=1.5,
                          scale_ratio=0.25, shift_ratio=0.25),
            color_aug_prob=0.8, bg_replace_prob=0.5,
        ),
        test=TestConfig(test_bbox_type="est"),
    )
