"""Tiny end-to-end smoke config on the generated synthetic BOP dataset."""

from self6dpp_tpu.config.base import (
    BackboneConfig, Config, DataConfig, DZIConfig, GeoHeadConfig, LossConfig,
    PnPNetConfig, PoseNetConfig, SolverConfig, TestConfig,
)


def get_config() -> Config:
    return Config(
        exp_name="gdrn_synthetic_smoke",
        output_dir="/tmp/smoke_out",
        model=PoseNetConfig(
            num_classes=2, input_res=64, output_res=16,
            backbone=BackboneConfig(name="micro"),
            geo_head=GeoHeadConfig(feat_dim=32, num_gn_groups=8, num_regions=8),
            pnp_net=PnPNetConfig(featdim=32, num_gn_groups=8),
            loss=LossConfig(),
        ),
        solver=SolverConfig(optimizer="adam", base_lr=3e-4, total_iters=60,
                            warmup_iters=5, ims_per_batch=8, reference_bs=8,
                            ema_decay=0.999),
        data=DataConfig(dataset_root="/tmp/bopdata",
                        train_datasets=("synthetic",),
                        test_datasets=("synthetic",),
                        model_points=64, max_sym_rots=4,
                        dzi=DZIConfig(pad_scale=1.5)),
        ckpt_period=60, log_period=20,
    )
