"""GDR-Net Stage-I config for YCB-V (21 objects), mirroring
configs/gdrn/ycbvPbrSO/resnest50d_AugCosyAAEGray_BG05_visib10_mlBCE_DoubleMask
(reference hyperparameters: CDPNv2-style head, double mask, class-aware
region, smooth-L1 PM; SURVEY.md §6)."""

import dataclasses

from configs.gdrn.lm_base import get_config as base_config
from self6dpp_tpu.config.base import (Config, DataConfig, DZIConfig,
                                      GeoHeadConfig, LossConfig)


def get_config() -> Config:
    base = base_config()
    model = dataclasses.replace(
        base.model,
        num_classes=21,
        geo_head=dataclasses.replace(
            base.model.geo_head,
            num_masks=2,                    # visib + full (DoubleMask)
        ),
        loss=dataclasses.replace(
            base.model.loss,
            pm_loss_sym=True,               # ycbv has symmetric objects
            full_mask_lw=1.0,
        ),
    )
    return dataclasses.replace(
        base,
        exp_name="gdrn_ycbv_base",
        model=model,
        data=dataclasses.replace(
            base.data,
            train_datasets=("ycbv_pbr",), test_datasets=("ycbv",),
            filter_visib_thr=0.1,           # visib10
            dzi=DZIConfig(type="uniform", pad_scale=1.5,
                          scale_ratio=0.25, shift_ratio=0.25),
        ),
    )
