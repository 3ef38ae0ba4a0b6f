"""GDR-Net Stage-I config for HomebrewedDB (33 objects; metadata from
ref/hb.py:30-91). Self6D++ uses HB's LM-overlap objects (benchvise,
driller, phone) for cross-dataset stage-II evaluation; train on PBR data
with the same recipe as LM."""

import dataclasses

from configs.gdrn.lm_base import get_config as base
from self6dpp_tpu.config.base import Config, DataConfig, DZIConfig


def get_config() -> Config:
    b = base()
    return dataclasses.replace(
        b,
        exp_name="gdrn_hb_base",
        model=dataclasses.replace(b.model, num_classes=33),
        data=DataConfig(
            train_datasets=("hb_pbr",), test_datasets=("hb",),
            dzi=DZIConfig(type="uniform", pad_scale=1.5,
                          scale_ratio=0.25, shift_ratio=0.25),
            color_aug_prob=0.8, bg_replace_prob=0.5,
        ),
    )
