"""GDRN_MaskNormVF Stage-I config for LINEMOD — the new_cfg flagship
variant (reference configs/self6dpp/new_cfg/base.py:89-137 MODEL block:
GDRN_MaskNormVF with TopDownMaskNormVFXyzRegionHead + ConvPnPNetMaskNormVF).

All heads are trainable stage-I: the loader emits gt_vf_vis/gt_vf_full
(keypoint vector fields from FPS points) and gt_norm (camera-frame normals
from the 6-channel GT render), and gdrn_loss adds the vf/norm terms."""

import dataclasses

from configs.gdrn.lm_base import get_config as base
from self6dpp_tpu.config.base import Config


def get_config() -> Config:
    b = base()
    m = b.model
    return dataclasses.replace(
        b,
        exp_name="gdrn_lm_masknormvf",
        model=dataclasses.replace(
            m,
            geo_head=dataclasses.replace(
                m.geo_head, num_masks=2, with_vf=True, with_norm=True,
                num_vf_points=16),
            pnp_net=dataclasses.replace(
                m.pnp_net, name="ConvPnPNetMaskNormVF"),
            loss=dataclasses.replace(
                m.loss, vf_lw=1.0, norm_lw=1.0),
        ),
    )
