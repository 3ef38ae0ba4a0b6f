"""Self6D++ Stage-II self-supervised config for HomebrewedDB — the
cross-domain adaptation experiment of the paper (LM-trained model
self-supervised on HB sequences; reference configs/self6dpp/hbBdpSO/)."""

import dataclasses

from configs.gdrn.hb_base import get_config as base
from self6dpp_tpu.config.base import Config, SelfSupConfig, SolverConfig


def get_config() -> Config:
    b = base()
    return dataclasses.replace(
        b,
        exp_name="self6dpp_hb_ss",
        solver=SolverConfig(
            optimizer="ranger", base_lr=2e-5, anneal_method="cosine",
            anneal_point=0.72, total_iters=3000, ims_per_batch=8,
            reference_bs=8, grad_clip_norm=35.0, ema_decay=0.999,
        ),
        self_sup=SelfSupConfig(
            enabled=True,
            mask_lw=1.0, mask_loss_type="RW_BCE", mask_edge_reweight=True,
            perceptual_lw=0.15, ms_ssim_lw=1.0,
            # all 26 reference ssHB configs set LAB_LW=0.2
            lab_lw=0.2,
            pseudo_pm_lw=10.0,
            ema_teacher=True, ema_decay=0.999,
        ),
    )
