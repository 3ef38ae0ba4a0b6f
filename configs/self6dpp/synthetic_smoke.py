"""Stage-II smoke config chained after configs/gdrn/synthetic_smoke.py."""

import dataclasses

from configs.gdrn.synthetic_smoke import get_config as base
from self6dpp_tpu.config.base import Config, SelfSupConfig, SolverConfig


def get_config() -> Config:
    b = base()
    return dataclasses.replace(
        b,
        exp_name="self6dpp_synthetic_smoke",
        solver=SolverConfig(optimizer="adam", base_lr=5e-5, total_iters=20,
                            warmup_iters=0, ims_per_batch=4, reference_bs=4),
        self_sup=SelfSupConfig(enabled=True, mask_lw=1.0, ms_ssim_lw=1.0,
                               perceptual_lw=0.1, pseudo_pm_lw=10.0),
        ckpt_period=20, log_period=5,
    )
