"""Stage-II smoke config chained after configs/gdrn/synthetic_smoke.py.

Exercises every stage-II subsystem: pose/geo mode alternation, TRAIN2
synthetic-supervised interleave, epoch-gated EMA teacher refresh, the
in-loop DeepIM refiner, and the RepjRefiner multi-view weak supervision."""

import dataclasses

from configs.gdrn.synthetic_smoke import get_config as base
from self6dpp_tpu.config.base import (Config, SelfSupConfig, SolverConfig)


def get_config() -> Config:
    b = base()
    return dataclasses.replace(
        b,
        exp_name="self6dpp_synthetic_smoke",
        solver=SolverConfig(optimizer="adam", base_lr=5e-5, total_iters=20,
                            warmup_iters=0, ims_per_batch=4, reference_bs=4),
        data=dataclasses.replace(
            b.data,
            train2_datasets=("synthetic",), train2_ratio=0.3),
        self_sup=SelfSupConfig(
            enabled=True, mask_lw=1.0, ms_ssim_lw=1.0,
            perceptual_lw=0.1, pseudo_pm_lw=10.0,
            geo_mode_ratio=0.3, teacher_update_freq=1,
            refine_with_deepim=True,
            refiner_config="configs/deepim/synthetic_refiner.py",
            repj_refine=True, repj_render_res=32),
        ckpt_period=20, log_period=5,
    )
