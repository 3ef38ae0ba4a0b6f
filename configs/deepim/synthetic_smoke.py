"""DeepIM smoke config on the synthetic BOP dataset."""

import dataclasses

from configs.gdrn.synthetic_smoke import get_config as base
from self6dpp_tpu.config.base import Config, DeepIMConfig, SolverConfig


def get_config() -> Config:
    b = base()
    return dataclasses.replace(
        b,
        exp_name="deepim_synthetic_smoke",
        deepim=DeepIMConfig(num_classes=2, input_h=64, input_w=64,
                            pose_feat_dim=32, n_iter_train=2, n_iter_test=2,
                            flow_lw=0.1, mask_lw=1.0, pm_lw=10.0),
        solver=SolverConfig(optimizer="adam", base_lr=1e-4, total_iters=15,
                            warmup_iters=0, ims_per_batch=4, reference_bs=4),
        ckpt_period=15, log_period=5,
    )
