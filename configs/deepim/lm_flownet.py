"""DeepIM FlowNet refiner config for LINEMOD, mirroring
configs/deepim/lmPbrSO/FlowNet512_1.5AugCosyAAEGray_Flat_lmPbr_SO
(512 zoom, lamb 1.5, 4 train/test iters, flow+mask+PM losses)."""

import dataclasses

from configs.gdrn.lm_base import get_config as base_config
from self6dpp_tpu.config.base import Config, DeepIMConfig, SolverConfig


def get_config() -> Config:
    base = base_config()
    return dataclasses.replace(
        base,
        exp_name="deepim_lm_flownet512",
        deepim=DeepIMConfig(
            num_classes=13, input_h=512, input_w=512, in_channels=6,
            flat_op="avg", rot_type="ego_rot6d", z_style="cosypose",
            n_iter_train=4, n_iter_test=4, zoom_lamb=1.5,
            pm_lw=10.0, flow_lw=0.1, mask_lw=1.0, trans_lw=1.0,
        ),
        solver=SolverConfig(
            optimizer="ranger", base_lr=1e-4, anneal_method="cosine",
            anneal_point=0.72, total_iters=80_000, ims_per_batch=8,
            reference_bs=8,
        ),
    )
