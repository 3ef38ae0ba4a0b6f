"""Tiny DeepIM refiner config for the in-loop stage-II refinement smoke
(self_sup.refine_with_deepim; reference refiner_cfg_path,
core/self6dpp/main_self6dpp.py:231-245)."""

from self6dpp_tpu.config.base import Config, DeepIMConfig, RendererConfig


def get_config() -> Config:
    return Config(
        exp_name="deepim_synthetic_refiner",
        output_dir="/tmp/smoke_out",
        deepim=DeepIMConfig(
            num_classes=2, input_h=64, input_w=64, in_channels=8,
            n_iter_train=2, n_iter_test=2, with_flow=False, flow_lw=0.0,
            with_mask_head=False),
        renderer=RendererConfig(tile_px=16, faces_per_tile=64),
    )
