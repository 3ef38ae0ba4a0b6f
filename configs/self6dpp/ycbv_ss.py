"""Self6D++ Stage-II self-supervised config for YCB-V, mirroring
configs/self6dpp/ssYCBV (per-object self-supervision on real train images
with the same loss family as ssLM; reference expected metrics at
BASELINE.md §YCB-V)."""

import dataclasses

from configs.gdrn.ycbv_base import get_config as base_config
from configs.self6dpp.lm_ss import get_config as lm_ss_config
from self6dpp_tpu.config.base import Config


def get_config() -> Config:
    base = base_config()
    ss = lm_ss_config()                     # reuse the stage-II loss family
    return dataclasses.replace(
        base,
        exp_name="self6dpp_ycbv_ss",
        solver=ss.solver,
        self_sup=ss.self_sup,
    )
