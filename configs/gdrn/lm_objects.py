"""SISO per-object GDR-Net configs for LINEMOD.

Reference ships 13 near-identical config files, one per object
(configs/gdrn/lmPbrSingleObj/.../*_ape.py etc.). Here one module + an
override: select the object with
    --opts data.object_filter=ape exp_name=gdrn_lm_ape
"""

import dataclasses

from configs.gdrn.lm_base import get_config as base


def get_config():
    cfg = base()
    return dataclasses.replace(
        cfg, exp_name="gdrn_lm_siso",
        data=dataclasses.replace(cfg.data, object_filter=("ape",)))
