"""self6dpp_tpu — a TPU-native (JAX/XLA/Pallas) framework for self-supervised
monocular 6D object pose estimation, re-designed from scratch with the
capabilities of the Self6D++ stack (YOLOv4 detector, GDR-Net direct pose
regressor, DeepIM render-and-compare refiner, Stage-II self-supervised
mean-teacher training with a differentiable renderer).

Layout:
    config/    typed dataclass configuration system (no eval(), no mmcv)
    ops/       pure-functional compute ops: geometry, pose decoding/errors,
               differentiable rasterizer, chamfer, optical flow, SSIM, color
    models/    Flax models: GDRN (+variants), DeepIM/FlowNet, YOLOv4, LPIPS
    losses/    loss library (PM, coord, mask, region, self-supervised suite)
    data/      BOP-format dataset layer, ref metadata, augmentation, batching
    engine/    train/eval loops (jitted steps), evaluators, checkpointing
    parallel/  mesh construction + sharding rules (pjit/shard_map over ICI)
    utils/     logging, registries, misc
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("S6TPU_PLATFORM"):
    # Force the JAX platform (e.g. cpu for CLI smoke runs): env vars alone
    # are too late once sitecustomize registered a TPU plugin at interpreter
    # start, but config.update before the first backend use still works.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["S6TPU_PLATFORM"])
