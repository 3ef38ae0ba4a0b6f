"""LR schedules as optax-compatible callables.

Parity target: lib/torch_utils/solver/lr_scheduler.py:148-266
(flat_and_anneal_lr_scheduler: warmup -> flat -> {cosine|step|poly|linear}
annealing starting at `anneal_point` of total iters) and WarmupMultiStepLR.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..config.base import SolverConfig


def flat_and_anneal(cfg: SolverConfig):
    """Returns f(step) -> lr multiplier * base_lr."""
    total = max(cfg.total_iters, 1)
    anneal_start = cfg.anneal_point * total
    warmup = cfg.warmup_iters

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        # warmup factor
        if cfg.warmup_method == "linear":
            alpha = jnp.clip(step / max(warmup, 1), 0.0, 1.0)
            wf = cfg.warmup_factor * (1 - alpha) + alpha
        elif cfg.warmup_method == "constant":
            wf = jnp.where(step < warmup, cfg.warmup_factor, 1.0)
        else:
            wf = jnp.asarray(1.0)
        # anneal factor
        rel = jnp.clip((step - anneal_start) / jnp.maximum(total - anneal_start, 1.0),
                       0.0, 1.0)
        if cfg.anneal_method == "cosine":
            af = 0.5 * (jnp.cos(rel * math.pi) + 1.0)
        elif cfg.anneal_method == "linear":
            af = 1.0 - rel
        elif cfg.anneal_method == "poly":
            af = (1.0 - rel) ** cfg.poly_power
        elif cfg.anneal_method == "step":
            af = jnp.asarray(1.0)
            for s in cfg.steps:
                af = af * jnp.where(step >= s * total, cfg.step_gamma, 1.0)
        else:
            af = jnp.asarray(1.0)
        af = jnp.where(step < anneal_start, 1.0, af) if cfg.anneal_method != "step" else af
        return cfg.base_lr * wf * af

    return sched


def warmup_multistep(cfg: SolverConfig):
    """WarmupMultiStepLR parity (lib/torch_utils/solver/lr_scheduler.py:105):
    linear warmup then gamma decay at each milestone (cfg.steps are relative
    positions of total_iters)."""
    total = max(cfg.total_iters, 1)
    milestones = [s * total for s in cfg.steps]

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / max(cfg.warmup_iters, 1), 0.0, 1.0)
        wf = cfg.warmup_factor * (1 - alpha) + alpha
        f = jnp.asarray(1.0)
        for m in milestones:
            f = f * jnp.where(step >= m, cfg.step_gamma, 1.0)
        return cfg.base_lr * wf * f

    return sched
