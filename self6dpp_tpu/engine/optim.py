"""Optimizer factory (optax), covering the reference's solver registry.

Parity target: core/utils/solver_utils.py:28-59 registers Ranger (stage-II
default), AdaBelief, MADGRAD, AdamP/SGDP, SGD_GC, Lookahead, RAdam — here
mapped onto optax primitives (ranger = lookahead(radam), sgd_gc = gradient
centralization transform + sgd). The grad pipeline also reproduces the
reference engine's nan_to_num + clip_grad_norm (engine.py:421-435).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..config.base import SolverConfig
from .schedule import flat_and_anneal


def _gradient_centralization() -> optax.GradientTransformation:
    """GC (Yong et al. 2020): subtract per-filter mean from conv/dense grads."""

    def update_fn(updates, state, params=None):
        def gc(g):
            if g.ndim > 1:
                axes = tuple(range(g.ndim - 1))
                return g - g.mean(axis=axes, keepdims=True)
            return g
        return jax.tree.map(gc, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def _nan_to_num() -> optax.GradientTransformation:
    """Reference engine.py:423-431: nan_to_num every gradient before stepping."""

    def update_fn(updates, state, params=None):
        return jax.tree.map(jnp.nan_to_num, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def _lookahead_wrap(inner: optax.GradientTransformation, sync_period: int = 6,
                    slow_step_size: float = 0.5) -> optax.GradientTransformation:
    """Lookahead (Zhang et al. 2019) as a plain transformation wrapper.

    Unlike optax.lookahead, no LookaheadParams wrapper is needed: the slow
    weights live in the optimizer state, and at every sync step the emitted
    update teleports the (fast) params onto the interpolated slow weights.
    """

    def init_fn(params):
        return {"inner": inner.init(params),
                "slow": jax.tree.map(lambda x: jnp.array(x, copy=True), params),
                "count": jnp.zeros([], jnp.int32)}

    def update_fn(updates, state, params):
        inner_updates, inner_state = inner.update(updates, state["inner"], params)
        count = state["count"] + 1
        sync = (count % sync_period) == 0

        fast_new = jax.tree.map(lambda p, u: p + u, params, inner_updates)
        slow_new = jax.tree.map(
            lambda s, f: s + slow_step_size * (f - s), state["slow"], fast_new)

        def pick(s_new, s_old, f_new, p):
            upd_sync = s_new - p
            upd_norm = f_new - p
            return jnp.where(sync, upd_sync, upd_norm)

        out_updates = jax.tree.map(pick, slow_new, state["slow"], fast_new, params)
        out_slow = jax.tree.map(
            lambda s_new, s_old: jnp.where(sync, s_new, s_old),
            slow_new, state["slow"])
        return out_updates, {"inner": inner_state, "slow": out_slow, "count": count}

    return optax.GradientTransformation(init_fn, update_fn)


def _madgrad(lr_sched, momentum: float = 0.9,
             eps: float = 1e-6) -> optax.GradientTransformation:
    """MADGRAD (Defazio & Jelassi 2021) — dual-averaged adaptive method
    (reference registers it from lib/torch_utils/solver/, solver_utils.py:28-59).

    s_k += λ_k g ; ν_k += λ_k g² with λ_k = lr·sqrt(k+1);
    z = x₀ - s / (ν^{1/3} + eps); x ← (1-c)x + c·z.
    """

    def init_fn(params):
        z = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        s = jax.tree.map(jnp.zeros_like, params)
        v = jax.tree.map(jnp.zeros_like, params)
        return {"x0": z, "s": s, "v": v, "count": jnp.zeros([], jnp.int32)}

    def update_fn(grads, state, params):
        k = state["count"]
        lam = lr_sched(k) * jnp.sqrt(k.astype(jnp.float32) + 1.0)
        s = jax.tree.map(lambda a, g: a + lam * g, state["s"], grads)
        v = jax.tree.map(lambda a, g: a + lam * g * g, state["v"], grads)
        z = jax.tree.map(
            lambda x0, ss, vv: x0 - ss / (jnp.cbrt(jnp.maximum(vv, 0.0)) + eps),
            state["x0"], s, v)
        new_x = jax.tree.map(lambda x, zz: (1 - momentum) * zz + momentum * x,
                             params, z)
        updates = jax.tree.map(lambda nx, x: nx - x, new_x, params)
        return updates, {"x0": state["x0"], "s": s, "v": v, "count": k + 1}

    return optax.GradientTransformation(init_fn, update_fn)


def _adamp_projection(delta: float = 0.1, wd_ratio: float = 0.1,
                      eps: float = 1e-8) -> optax.GradientTransformation:
    """AdamP/SGDP update projection (lib/torch_utils/solver/adamp.py:48-62,
    sgdp.py — NAVER AdamP): for scale-invariant weights (gradient nearly
    orthogonal to the weight under a channel- or layer-flattened view), the
    radial component of the update is removed, suppressing effective-LR
    growth from weight-norm inflation. Runs after the core optimizer on the
    final per-leaf deltas; branchless (both projections computed, selected
    with where) so the whole thing stays one fused elementwise pass."""

    def project(p, u):
        if p.ndim == 0:
            return u

        def view(x, channel):
            return x.reshape(x.shape[0], -1) if channel else x.reshape(1, -1)

        def cos_max(channel):
            g2 = view(u, channel)
            p2 = view(p, channel)
            num = jnp.abs((g2 * p2).sum(-1))
            den = jnp.linalg.norm(g2, axis=-1) * jnp.linalg.norm(p2, axis=-1)
            return (num / jnp.maximum(den, eps)).max(), p2.shape[1]

        def projected(channel):
            p2 = view(p, channel)
            n = p2 / (jnp.linalg.norm(p2, axis=-1, keepdims=True) + eps)
            u2 = view(u, channel)
            out = u2 - n * (n * u2).sum(-1, keepdims=True)
            return out.reshape(u.shape)

        c_cos, c_cols = cos_max(True)
        l_cos, l_cols = cos_max(False)
        use_c = c_cos < delta / jnp.sqrt(float(c_cols))
        use_l = l_cos < delta / jnp.sqrt(float(l_cols))
        return jnp.where(use_c, projected(True),
                         jnp.where(use_l, projected(False), u))

    def update_fn(updates, state, params=None):
        assert params is not None, "adamp projection needs params"
        return jax.tree.map(project, params, updates), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(),
                                        update_fn)


def build_optimizer(cfg: SolverConfig,
                    flatten: bool = True) -> tuple[optax.GradientTransformation, Callable]:
    """Returns (tx, lr_schedule). Gradient accumulation to reference_bs is
    applied via optax.MultiSteps (reference main_gdrn.py:87-121).

    flatten=False keeps the per-leaf update — required when params are
    fsdp-sharded (a flat concat vector would force an all-gather per step);
    engines pass flatten=(fsdp == 1)."""
    if cfg.lr_sched == "flat_and_anneal":
        sched = flat_and_anneal(cfg)
    elif cfg.lr_sched == "warmup_multistep":
        from .schedule import warmup_multistep
        sched = warmup_multistep(cfg)
    else:
        sched = lambda step: cfg.base_lr

    name = cfg.optimizer.lower()
    if name == "ranger":
        core = _lookahead_wrap(optax.radam(sched), sync_period=6, slow_step_size=0.5)
    elif name == "radam":
        core = optax.radam(sched)
    elif name == "adam":
        core = optax.adam(sched)
    elif name == "adamw":
        core = optax.adamw(sched, weight_decay=cfg.weight_decay)
    elif name == "adabelief":
        core = optax.adabelief(sched)
    elif name == "sgd":
        core = optax.sgd(sched, momentum=cfg.momentum)
    elif name == "sgd_gc":
        core = optax.chain(_gradient_centralization(), optax.sgd(sched, momentum=cfg.momentum))
    elif name == "madgrad":
        core = _madgrad(sched, momentum=cfg.momentum)
    elif name == "adamp":
        core = optax.chain(optax.adam(sched), _adamp_projection())
    elif name == "sgdp":
        core = optax.chain(optax.sgd(sched, momentum=cfg.momentum,
                                     nesterov=True), _adamp_projection())
    else:
        raise ValueError(f"unknown optimizer: {cfg.optimizer}")

    chain = [_nan_to_num()]
    if cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    if cfg.weight_decay > 0 and name not in ("adamw",):
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(core)
    tx = optax.chain(*chain)
    if flatten and name not in ("sgd_gc", "adamp", "sgdp"):
        # run the whole elementwise update on ONE flat vector: a ~300-leaf
        # tree costs ~5-15 ms/step in per-fusion launch overhead on TPU
        # (measured: ranger 22.9 -> 5.0 ms flat); GC and the AdamP/SGDP
        # projection need per-filter shapes so those stay per-leaf
        tx = optax.flatten(tx)

    accum = max(cfg.reference_bs // max(cfg.ims_per_batch, 1), 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, sched


def is_lookahead(cfg: SolverConfig) -> bool:
    return cfg.optimizer.lower() == "ranger"
