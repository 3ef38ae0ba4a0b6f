"""GDR-Net training/eval steps — the reference's do_train hot loop
(core/gdrn_modeling/engine/engine.py:204-520) as pure jitted functions.

One compiled graph per step: forward + loss + grads + nan_to_num + clip +
optimizer + EMA. Sharding: batch split over the mesh data axis, params
replicated (or fsdp-sharded); XLA inserts the gradient all-reduce that DDP
did explicitly in the reference (engine.py:419).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.base import Config
from ..losses.gdrn_loss import gdrn_loss
from ..models.gdrn import GDRN
from .optim import build_optimizer
from .train_state import TrainState, create_train_state, ema_decay_schedule

Array = jax.Array

BATCH_MODEL_KEYS = (
    "roi_img", "roi_cls", "roi_cam", "roi_center", "roi_wh", "roi_extent",
    "resize_ratio", "roi_coord_2d",
)


def model_inputs(batch: dict[str, Array]) -> tuple:
    return tuple(batch[k] for k in BATCH_MODEL_KEYS)


def build_gdrn(cfg: Config) -> GDRN:
    dtype = jnp.bfloat16 if cfg.dist.compute_dtype == "bfloat16" else jnp.float32
    return GDRN(cfg=cfg.model, dtype=dtype)


def init_state(cfg: Config, model: GDRN, batch: dict[str, Array],
               rng: Array | None = None, mesh: Mesh | None = None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    # jit the init: eager per-op dispatch is pathologically slow on remote
    # TPU backends (~100x), one compiled program is not
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, *model_inputs(batch), train=False)
    # flat-vector updates unless params are fsdp-sharded
    tx, _ = build_optimizer(cfg.solver,
                            flatten=cfg.dist.mesh_shape[-1] == 1)
    state = create_train_state(
        variables["params"], variables.get("batch_stats", {}), tx,
        with_ema=cfg.solver.ema_decay > 0)
    if mesh is not None:
        from ..parallel.mesh import shard_state
        state = shard_state(state, mesh, cfg.dist)
    return state


def make_train_step(cfg: Config, model: GDRN, donate: bool = True):
    decay_fn = ema_decay_schedule(cfg.solver.ema_decay, cfg.solver.ema_warmup_iters)

    def train_step(state: TrainState, batch: dict[str, Array], rng: Array):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, mutated = model.apply(
                variables, *model_inputs(batch), train=True,
                mutable=["batch_stats"] if state.batch_stats else [],
                rngs={"dropout": rng},
            )
            ld = gdrn_loss(
                cfg.model.loss, cfg.model.pnp_net, out, batch,
                num_regions=cfg.model.geo_head.num_regions,
                xyz_bin=cfg.model.geo_head.xyz_bin,
                mtl_log_vars=params.get("mtl") if cfg.model.use_mtl else None,
            )
            total = sum(jax.tree.leaves(ld))
            new_bs = mutated.get("batch_stats", state.batch_stats)
            return total, (ld, new_bs, out)

        (total, (ld, new_bs, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        state = state.update_ema(decay_fn)
        metrics = dict(ld)
        metrics["total_loss"] = total
        return state, metrics

    return train_step


def make_eval_step(cfg: Config, model: GDRN, use_ema: bool = False):
    def eval_step(state: TrainState, batch: dict[str, Array]):
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = model.apply(variables, *model_inputs(batch), train=False)
        return {"rot": out["rot"], "trans": out["trans"]}

    return eval_step


def jit_train_step(cfg: Config, model: GDRN, mesh: Mesh | None = None):
    step = make_train_step(cfg, model)
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(cfg.dist.data_axis))
    if mesh.shape.get(cfg.dist.fsdp_axis, 1) > 1:
        # params arrive fsdp-sharded from init_state/shard_state: leave the
        # state sharding unspecified so jit takes it from the committed
        # inputs and GSPMD propagates (all-gather before use,
        # reduce-scatter on the grads)
        return jax.jit(step, in_shardings=(None, data, repl),
                       donate_argnums=(0,))
    return jax.jit(
        step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def jit_eval_step(cfg: Config, model: GDRN, mesh: Mesh | None = None,
                  use_ema: bool = False):
    step = make_eval_step(cfg, model, use_ema=use_ema)
    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(cfg.dist.data_axis))
    if mesh.shape.get(cfg.dist.fsdp_axis, 1) > 1:
        return jax.jit(step, in_shardings=(None, data), out_shardings=data)
    return jax.jit(step, in_shardings=(repl, data), out_shardings=data)
