"""DeepIM refine loop + train/eval steps — all in one XLA graph.

The reference alternates python-side EGL renders and model forwards per
refine iteration (core/deepim/engine/engine.py:275-365, batching.py:82-232).
Here the whole loop is a lax.scan whose body renders with the in-graph
rasterizer, zooms obs/ren crops, runs the network, and updates the pose —
no host round-trips, compiled once. Pose estimates are stop_gradient-ed
between iterations (parity with engine.py:350's .detach()).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.base import Config, DeepIMConfig
from ..models.deepim import DeepIM, deepim_loss
from ..ops.flow import flow_from_depth, relative_pose_KT
from ..ops.rasterizer import rasterize_batch
from ..ops.zoom import (bboxes_from_pose, centers_2d_from_pose, crop_resize,
                        deepim_boxes, zoom_K)
from .optim import build_optimizer
from .train_state import TrainState, create_train_state, ema_decay_schedule

Array = jax.Array


def build_deepim(cfg: Config) -> DeepIM:
    dtype = jnp.bfloat16 if cfg.dist.compute_dtype == "bfloat16" else jnp.float32
    return DeepIM(cfg=cfg.deepim, dtype=dtype)


def _render_inputs(cfg: DeepIMConfig, batch: dict[str, Array], rot: Array,
                   trans: Array, raster_kw: dict) -> tuple[Array, Array, Array, Any]:
    """One refine iteration's rendering + zooming.

    batch: obs_img (B,Hf,Wf,3), obs_box (B,4), K (B,3,3),
           verts (B,V,3)|(V,3), faces (F,3)|(B,F,3), colors like verts.
    Returns (x (B,h,w,6), K_zoom, crop_boxes, ren RasterOut).
    """
    h, w = cfg.input_h, cfg.input_w
    K = batch["K"]
    verts = batch["verts"]
    v_b = verts if verts.ndim == 3 else jnp.broadcast_to(
        verts, (rot.shape[0],) + verts.shape)
    ren_boxes = bboxes_from_pose(v_b, K, rot, trans)
    centers = centers_2d_from_pose(K, rot, trans)
    crop_boxes, _ = deepim_boxes(ren_boxes, centers,
                                 obs_boxes=batch.get("obs_box"),
                                 lamb=cfg.zoom_lamb, out_hw=(h, w))
    Kz = zoom_K(K, crop_boxes, (h, w))
    ren = rasterize_batch(verts, batch["faces"], batch["colors"], Kz, rot,
                          trans, height=h, width=w, **raster_kw)
    obs = crop_resize(batch["obs_img"], crop_boxes, h, w)
    x = jnp.concatenate([ren.attr[..., :3], obs], axis=-1)
    if cfg.in_channels == 8:
        obs_mask = crop_resize(batch["obs_mask"][..., None], crop_boxes, h, w)
        x = jnp.concatenate([x, ren.mask[..., None], obs_mask], axis=-1)
    return x, Kz, crop_boxes, ren


def make_refine_fn(cfg: Config, model: DeepIM, n_iter: int,
                   with_loss: bool = False, raster_kw: dict | None = None):
    """Returns refine(variables, batch, init_rot, init_trans[, rng]) ->
    (rot, trans[, loss_dict]) with the n_iter loop scanned in-graph."""
    dcfg = cfg.deepim
    impl = cfg.renderer.impl
    if impl == "auto":
        impl = "pallas" if jax.devices()[0].platform != "cpu" else "xla"
    rkw = dict(tile_px=cfg.renderer.tile_px,
               faces_per_tile=cfg.renderer.faces_per_tile,
               sigma_px=1.0, with_prob=False,  # DeepIM needs hard renders only
               impl=impl)
    if raster_kw:
        rkw.update(raster_kw)

    def one_iter(variables, batch, rot, trans, train):
        x, Kz, crop_boxes, ren = _render_inputs(dcfg, batch, rot, trans, rkw)
        out = model.apply(variables, x, rot, trans, Kz,
                          obj_class=batch.get("roi_cls"), train=train)
        aux = {}
        if with_loss:
            if dcfg.flow_lw > 0 and dcfg.with_flow:
                # GT flow: rendered est-pose depth -> gt-pose depth, both in
                # the zoomed frame (csrc/flow parity, batching.py:193-198)
                gt_ren = rasterize_batch(
                    batch["verts"], batch["faces"], batch["colors"], Kz,
                    batch["gt_rot"], batch["gt_trans"],
                    height=dcfg.input_h, width=dcfg.input_w, **rkw)
                KT, Kinv = relative_pose_KT(Kz, rot, trans,
                                            batch["gt_rot"], batch["gt_trans"])
                gt_flow, gt_valid = flow_from_depth(ren.depth, gt_ren.depth,
                                                    KT, Kinv)
                lb = dict(batch, gt_flow=gt_flow, gt_flow_valid=gt_valid,
                          gt_mask_visib=gt_ren.mask)
            else:
                lb = batch
            aux = deepim_loss(dcfg, out, lb)
        return out["rot"], out["trans"], aux

    def refine(variables, batch, init_rot, init_trans, train: bool = False):
        def body(carry, _):
            rot, trans = carry
            new_rot, new_trans, aux = one_iter(variables, batch, rot, trans, train)
            loss_sum = sum(jax.tree.leaves(aux)) if aux else jnp.asarray(0.0)
            # detach pose between iterations (reference engine.py:350)
            return ((jax.lax.stop_gradient(new_rot),
                     jax.lax.stop_gradient(new_trans)),
                    (loss_sum, new_rot, new_trans))

        (rot, trans), (losses, rots, transes) = jax.lax.scan(
            body, (init_rot, init_trans), None, length=n_iter)
        if with_loss:
            return rot, trans, losses.sum() / n_iter
        return rot, trans

    return refine


def make_train_step(cfg: Config, model: DeepIM, n_iter: int | None = None):
    """n_iter overrides cfg.deepim.n_iter_train (the warmup ramp builds one
    jitted step per refine count; engine.py:275-294 N_ITER_TRAIN_WARM_EPOCH)."""
    n_iter = cfg.deepim.n_iter_train if n_iter is None else n_iter
    refine = make_refine_fn(cfg, model, n_iter, with_loss=True)
    decay_fn = ema_decay_schedule(cfg.solver.ema_decay, cfg.solver.ema_warmup_iters)

    def train_step(state: TrainState, batch: dict[str, Array], rng: Array):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            _, _, loss = refine(variables, batch, batch["init_rot"],
                                batch["init_trans"], train=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads).update_ema(decay_fn)
        return state, {"total_loss": loss}

    return train_step


def make_eval_step(cfg: Config, model: DeepIM):
    refine = make_refine_fn(cfg, model, cfg.deepim.n_iter_test, with_loss=False)

    def eval_step(state: TrainState, batch: dict[str, Array]):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        rot, trans = refine(variables, batch, batch["init_rot"],
                            batch["init_trans"], train=False)
        return {"rot": rot, "trans": trans}

    return eval_step


def init_state(cfg: Config, model: DeepIM, batch: dict[str, Array],
               rng: Array | None = None, mesh: Mesh | None = None) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    dcfg = cfg.deepim
    x = jnp.zeros((batch["init_rot"].shape[0], dcfg.input_h, dcfg.input_w,
                   dcfg.in_channels))
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, x, batch["init_rot"], batch["init_trans"], batch["K"],
        train=False)
    # flat-vector updates unless params are fsdp-sharded
    tx, _ = build_optimizer(cfg.solver,
                            flatten=cfg.dist.mesh_shape[-1] == 1)
    state = create_train_state(variables["params"],
                               variables.get("batch_stats", {}), tx,
                               with_ema=cfg.solver.ema_decay > 0)
    if mesh is not None:
        from ..parallel.mesh import shard_state
        state = shard_state(state, mesh, cfg.dist)
    return state


def jit_train_step(cfg: Config, model: DeepIM, mesh: Mesh | None = None,
                   n_iter: int | None = None):
    step = make_train_step(cfg, model, n_iter=n_iter)
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    from ..parallel.mesh import step_shardings
    st, data, repl = step_shardings(mesh, cfg.dist)
    return jax.jit(step, in_shardings=(st, data, repl), donate_argnums=(0,))


def warm_n_iter(dcfg: DeepIMConfig, iteration: int) -> int:
    """Refine-count warmup ramp (engine.py:275-294): 1 -> n_iter_train over
    the first n_iter_train_warm_iters iterations."""
    n = max(1, dcfg.n_iter_train)
    if dcfg.n_iter_train_warm_iters <= 0:
        return n
    return min(n, max(1, int(n * (iteration + 1)
                             / dcfg.n_iter_train_warm_iters)))


def jit_eval_step(cfg: Config, model: DeepIM, mesh: Mesh | None = None):
    step = make_eval_step(cfg, model)
    if mesh is None:
        return jax.jit(step)
    from ..parallel.mesh import step_shardings
    st, data, _ = step_shardings(mesh, cfg.dist)
    return jax.jit(step, in_shardings=(st, data), out_shardings=data)
