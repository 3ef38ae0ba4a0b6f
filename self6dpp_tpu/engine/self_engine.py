"""Self6D++ Stage-II self-supervised trainer — the flagship fused
render-and-compare step.

Parity target: core/self6dpp/engine/self_engine.py:212-760 +
self_engine_utils.py:951-1142. One jitted step contains: teacher forward
(EMA weights, stop-grad) -> pseudo labels; student forward; in-graph
differentiable render of the student pose; the 10-term self-loss suite;
backward through the rasterizer; optimizer; EMA teacher update. The
reference needs a python loop spanning two DDP models, a CUDA rasterizer
and three loss subprocesses — here it is a single XLA graph (the
BASELINE.json 'fused render-and-compare step' requirement).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config.base import Config
from ..losses.gdrn_loss import gdrn_loss
from ..losses.self_loss import compute_self_loss_pose
from ..models.gdrn import GDRN
from ..models.lpips import LPIPS
from ..ops.rasterizer import rasterize_batch
from ..ops.zoom import zoom_K
from .gdrn_engine import model_inputs
from .optim import build_optimizer
from .train_state import TrainState, create_train_state, ema_decay_schedule

Array = jax.Array


def roi_zoom_K(batch: dict[str, Array], input_res: int,
               pad_scale: float = 1.5) -> Array:
    """Zoomed intrinsics for the ROI frame (crop centered at roi_center with
    side roi_wh*pad_scale, resized to input_res)."""
    side = batch["roi_wh"][:, 0] * pad_scale
    x1 = batch["roi_center"][:, 0] - side / 2
    y1 = batch["roi_center"][:, 1] - side / 2
    boxes = jnp.stack([x1, y1, x1 + side, y1 + side], axis=1)
    return zoom_K(batch["roi_cam"], boxes, (input_res, input_res))


def render_student_pose(cfg: Config, batch: dict[str, Array], rot: Array,
                        trans: Array, soft_sigma: float = 1.5) -> dict[str, Array]:
    """Differentiable ROI-frame render of the predicted pose.

    batch mesh inputs: verts (C,V,3), faces (C,F,3), colors (C,V,3) per
    class, gathered by roi_cls.
    """
    s = cfg.model.input_res
    Kz = batch["roi_zoom_K"]
    cls = batch["roi_cls"]
    verts = batch["mesh_verts"][cls]
    faces = batch["mesh_faces"][cls]
    colors = batch["mesh_colors"][cls]
    impl = cfg.renderer.impl
    if impl == "auto":
        impl = "pallas" if jax.devices()[0].platform != "cpu" else "xla"
    out = rasterize_batch(
        verts, faces, colors, Kz, rot, trans, height=s, width=s,
        tile_px=cfg.renderer.tile_px,
        faces_per_tile=cfg.renderer.faces_per_tile,
        sigma_px=soft_sigma, impl=impl)
    return {"color": out.attr, "prob": out.prob, "mask": out.mask,
            "depth": out.depth}


def make_self_train_step(cfg: Config, model: GDRN, lpips: LPIPS | None = None):
    """Returns train_step(state, lpips_params, batch, rng) -> (state, metrics).

    The teacher = state.ema_params (mean teacher, ModelEMA parity).
    """
    ss = cfg.self_sup
    decay_fn = ema_decay_schedule(ss.ema_decay, cfg.solver.ema_warmup_iters)

    def lpips_fn_factory(lpips_params):
        if lpips is None or lpips_params is None:
            return None
        return lambda a, b: lpips.apply({"params": lpips_params}, a, b)

    def train_step(state: TrainState, lpips_params: Any,
                   batch: dict[str, Array], rng: Array):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            # student forward (pose branch; BN frozen in stage II —
            # reference FREEZE_BN, so train=False for stats)
            out = model.apply(variables, *model_inputs(batch), train=False,
                              rngs={"dropout": rng})

            # teacher forward -> pseudo geometry (no grad)
            tvars = {"params": state.ema_params}
            if state.batch_stats:
                tvars["batch_stats"] = state.batch_stats
            tout = jax.lax.stop_gradient(
                model.apply(tvars, *model_inputs(batch), train=False,
                            forward_mode="geo"))

            o = cfg.model.output_res
            s = cfg.model.input_res
            from ..losses.mask_losses import get_mask_prob
            t_vis_prob = get_mask_prob(tout["mask_logits"],
                                       cfg.model.loss.mask_loss_type)[..., 0]
            pseudo_vis_lr = (t_vis_prob > 0.5).astype(jnp.float32)
            # upsample pseudo mask to ROI res for the image-space losses
            pseudo_vis = jax.image.resize(pseudo_vis_lr, (pseudo_vis_lr.shape[0], s, s),
                                          "nearest")

            pseudo = {
                "vis_mask": pseudo_vis,
                "vis_mask_lr": pseudo_vis_lr,
                "coor": tout["coor"],
                "region": jax.nn.softmax(tout["region_logits"], axis=-1),
                # pseudo pose: loaded refined pose if provided, else teacher's
                "rot": batch.get("pseudo_rot", batch["gt_rot"]),
                "trans": batch.get("pseudo_trans", batch["gt_trans"]),
            }

            ren = render_student_pose(cfg, batch, out["rot"], out["trans"])
            ld = compute_self_loss_pose(
                ss, ren, out, pseudo, batch,
                lpips_fn=lpips_fn_factory(lpips_params))
            total = sum(jax.tree.leaves(ld))
            return total, ld

        (total, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.update_ema(decay_fn)
        metrics = dict(ld)
        metrics["total_loss"] = total
        return state, metrics

    return train_step


def make_self_geo_train_step(cfg: Config, model: GDRN):
    """Geo-mode step (self_engine_utils.py:52-127 'geo' branch): the student
    sees a perturbed copy of the ROI (device-side color jitter standing in
    for POSE_VARIATED_AUG, configs/self6dpp/new_cfg/base.py:34-50) and its
    dense geometry is trained toward the teacher's pseudo labels."""
    ss = cfg.self_sup
    decay_fn = ema_decay_schedule(ss.ema_decay, cfg.solver.ema_warmup_iters)

    def train_step(state: TrainState, batch: dict[str, Array], rng: Array):
        def loss_fn(params):
            r1, r2, r3 = jax.random.split(rng, 3)
            img = batch["roi_img"]
            aug = img * jax.random.uniform(r1, (img.shape[0], 1, 1, 1),
                                           minval=0.8, maxval=1.2)
            aug = aug + jax.random.uniform(r2, (img.shape[0], 1, 1, 3),
                                           minval=-0.05, maxval=0.05)
            aug = jnp.clip(aug + 0.02 * jax.random.normal(r3, img.shape), 0, 1)
            sb = dict(batch, roi_img=aug)

            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(variables, *model_inputs(sb), train=False,
                              forward_mode="geo", rngs={"dropout": rng})

            tvars = {"params": state.ema_params}
            if state.batch_stats:
                tvars["batch_stats"] = state.batch_stats
            tout = jax.lax.stop_gradient(
                model.apply(tvars, *model_inputs(batch), train=False,
                            forward_mode="geo"))
            from ..losses.mask_losses import get_mask_prob
            from ..losses.self_loss import compute_self_loss_geo
            t_prob = get_mask_prob(tout["mask_logits"],
                                   cfg.model.loss.mask_loss_type)[..., 0]
            pseudo = {
                "vis_mask_lr": (t_prob > 0.5).astype(jnp.float32),
                "coor": tout["coor"],
                "region": jax.nn.softmax(tout["region_logits"], axis=-1),
            }
            for k in ("vf", "norm"):
                if k in tout:
                    pseudo[k] = tout[k]
            ld = compute_self_loss_geo(
                ss, out, pseudo,
                mask_prob_fn=lambda lg: get_mask_prob(
                    lg, cfg.model.loss.mask_loss_type))
            return sum(jax.tree.leaves(ld)), ld

        (total, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads).update_ema(decay_fn)
        m = dict(ld)
        m["total_loss"] = total
        return state, m

    return train_step


def make_synsup_train_step(cfg: Config, model: GDRN):
    """TRAIN2 synthetic-supervised step interleaved with the self batches
    (self_engine.py:409-421 train_2_ratio)."""
    decay_fn = ema_decay_schedule(cfg.self_sup.ema_decay,
                                  cfg.solver.ema_warmup_iters)

    def train_step(state: TrainState, batch: dict[str, Array], rng: Array):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(variables, *model_inputs(batch), train=False,
                              rngs={"dropout": rng})
            ld = gdrn_loss(cfg.model.loss, cfg.model.pnp_net, out, batch,
                           num_regions=cfg.model.geo_head.num_regions,
                           xyz_bin=cfg.model.geo_head.xyz_bin)
            return sum(jax.tree.leaves(ld)), ld

        (total, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads).update_ema(decay_fn)
        m = dict(ld)
        m["total_loss"] = total
        return state, m

    return train_step
