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
               output_res: int = 64) -> Array:
    """Zoomed intrinsics for the ROI frame.

    The loader crops a square of side ``scale = max(bw,bh)*pad_scale*jitter``
    (aug.py aug_bbox_dzi) and records ``resize_ratio = output_res/scale`` —
    derive the side exactly from that so the student-pose render frame stays
    aligned with roi_img under bh>bw boxes and DZI scale jitter."""
    side = output_res / batch["resize_ratio"]
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
    impl = cfg.renderer.impl
    if impl == "auto":
        impl = "pallas" if jax.devices()[0].platform != "cpu" else "xla"
    textured = "mesh_uv" in batch and "mesh_texture" in batch
    if textured:
        # textured models (ycbv stage-II; reference render_scene_tex,
        # renderer_dibr.py:196-292): rasterize per-vertex UVs, sample the
        # class atlas per pixel — both differentiable
        attrs = batch["mesh_uv"][cls]
    else:
        attrs = batch["mesh_colors"][cls]
    out = rasterize_batch(
        verts, faces, attrs, Kz, rot, trans, height=s, width=s,
        tile_px=cfg.renderer.tile_px,
        faces_per_tile=cfg.renderer.faces_per_tile,
        sigma_px=soft_sigma, impl=impl)
    if textured:
        from ..ops.zoom import _bilinear_sample
        tex = batch["mesh_texture"][cls]
        ht, wt = tex.shape[1], tex.shape[2]
        color = jax.vmap(lambda t, u, v: _bilinear_sample(
            t, u * (wt - 1), v * (ht - 1)))(
            tex, out.attr[..., 0], out.attr[..., 1])
        return {"color": color * out.mask[..., None], "prob": out.prob,
                "mask": out.mask, "depth": out.depth}
    return {"color": out.attr, "prob": out.prob, "mask": out.mask,
            "depth": out.depth}


def gated_ema_decay(base_decay: float, warmup_iters: int, every: int = 1):
    """EMA decay schedule gated to fire every `every` steps (reference
    updates the teacher every UPDATE_FREQ epochs, self_engine.py:674-682;
    decay 1.0 on off-steps leaves the teacher untouched)."""
    raw = ema_decay_schedule(base_decay, warmup_iters)
    if every <= 1:
        return raw
    return lambda step: jnp.where(step % every == 0, raw(step), 1.0)


def make_mode_picker(ss, rng_np):
    """Per-iteration 'pose'|'geo' mode choice (SelfSupConfig.mode_schedule).

    "random" reproduces the live reference step() — an independent draw at
    geo_mode_prob each batch (data_loader_self.py:742-748); "alternate" is a
    deterministic interleave at the same marginal ratio (the reference's
    commented-out __switch_output_mode, :728-740, generalized to any ratio:
    geo every round(1/ratio)-th iteration); "fix_pose"/"fix_geo" pin the
    mode ('fix' there). Returns next_mode() -> str.
    """
    import itertools
    sched = ss.mode_schedule
    ratio = ss.geo_mode_ratio
    if sched not in ("random", "alternate", "fix_pose", "fix_geo"):
        raise ValueError(f"unknown mode_schedule: {sched!r}")
    if sched == "fix_geo":
        return lambda: "geo"
    if sched == "fix_pose" or ratio <= 0:
        return lambda: "pose"
    if sched == "alternate":
        period = max(1, round(1.0 / ratio))
        counter = itertools.count(1)
        return lambda: "geo" if next(counter) % period == 0 else "pose"
    return lambda: "geo" if rng_np.random() < ratio else "pose"


def select_pseudo_pose(ss, batch: dict[str, Array],
                       tout: dict[str, Array]) -> tuple[Array, Array]:
    """Pseudo-pose source (batch_data_self_pose,
    self_engine_utils.py:1073-1140): the loaded refined/estimated pose when
    present, else the *teacher's* predicted pose — never ground truth."""
    if ss.pseudo_pose_type == "pose_refine" and "pseudo_rot" in batch:
        return batch["pseudo_rot"], batch["pseudo_trans"]
    if ss.pseudo_pose_type == "pose_est" and "pose_est_rot" in batch:
        return batch["pose_est_rot"], batch["pose_est_trans"]
    assert "rot" in tout, (
        "teacher must run a pose forward when no pseudo pose is loaded")
    return tout["rot"], tout["trans"]


def make_self_train_step(cfg: Config, model: GDRN, lpips: LPIPS | None = None,
                         refiner: tuple | None = None,
                         ema_update_every: int = 1,
                         split_lab: bool = False,
                         emit_render: bool = False):
    """Returns train_step(state, lpips_params, batch, rng[, refiner_vars,
    extra_grads]) -> (state, metrics), or with emit_render
    -> (state, metrics, (ren_color, pseudo_vis)).

    The teacher = state.ema_params (mean teacher, ModelEMA parity).
    refiner: optional (deepim_model, deepim_variables, refiner_cfg) — when
    cfg.self_sup.refine_with_deepim, the pseudo pose is refined in-graph by
    the DeepIM loop before the loss (the "++" of Self6D++; reference loads it
    at main_self6dpp.py:231-245 and refines offline via refiner_engine.py —
    here the refine loop fuses into the same XLA step). Refiner variables
    may be passed per-call as ``refiner_vars`` (the production path does, so
    they participate in jit sharding/donation like ``lpips_params``); the
    tuple's variables are the fallback.

    split_lab: drop the LAB chroma term from this graph; its gradient
    arrives pre-computed via ``extra_grads`` (see make_lab_grad_fn) and is
    summed into the parameter gradients before the optimizer.

    emit_render: additionally return the rendered student color and the
    teacher pseudo visibility mask (both stop-gradient) — lets consumers
    (TB image grids, diagnostics) reuse the step's own render instead of
    paying a second forward.
    """
    import dataclasses
    ss = cfg.self_sup
    ss_loss = dataclasses.replace(ss, lab_lw=0.0) if split_lab else ss
    decay_fn = gated_ema_decay(ss.ema_decay, cfg.solver.ema_warmup_iters,
                               ema_update_every)

    refine_fn = None
    default_rvars = None
    if ss.refine_with_deepim and refiner is not None:
        from .deepim_engine import make_refine_fn
        dmodel, default_rvars, dcfg = refiner
        refine_fn = make_refine_fn(dcfg, dmodel, dcfg.deepim.n_iter_test)

    def lpips_fn_factory(lpips_params):
        if lpips is None or lpips_params is None:
            return None
        return lambda a, b: lpips.apply({"params": lpips_params}, a, b)

    def train_step(state: TrainState, lpips_params: Any,
                   batch: dict[str, Array], rng: Array,
                   refiner_vars: Any = None, extra_grads: Any = None,
                   lab_linear: Any = None):
        rvars = refiner_vars if refiner_vars is not None else default_rvars
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            # student forward (pose branch; BN frozen in stage II —
            # reference FREEZE_BN, so train=False for stats)
            out = model.apply(variables, *model_inputs(batch), train=False,
                              rngs={"dropout": rng})

            # teacher forward -> pseudo geometry + pose (no grad; the
            # reference runs the teacher with forward_mode='pose',
            # self_engine_utils.py:1060-1066)
            tvars = {"params": state.ema_params}
            if state.batch_stats:
                tvars["batch_stats"] = state.batch_stats
            tout = jax.lax.stop_gradient(
                model.apply(tvars, *model_inputs(batch), train=False))

            s = cfg.model.input_res
            from ..losses.mask_losses import get_mask_prob
            t_vis_prob = get_mask_prob(tout["mask_logits"],
                                       cfg.model.loss.mask_loss_type)[..., 0]
            pseudo_vis_lr = (t_vis_prob > 0.5).astype(jnp.float32)
            # upsample pseudo mask to ROI res for the image-space losses
            pseudo_vis = jax.image.resize(pseudo_vis_lr, (pseudo_vis_lr.shape[0], s, s),
                                          "nearest")

            p_rot, p_trans = select_pseudo_pose(ss, batch, tout)
            if refine_fn is not None:
                # in-graph DeepIM refinement of the pseudo pose, in the ROI
                # frame (obs = roi_img with the zoomed intrinsics)
                ref_batch = {
                    "obs_img": batch["roi_img"],
                    "K": batch["roi_zoom_K"],
                    "verts": batch["mesh_verts"][batch["roi_cls"]],
                    "faces": batch["mesh_faces"][batch["roi_cls"]],
                    "colors": batch["mesh_colors"][batch["roi_cls"]],
                    "roi_cls": batch["roi_cls"],
                    "obs_mask": pseudo_vis,
                }
                p_rot, p_trans = refine_fn(rvars, ref_batch, p_rot, p_trans)
            p_rot = jax.lax.stop_gradient(p_rot)
            p_trans = jax.lax.stop_gradient(p_trans)

            pseudo = {
                "vis_mask": pseudo_vis,
                "vis_mask_lr": pseudo_vis_lr,
                "coor": tout["coor"],
                "region": jax.nn.softmax(tout["region_logits"], axis=-1),
                "rot": p_rot,
                "trans": p_trans,
            }

            o = cfg.model.output_res
            if ss.vf_lw > 0 and "vf" in out and "mesh_fps" in batch:
                # pseudo-RT vector field implied by the pseudo pose
                # (compute_vf_torch at self_engine_utils.py:603-636)
                from ..ops.geometry import compute_vf
                f = cfg.model.geo_head.num_vf_points
                cls = batch["roi_cls"]
                side = o / batch["resize_ratio"]
                vf_rt = compute_vf(batch["mesh_fps"][cls][:, :f],
                                   batch["roi_cam"], p_rot, p_trans,
                                   batch["roi_center"], side, o)
                # [vis 2f | full 2f] layout; the loss applies the vis mask
                pseudo["vf"] = jnp.concatenate([vf_rt, vf_rt], axis=-1)
            if ss.norm_lw > 0 and "norm" in out and "mesh_normals" in batch:
                # teacher-RT-rendered normal supervision
                # (self_engine_utils.py:640-680): render camera-frame normals
                # at the pseudo pose in the output-res crop frame
                cls = batch["roi_cls"]
                n_cam = jnp.einsum("bij,bvj->bvi", p_rot,
                                   batch["mesh_normals"][cls])
                ratio = o / cfg.model.input_res
                S = jnp.asarray([[ratio, 0, 0], [0, ratio, 0], [0, 0, 1.0]])
                Ko = jnp.einsum("ij,bjk->bik", S, batch["roi_zoom_K"])
                impl = cfg.renderer.impl
                if impl == "auto":
                    impl = ("pallas" if jax.devices()[0].platform != "cpu"
                            else "xla")
                renN = rasterize_batch(
                    batch["mesh_verts"][cls], batch["mesh_faces"][cls],
                    n_cam, Ko, p_rot, p_trans, height=o, width=o,
                    tile_px=min(cfg.renderer.tile_px, o),
                    faces_per_tile=cfg.renderer.faces_per_tile,
                    with_prob=False, impl=impl)
                nrm = renN.attr / jnp.maximum(
                    jnp.linalg.norm(renN.attr, axis=-1, keepdims=True), 1e-8)
                pseudo["norm"] = nrm * renN.mask[..., None]

            ren = render_student_pose(cfg, batch, out["rot"], out["trans"])
            ld = compute_self_loss_pose(
                ss_loss, ren, out, pseudo, batch,
                lpips_fn=lpips_fn_factory(lpips_params),
                lab_linear=lab_linear)

            if ss.repj_refine:
                # multi-view weak supervision (self_engine.py:549-569)
                from ..models.repj_refiner import repj_weak_loss
                vis_prob = get_mask_prob(
                    out["mask_logits"][..., :1],
                    cfg.model.loss.mask_loss_type)[..., 0]
                if out["mask_logits"].shape[-1] >= 2:
                    full_prob = get_mask_prob(
                        out["mask_logits"][..., 1:2],
                        cfg.model.loss.mask_loss_type)[..., 0]
                else:
                    full_prob = vis_prob
                cls = batch["roi_cls"]
                ld.update(repj_weak_loss(
                    out["rot"], out["trans"], vis_prob, full_prob,
                    batch["gt_rot"], batch["gt_trans"],
                    batch["mesh_verts"][cls], batch["mesh_faces"][cls],
                    batch["mesh_colors"][cls], batch["roi_cam"],
                    batch["gt_points"], batch["roi_extent"],
                    sym_rots=batch.get("sym_rots"),
                    sym_valid=batch.get("sym_valid"),
                    render_res=ss.repj_render_res,
                    full_hw=(cfg.renderer.height, cfg.renderer.width),
                    w_iou2d3d=ss.repj_iou2d3d_lw, w_pm=ss.repj_pm_lw,
                    w_miou=ss.repj_miou_lw, w_msssim=ss.repj_msssim_lw))

            total = sum(jax.tree.leaves(ld))
            aux = (jax.lax.stop_gradient(ren["color"]),
                   pseudo_vis) if emit_render else None
            return total, (ld, aux)

        (total, (ld, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if extra_grads is not None:
            grads = jax.tree.map(jnp.add, grads, extra_grads)
        state = state.apply_gradients(grads)
        state = state.update_ema(decay_fn)
        metrics = dict(ld)
        metrics["total_loss"] = total
        if emit_render:
            return state, metrics, aux
        return state, metrics

    return train_step


def make_lab_grad_fn(cfg: Config, model: GDRN):
    """Gradient of the LAB chroma term alone, meant to be jitted as its OWN
    XLA program: student pose forward -> in-graph render -> masked LAB L1 ->
    d(lab)/d(params). The term's reduction fragments the full stage-II graph
    (~10,500 tiny kernels, BENCH_NOTES.md "LAB loss compile pathology");
    compiling it separately keeps the main step fused and costs only a
    second small forward+render. The teacher runs a geo-mode forward (mask
    head only) to produce the pseudo visibility the loss is masked with —
    identical to the mask the main step derives (self_engine_utils.py:745-774
    masks the LAB crop with the pseudo visib mask).

    Returns lab_grad(params, batch_stats, ema_params, batch, rng) ->
    (lab_value, grads).
    """
    ss = cfg.self_sup
    from ..losses.mask_losses import get_mask_prob
    from ..ops.color import lab_loss

    def lab_value(params, batch_stats, ema_params, batch, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, *model_inputs(batch), train=False,
                          rngs={"dropout": rng})
        tvars = {"params": ema_params}
        if batch_stats:
            tvars["batch_stats"] = batch_stats
        tout = jax.lax.stop_gradient(
            model.apply(tvars, *model_inputs(batch), train=False,
                        forward_mode="geo"))
        t_prob = get_mask_prob(tout["mask_logits"],
                               cfg.model.loss.mask_loss_type)[..., 0]
        vis_lr = (t_prob > 0.5).astype(jnp.float32)
        s = cfg.model.input_res
        vis = jax.image.resize(vis_lr, (vis_lr.shape[0], s, s), "nearest")
        ren = render_student_pose(cfg, batch, out["rot"], out["trans"])
        ren_m = ren["color"] * vis[..., None]
        img_m = batch["roi_img"] * vis[..., None]
        return ss.lab_lw * lab_loss(ren_m, img_m, mask=vis, no_l=ss.lab_no_l)

    def lab_grad(params, batch_stats, ema_params, batch, rng):
        return jax.value_and_grad(lab_value)(params, batch_stats, ema_params,
                                             batch, rng)

    return lab_grad


def make_lab_fwd_fn(cfg: Config, model: GDRN):
    """Program 1 of lab_impl="pixel_split": a LAB-free forward that produces
    the rendered student color and the teacher pseudo visibility mask —
    byte-identical to what the main step recomputes internally (same params,
    same rng, train=False throughout, so the model is deterministic).

    Measured (bs=8, TPU): 1.06 ms standalone. Adding even the pixel-local
    LAB math to THIS program degrades it to 11.1 ms — the cliff triggers
    whenever LAB ops share a program with the model/render graph, which is
    why the LAB math lives in its own pixel-only program (make_lab_pixel_fn).
    CAVEAT: while each of the three programs is individually fast, the full
    per-step cycle currently measures ~50 ms on the tunneled TPU backend
    (vs ~40 ms for the in-graph direct term) — an inter-program overhead
    that is not yet attributed; see BENCH_NOTES.md.

    Returns fwd(params, batch_stats, ema_params, batch, rng) ->
    (ren_color (B,S,S,3), vis (B,S,S)).
    """
    from ..losses.mask_losses import get_mask_prob

    def fwd(params, batch_stats, ema_params, batch, rng):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, *model_inputs(batch), train=False,
                          rngs={"dropout": rng})
        tvars = {"params": ema_params}
        if batch_stats:
            tvars["batch_stats"] = batch_stats
        tout = model.apply(tvars, *model_inputs(batch), train=False,
                           forward_mode="geo")
        t_prob = get_mask_prob(tout["mask_logits"],
                               cfg.model.loss.mask_loss_type)[..., 0]
        vis_lr = (t_prob > 0.5).astype(jnp.float32)
        s = cfg.model.input_res
        vis = jax.image.resize(vis_lr, (vis_lr.shape[0], s, s), "nearest")
        ren = render_student_pose(cfg, batch, out["rot"], out["trans"])
        return ren["color"], vis

    return fwd


def make_lab_pixel_fn(cfg: Config):
    """Program 2 of lab_impl="pixel_split": pixel-local LAB value and its
    gradient w.r.t. the rendered color — no model, no render, so the LAB
    ops can't poison any model-bearing program. Measured 1.38 ms standalone
    (bs=8, mostly dispatch). The main step then consumes g through a linear
    term (make_self_train_step's ``lab_linear``), which is exact: the LAB
    parameter gradient flows only through the rendered color, and g is
    evaluated at the very color the step recomputes.

    Returns pix(ren_color, roi_img, vis) -> (lab_value, g).
    """
    ss = cfg.self_sup
    from ..ops.color import lab_loss

    def pix(ren_color, roi_img, vis):
        # differentiate w.r.t. the MASKED prediction: the main step re-enters
        # the gradient against its shared masked-color pair ren_m (an
        # existing consumer of the render output) — a raw-color linear term
        # would add a second unmasked consumer, which alone re-triggers the
        # cliff ("raw-color variant measured 47 ms/step", losses/self_loss.py)
        ren_m = ren_color * vis[..., None]
        img_m = roi_img * vis[..., None]

        def f(rm):
            return ss.lab_lw * lab_loss(rm, img_m, mask=vis,
                                        no_l=ss.lab_no_l)
        return jax.value_and_grad(f)(ren_m)

    return pix


def make_self_geo_train_step(cfg: Config, model: GDRN,
                             ema_update_every: int = 1):
    """Geo-mode step (self_engine_utils.py:52-127 'geo' branch): the student
    sees a pose-variated copy of the ROI — a shared per-image affine warp
    (POSE_VARIATED_AUG, configs/self6dpp/new_cfg/base.py:34-50 + color
    jitter) — and its dense geometry is trained toward the teacher's pseudo
    labels warped with the SAME affine (the reference applies one
    deterministic imgaug augmenter to both, data_loader_self.py:493-520,
    self_engine_utils.py:343-380; here both warps fuse into the step)."""
    ss = cfg.self_sup
    decay_fn = gated_ema_decay(ss.ema_decay, cfg.solver.ema_warmup_iters,
                               ema_update_every)

    def train_step(state: TrainState, batch: dict[str, Array], rng: Array):
        def loss_fn(params):
            from ..ops.warp import affine_warp, sample_pose_variated_affines
            r1, r2, r3, r4 = jax.random.split(rng, 4)
            img = batch["roi_img"]
            mats = sample_pose_variated_affines(
                r4, img.shape[0], rot_deg=ss.geo_aug_rot_deg,
                zoom=ss.geo_aug_zoom, trans=ss.geo_aug_trans,
                crop_percent=ss.geo_aug_crop)
            aug = affine_warp(img, mats)
            aug = aug * jax.random.uniform(r1, (img.shape[0], 1, 1, 1),
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
            # teacher pseudo maps, warped like the student's input (the same
            # normalized matrices apply at output res)
            warp = lambda x, m="bilinear": affine_warp(
                x if x.ndim == 4 else x[..., None], mats, mode=m)
            pseudo = {
                "vis_mask_lr": (warp(t_prob)[..., 0] > 0.5).astype(jnp.float32),
                "coor": warp(tout["coor"]),
                "region": warp(jax.nn.softmax(tout["region_logits"], axis=-1)),
            }
            for k in ("vf", "norm"):
                if k in tout:
                    pseudo[k] = warp(tout[k])
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


def jit_self_train_step(cfg: Config, model: GDRN, lpips: LPIPS | None = None,
                        refiner: tuple | None = None,
                        ema_update_every: int = 1, mesh=None):
    """Mesh-aware jit of the pose-mode step (state, lpips_params, batch, rng).

    Refiner variables ride the jit call explicitly (not the closure) so they
    get the same sharding/donation treatment as lpips_params. The LAB term
    is compiled per cfg.self_sup.lab_impl (see SelfSupConfig): the
    "pixel_split" mode runs a LAB-free forward program and a pixel-only
    LAB program whose (value, d(lab)/d(color)) feed the main step's
    ``lab_linear`` input — keeping every model-bearing program fused,
    though the 3-program cycle currently pays an unattributed
    inter-program overhead (BENCH_NOTES.md "LAB loss compile
    pathology")."""
    ss = cfg.self_sup
    impl = ss.lab_impl if ss.lab_lw > 0 else "direct"
    if impl not in ("pixel_split", "split_grad", "surrogate", "direct",
                    "pallas"):
        raise ValueError(f"unknown lab_impl: {impl!r}")
    step = make_self_train_step(cfg, model, lpips, refiner=refiner,
                                ema_update_every=ema_update_every,
                                split_lab=impl in ("pixel_split",
                                                   "split_grad"))
    rvars = refiner[1] if (ss.refine_with_deepim and refiner is not None) \
        else None
    if mesh is None:
        jstep = jax.jit(step, donate_argnums=(0,))
        data = repl = None
    else:
        from ..parallel.mesh import step_shardings
        st, data, repl = step_shardings(mesh, cfg.dist)
        # batch sharding is INFERRED from the committed arrays (shard_batch
        # data-shards batch-major leaves and replicates the per-class mesh
        # tables — a blanket 'data' spec here would wrongly force the C-major
        # tables onto the data axis). lab_linear: inferred from the side
        # programs' outputs; None also matches the arg being absent in the
        # non-pixel_split modes.
        jstep = jax.jit(
            step,
            in_shardings=(st, repl, None, repl, repl, st, None),
            donate_argnums=(0,))
    if impl in ("direct", "surrogate", "pallas"):
        return lambda state, lp, batch, rng: jstep(state, lp, batch, rng,
                                                   rvars, None, None)
    if impl == "pixel_split":
        # side programs' inputs are already committed/sharded (state from
        # init_state/shard_state, batch from shard_batch) — jit infers
        jfwd = jax.jit(make_lab_fwd_fn(cfg, model))
        jpix = jax.jit(make_lab_pixel_fn(cfg))

        def combined(state: TrainState, lpips_params: Any,
                     batch: dict[str, Array], rng: Array):
            # enqueue the side programs FIRST: the main step donates the
            # state buffers, and single-device programs run in enqueue order
            ren_color, vis = jfwd(state.params, state.batch_stats,
                                  state.ema_params, batch, rng)
            lab_val, lab_g = jpix(ren_color, batch["roi_img"], vis)
            return jstep(state, lpips_params, batch, rng, rvars, None,
                         (lab_val, lab_g))

        return combined

    # impl == "split_grad": LAB's d/d(params) in its own program, summed
    # into the main step's gradients. Kept for comparison; measured SLOWER
    # than in-graph (the cliff follows the term into its own program and
    # the ~300-leaf grad handoff adds dispatch cost).
    jlab = jax.jit(make_lab_grad_fn(cfg, model))

    def combined(state: TrainState, lpips_params: Any,
                 batch: dict[str, Array], rng: Array):
        lab_val, lab_grads = jlab(state.params, state.batch_stats,
                                  state.ema_params, batch, rng)
        state, metrics = jstep(state, lpips_params, batch, rng, rvars,
                               lab_grads, None)
        metrics["loss_color_ab_obj"] = lab_val
        metrics["total_loss"] = metrics["total_loss"] + lab_val
        return state, metrics

    return combined


def jit_self_geo_train_step(cfg: Config, model: GDRN,
                            ema_update_every: int = 1, mesh=None):
    step = make_self_geo_train_step(cfg, model,
                                    ema_update_every=ema_update_every)
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    from ..parallel.mesh import step_shardings
    st, data, repl = step_shardings(mesh, cfg.dist)
    # batch shardings inferred from the committed arrays (see
    # jit_self_train_step: mesh tables are replicated, not data-sharded)
    return jax.jit(step, in_shardings=(st, None, repl), donate_argnums=(0,))


def jit_synsup_train_step(cfg: Config, model: GDRN,
                          ema_update_every: int = 1, mesh=None):
    step = make_synsup_train_step(cfg, model,
                                  ema_update_every=ema_update_every)
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    from ..parallel.mesh import step_shardings
    st, data, repl = step_shardings(mesh, cfg.dist)
    # batch shardings inferred from the committed arrays (see
    # jit_self_train_step: mesh tables are replicated, not data-sharded)
    return jax.jit(step, in_shardings=(st, None, repl), donate_argnums=(0,))


def make_synsup_train_step(cfg: Config, model: GDRN,
                           ema_update_every: int = 1):
    """TRAIN2 synthetic-supervised step interleaved with the self batches
    (self_engine.py:409-421 train_2_ratio)."""
    decay_fn = gated_ema_decay(cfg.self_sup.ema_decay,
                               cfg.solver.ema_warmup_iters, ema_update_every)

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
