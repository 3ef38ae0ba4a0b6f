"""Stage-II self-supervised render-and-compare loss suite (pure functions).

Parity target: core/self6dpp/engine/self_engine_utils.py:382-948
(compute_self_loss_pose): rendered-mask RW_BCE/dice with edge reweighting,
LPIPS perceptual, MS-SSIM, LAB chroma L1, depth-backprojection chamfer,
xyz/region init-pred, pseudo-pose PM + trans; edge weights from
core/utils/edge_utils.py:263-286; VF/normal losses from
core/self6dpp/losses/vf_norm_loss.py.

TPU-first restructuring: the reference renders the full 480x640 image with
DIB-R then ROI-crops each loss input (self_engine_utils.py:424-447, 692-696).
Here rendering happens directly in the ROI frame with the zoomed K — one
256² render replaces a VGA render + N crops, keeping the whole loss graph
small and fused.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..config.base import SelfSupConfig
from ..ops.chamfer import chamfer_loss
from ..ops.color import lab_loss, lab_loss_surrogate
from ..ops.geometry import backproject_depth
from ..ops.ssim import ms_ssim
from .mask_losses import soft_dice_loss, weighted_ex_loss_probs
from .pm_loss import pm_loss

Array = jax.Array


@jax.custom_vjp
def inject_grad(x: Array, g: Array) -> Array:
    """Identity on ``x`` that adds ``g`` to x's cotangent in the backward.

    Used by lab_impl="pixel_split": the LAB term's image-space gradient
    (computed in its own pixel-only program) enters the step's backward as
    one fusable elementwise add on the existing render cotangent — no new
    loss reduction, no LAB ops, nothing for the TPU fusion pass to trip on
    (every reduction-shaped re-entry measured 40 ms vs 3.7 ms without;
    BENCH_NOTES.md "LAB loss compile pathology")."""
    return x


def _inject_grad_fwd(x, g):
    return x, g


def _inject_grad_bwd(g, ct):
    return (ct + g, None)


inject_grad.defvjp(_inject_grad_fwd, _inject_grad_bwd)


def _maxpool(x: Array, k: int) -> Array:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, k, k), (1, 1, 1), "SAME")


def mask_dilate(mask: Array, k: int) -> Array:
    """(B, H, W) binary dilate via max pool."""
    return _maxpool(mask, k)


def mask_erode(mask: Array, k: int) -> Array:
    return 1.0 - _maxpool(1.0 - mask, k)


def compute_mask_edge_weights(mask: Array, dilate_ks: int = 11,
                              erode_ks: int = 11, w_edge: float = 5.0,
                              edge_lower: bool = True) -> Array:
    """Contour-loss style edge weights (edge_utils.py:263-286). mask (B,H,W)."""
    edge = mask_dilate(mask, dilate_ks) - mask_erode(mask, erode_ks)
    g = jnp.exp(-0.5 * (edge * w_edge) ** 2) / math.sqrt(2 * math.pi)
    if edge_lower:
        return g + 1.0           # ~1.4 off-edge, ~1.0 on-edge
    return g.max() - g + 1.0     # 1 off-edge, >1 on-edge


def vf_loss(pred_vf: Array, gt_vf: Array, mask: Array) -> Array:
    """Masked L1 + cosine misalignment on 2D vector fields
    (vf_norm_loss.py:6 VFLoss). pred/gt (B, H, W, C=2k), mask (B, H, W)."""
    m = mask[..., None]
    denom = jnp.maximum(m.sum() * pred_vf.shape[-1], 1.0)
    l1 = (jnp.abs(pred_vf - gt_vf) * m).sum() / denom
    # cosine on 2-vector groups
    b, h, w, c = pred_vf.shape
    p = pred_vf.reshape(b, h, w, c // 2, 2)
    g = gt_vf.reshape(b, h, w, c // 2, 2)
    dot = (p * g).sum(-1)
    nn_ = jnp.linalg.norm(p, axis=-1) * jnp.linalg.norm(g, axis=-1)
    cos = dot / jnp.maximum(nn_, 1e-6)
    cos_term = ((1.0 - cos) * mask[..., None]).sum() / jnp.maximum(
        mask.sum() * (c // 2), 1.0)
    return l1 + cos_term


def norm_loss(pred_n: Array, gt_n: Array, mask: Array) -> Array:
    """Masked L1 + cosine on surface normals (vf_norm_loss.py:56 NORMLoss)."""
    m = mask[..., None]
    denom = jnp.maximum(m.sum() * 3, 1.0)
    l1 = (jnp.abs(pred_n - gt_n) * m).sum() / denom
    dot = (pred_n * gt_n).sum(-1)
    nn_ = jnp.linalg.norm(pred_n, axis=-1) * jnp.linalg.norm(gt_n, axis=-1)
    cos = dot / jnp.maximum(nn_, 1e-6)
    cos_term = ((1.0 - cos) * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    return l1 + cos_term


def compute_self_loss_geo(
    cfg: SelfSupConfig,
    pred: dict[str, Array],          # student geo outputs (geo forward mode)
    pseudo: dict[str, Array],        # teacher pseudo labels (same ROI frame)
    mask_prob_fn=None,               # logits -> prob for mask heads
) -> dict[str, Array]:
    """Geo-mode losses: student dense geometry vs teacher pseudo labels
    (compute_self_loss_geo, self_engine_utils.py:129-340): vis/full mask
    RW_BCE, xyz smooth-L1, region L1, VF/normal."""
    loss: dict[str, Array] = {}
    vis_lr = pseudo["vis_mask_lr"]

    if cfg.mask_lw > 0 and mask_prob_fn is not None:
        p = mask_prob_fn(pred["mask_logits"][..., :1])[..., 0]
        loss["loss_vis_mask_init_pred"] = cfg.mask_lw * \
            weighted_ex_loss_probs(jnp.clip(p, 1e-7, 1 - 1e-7), vis_lr)
        if pred["mask_logits"].shape[-1] >= 2 and "full_mask_lr" in pseudo:
            pf = mask_prob_fn(pred["mask_logits"][..., 1:2])[..., 0]
            loss["loss_full_mask_init_pred"] = cfg.mask_lw * \
                weighted_ex_loss_probs(jnp.clip(pf, 1e-7, 1 - 1e-7),
                                       pseudo["full_mask_lr"])

    if "coor" in pred and "coor" in pseudo:
        m = vis_lr[..., None]
        denom = jnp.maximum(m.sum(), 1.0)
        loss["loss_init_pred_xyz"] = (
            jnp.abs(pred["coor"] - pseudo["coor"]) * m).sum() / (denom * 3)
    if "region_logits" in pred and "region" in pseudo:
        pr = jax.nn.softmax(pred["region_logits"], axis=-1)
        loss["loss_region_init_pred"] = (
            jnp.abs(pr - pseudo["region"]) * vis_lr[..., None]).mean()
    if cfg.vf_lw > 0 and "vf" in pred and "vf" in pseudo:
        loss["loss_vf"] = cfg.vf_lw * vf_loss(pred["vf"], pseudo["vf"], vis_lr)
    if cfg.norm_lw > 0 and "norm" in pred and "norm" in pseudo:
        loss["loss_norm"] = cfg.norm_lw * norm_loss(pred["norm"],
                                                    pseudo["norm"], vis_lr)
    return loss


def compute_self_loss_pose(
    cfg: SelfSupConfig,
    ren: dict[str, Array],           # rendered at student pose, ROI frame:
                                     # color (B,S,S,3), prob, mask, depth
    pred: dict[str, Array],          # student outputs: rot, trans,
                                     # coor (B,o,o,3), region_logits, ...
    pseudo: dict[str, Array],        # teacher/loaded pseudo labels:
                                     # vis_mask (B,S,S), vis_mask_lr (B,o,o),
                                     # rot, trans, coor (B,o,o,3),
                                     # region (B,o,o,R+1) probs
    batch: dict[str, Array],         # roi_img (B,S,S,3), roi_depth (B,S,S),
                                     # roi_zoom_K, gt_points, roi_extent,
                                     # sym_rots, sym_valid
    lpips_fn=None,
    max_depth_points: int = 2048,
    lab_linear: tuple[Array, Array] | None = None,
) -> dict[str, Array]:
    loss: dict[str, Array] = {}
    pseudo_vis = pseudo["vis_mask"]                       # (B,S,S)

    # ---- rendered-mask loss vs pseudo mask ------------------------------
    if cfg.mask_lw > 0:
        w = compute_mask_edge_weights(pseudo_vis) if cfg.mask_edge_reweight else None
        if cfg.mask_loss_type == "RW_BCE":
            lm = weighted_ex_loss_probs(jnp.clip(ren["prob"], 1e-7, 1 - 1e-7),
                                        pseudo_vis, weight=w)
        elif cfg.mask_loss_type == "dice":
            lm = soft_dice_loss(ren["prob"], pseudo_vis, eps=0.002)
        else:
            lm = jnp.abs(ren["prob"] - pseudo_vis).mean()
        loss["loss_mask_self"] = cfg.mask_lw * lm

    vis_m = pseudo_vis[..., None]
    # ONE shared masked-color pair for every image loss: the LAB term is
    # mask-averaged anyway, so pre-masking is identical inside the mask and
    # lets XLA CSE a single color pipeline instead of keeping a second
    # unmasked consumer of the render output alive (the raw-color variant
    # measured 47 ms/step vs 5 ms, BENCH_NOTES.md)
    ren_m = ren["color"] * vis_m
    img_m = batch["roi_img"] * vis_m

    if lab_linear is not None:
        # lab_impl="pixel_split" (engine/self_engine.py::make_lab_pixel_fn):
        # the side programs hand in the exact LAB value and
        # g = lab_lw * d(lab)/d(ren_m). The gradient enters by adding g to
        # ren_m's backward cotangent (inject_grad) — every downstream
        # consumer reads the injected tensor, so the render/model backward
        # receives (other-loss cotangent + g) exactly as if the LAB term
        # were in-graph, while the graph itself carries no LAB ops and no
        # extra reduction. The value rides along as a constant.
        lab_val, lab_g = lab_linear
        ren_m = inject_grad(ren_m, lab_g)
        loss["loss_color_ab_obj"] = lab_val
    elif cfg.lab_lw > 0 and cfg.lab_impl == "pallas":
        # Same injection contract, but (value, g) come from ONE in-graph
        # fused Pallas kernel (ops/lab_pallas.py) instead of side programs —
        # the LAB math is opaque to the fusion pass and the gradient enters
        # as the same elementwise cotangent add. Must run here, BEFORE the
        # other image losses consume ren_m, so every downstream consumer
        # reads the injected tensor.
        from ..ops.lab_pallas import lab_value_grad_pallas
        lab_val, lab_g = lab_value_grad_pallas(
            ren_m, img_m, pseudo_vis, no_l=cfg.lab_no_l)
        ren_m = inject_grad(ren_m, cfg.lab_lw * lab_g)
        loss["loss_color_ab_obj"] = cfg.lab_lw * lab_val

    # ---- perceptual -----------------------------------------------------
    if cfg.perceptual_lw > 0 and lpips_fn is not None:
        loss["loss_percep_obj"] = cfg.perceptual_lw * lpips_fn(
            ren_m, img_m).mean()

    # ---- MS-SSIM --------------------------------------------------------
    if cfg.ms_ssim_lw > 0:
        loss["loss_ms_ssim"] = cfg.ms_ssim_lw * (
            1.0 - ms_ssim(img_m, ren_m))

    # ---- LAB chroma (jnp in-graph forms) --------------------------------
    if cfg.lab_lw > 0 and cfg.lab_impl != "pallas":
        # NOTE: these jnp forms trigger an XLA TPU fusion cliff in the full
        # stage-II graph (~40 ms/step vs ~4 ms without) — see BENCH_NOTES.md
        # "LAB loss compile pathology". The multi-program escapes
        # (pixel_split/split_grad, engine/self_engine.py) bypass this branch
        # entirely; the opaque-kernel "pallas" form runs above, before the
        # other image losses consume ren_m.
        fn = (lab_loss_surrogate if cfg.lab_impl == "surrogate"
              else lab_loss)
        loss["loss_color_ab_obj"] = cfg.lab_lw * fn(
            ren_m, img_m, mask=pseudo_vis, no_l=cfg.lab_no_l)

    # ---- depth chamfer --------------------------------------------------
    if cfg.depth_chamfer_lw > 0 and "roi_depth" in batch:
        Kz = batch["roi_zoom_K"]
        ren_xyz = backproject_depth(ren["depth"], Kz)      # (B,S,S,3)
        obs_xyz = backproject_depth(batch["roi_depth"] * pseudo_vis, Kz)
        B, S, _, _ = ren_xyz.shape
        # subsample a static number of pixels (stride) to bound the pairwise
        # matrix; validity = positive depth
        stride = max(1, int((S * S / max_depth_points) ** 0.5))
        rp = ren_xyz[:, ::stride, ::stride].reshape(B, -1, 3)
        op_ = obs_xyz[:, ::stride, ::stride].reshape(B, -1, 3)
        rw = (rp[..., 2] > 1e-3).astype(rp.dtype)
        ow = (op_[..., 2] > 1e-3).astype(op_.dtype)
        loss["loss_chamfer"] = cfg.depth_chamfer_lw * chamfer_loss(
            rp, op_, rw, ow, dist_thr=cfg.chamfer_dist_thr,
            center_lw=cfg.chamfer_center_lw)

    # ---- xyz / region init-pred (student vs teacher) --------------------
    if "coor" in pred and "coor" in pseudo:
        m = pseudo["vis_mask_lr"][..., None]
        denom = jnp.maximum(m.sum(), 1.0)
        diff = jnp.abs(pred["coor"] - pseudo["coor"]) * m
        loss["loss_init_pred_xyz"] = diff.sum() / (denom * 3)
    if "region_logits" in pred and "region" in pseudo:
        m = pseudo["vis_mask_lr"][..., None]
        pr = jax.nn.softmax(pred["region_logits"], axis=-1)
        loss["loss_region_init_pred"] = (
            jnp.abs(pr - pseudo["region"]) * m).mean()

    # ---- pseudo-pose PM + trans ----------------------------------------
    if cfg.pseudo_pm_lw > 0:
        loss.update(pm_loss(
            pred["rot"], pseudo["rot"], batch["gt_points"],
            pred_transes=pred["trans"], gt_transes=pseudo["trans"],
            extents=batch["roi_extent"],
            sym_rots=batch.get("sym_rots"), sym_valid=batch.get("sym_valid"),
            loss_weight=cfg.pseudo_pm_lw, symmetric=True,
            norm_by_extent=True, r_only=False, disentangle_z=True))
    if cfg.pseudo_trans_lw > 0:
        loss["loss_trans_xy"] = cfg.pseudo_trans_lw * jnp.abs(
            pred["trans"][:, :2] - pseudo["trans"][:, :2]).mean()
        loss["loss_trans_z"] = cfg.pseudo_trans_lw * jnp.abs(
            pred["trans"][:, 2] - pseudo["trans"][:, 2]).mean()

    # ---- VF / normals ---------------------------------------------------
    if cfg.vf_lw > 0 and "vf" in pred and "vf" in pseudo:
        loss["loss_vf"] = cfg.vf_lw * vf_loss(
            pred["vf"], pseudo["vf"], pseudo["vis_mask_lr"])
    if cfg.norm_lw > 0 and "norm" in pred and "norm" in pseudo:
        loss["loss_norm"] = cfg.norm_lw * norm_loss(
            pred["norm"], pseudo["norm"], pseudo["vis_mask_lr"])

    return loss
