"""Stage-II self-supervised engine tests: fused render-and-compare step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from self6dpp_tpu.config.base import (
    BackboneConfig, Config, GeoHeadConfig, LossConfig, PnPNetConfig,
    PoseNetConfig, SelfSupConfig, SolverConfig,
)
from self6dpp_tpu.data.meshes import make_cube
from self6dpp_tpu.data.synthetic import make_gdrn_batch
from self6dpp_tpu.engine import gdrn_engine as ge
from self6dpp_tpu.engine import self_engine as se
from self6dpp_tpu.losses.self_loss import (compute_mask_edge_weights,
                                           mask_dilate, mask_erode, vf_loss,
                                           norm_loss)
from self6dpp_tpu.models.lpips import LPIPS


def tiny_cfg() -> Config:
    model = PoseNetConfig(
        num_classes=2, input_res=64, output_res=16,
        backbone=BackboneConfig(name="micro"),
        geo_head=GeoHeadConfig(feat_dim=16, num_gn_groups=4, num_regions=4),
        pnp_net=PnPNetConfig(featdim=16, num_gn_groups=4),
        loss=LossConfig(),
    )
    return Config(
        model=model,
        solver=SolverConfig(optimizer="adam", base_lr=1e-4, total_iters=100,
                            warmup_iters=0, ims_per_batch=2, reference_bs=2),
        self_sup=SelfSupConfig(enabled=True, mask_lw=1.0, ms_ssim_lw=1.0,
                               lab_lw=0.1, depth_chamfer_lw=1.0,
                               perceptual_lw=0.1, pseudo_pm_lw=10.0,
                               pseudo_trans_lw=1.0),
    )


def make_batch(cfg, b=2):
    batch = {k: jnp.asarray(v) for k, v in make_gdrn_batch(
        cfg, b, input_res=64, output_res=16, n_points=64).items()}
    verts, faces = make_cube(size=0.15)
    colors = (verts - verts.min(0)) / np.ptp(verts, 0)
    batch["mesh_verts"] = jnp.asarray(verts)[None].repeat(2, 0)
    batch["mesh_faces"] = jnp.asarray(faces)[None].repeat(2, 0)
    batch["mesh_colors"] = jnp.asarray(colors)[None].repeat(2, 0)
    batch["roi_zoom_K"] = se.roi_zoom_K(batch, cfg.model.input_res)
    batch["roi_depth"] = jnp.ones((b, 64, 64)) * batch["gt_trans"][:, 2, None, None]
    batch["pseudo_rot"] = batch["gt_rot"]
    batch["pseudo_trans"] = batch["gt_trans"]
    return batch


class TestMorphology:
    def test_dilate_erode(self):
        m = jnp.zeros((1, 9, 9)).at[0, 4, 4].set(1.0)
        d = mask_dilate(m, 3)
        assert float(d.sum()) == 9.0
        e = mask_erode(d, 3)
        assert float(e.sum()) == 1.0 and float(e[0, 4, 4]) == 1.0

    def test_edge_weights(self):
        m = jnp.zeros((1, 16, 16)).at[:, 4:12, 4:12].set(1.0)
        w = compute_mask_edge_weights(m, 3, 3, edge_lower=True)
        # off-edge pixels get the higher weight, edge pixels ~1
        assert float(w[0, 0, 0]) > float(w[0, 4, 4])
        w2 = compute_mask_edge_weights(m, 3, 3, edge_lower=False)
        assert float(w2[0, 4, 4]) > float(w2[0, 0, 0])


class TestVFNormLoss:
    def test_zero_when_equal(self, rng):
        vf = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), dtype=jnp.float32)
        m = jnp.ones((1, 8, 8))
        assert float(vf_loss(vf, vf, m)) == pytest.approx(0.0, abs=1e-5)
        n = jnp.asarray(rng.normal(size=(1, 8, 8, 3)), dtype=jnp.float32)
        assert float(norm_loss(n, n, m)) == pytest.approx(0.0, abs=1e-5)

    def test_positive_when_different(self, rng):
        a = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), dtype=jnp.float32)
        b = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), dtype=jnp.float32)
        assert float(vf_loss(a, b, jnp.ones((1, 8, 8)))) > 0


def test_self_train_step():
    cfg = tiny_cfg()
    model = ge.build_gdrn(cfg)
    batch = make_batch(cfg)
    state = ge.init_state(cfg, model, batch)

    lpips = LPIPS()
    lp = lpips.init(jax.random.PRNGKey(1), batch["roi_img"], batch["roi_img"])["params"]

    step = jax.jit(se.make_self_train_step(cfg, model, lpips))
    rng = jax.random.PRNGKey(0)
    losses, pm_losses = [], []
    for _ in range(8):
        state, metrics = step(state, lp, batch, rng)
        losses.append(float(metrics["total_loss"]))
        pm_losses.append(float(metrics["loss_PM_R"]))
    assert np.isfinite(losses).all(), losses
    expected = {"loss_mask_self", "loss_ms_ssim", "loss_color_ab_obj",
                "loss_chamfer", "loss_percep_obj", "loss_PM_R",
                "loss_init_pred_xyz", "loss_region_init_pred"}
    assert expected <= set(metrics.keys()), set(metrics.keys())
    # the pseudo-pose PM term has a fixed target (gt pose here) — it must
    # improve; the total mixes moving-teacher render terms that wander from
    # a random init, so only sanity-bound it
    assert pm_losses[-1] < pm_losses[0], pm_losses
    assert losses[-1] < losses[0] * 2.0, losses
    # teacher moved (EMA update)
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.params, state.ema_params)
    assert max(jax.tree.leaves(d)) > 0


def test_synsup_step():
    cfg = tiny_cfg()
    model = ge.build_gdrn(cfg)
    batch = make_batch(cfg)
    state = ge.init_state(cfg, model, batch)
    step = jax.jit(se.make_synsup_train_step(cfg, model))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))
