"""Probe J: does an OPAQUE (Pallas) in-graph consumer of the rendered color,
re-entering the backward only through inject_grad's elementwise add, keep
the stage-II step fast?  If yes, a real Pallas LAB (val, g) kernel escapes
the fusion cliff in a SINGLE program (no side-program chain).

Builds the production split_lab step but monkeypatches the loss wiring so
lab_linear's g is computed in-graph by a trivial Pallas kernel instead of
arriving from a side program.
"""
import dataclasses
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _flagship_cfg
from self6dpp_tpu.config.base import RendererConfig, SelfSupConfig
from self6dpp_tpu.data.meshes import make_icosphere
from self6dpp_tpu.data.synthetic import make_gdrn_batch
from self6dpp_tpu.engine import gdrn_engine as ge
from self6dpp_tpu.engine import self_engine as se
from self6dpp_tpu.losses import self_loss as sl
from self6dpp_tpu.models.lpips import LPIPS

batch_size = 8
cfg = _flagship_cfg()
cfg = dataclasses.replace(
    cfg,
    self_sup=SelfSupConfig(
        enabled=True, mask_lw=1.0, ms_ssim_lw=1.0, lab_lw=0.2,
        depth_chamfer_lw=1.0, perceptual_lw=0.15, pseudo_pm_lw=10.0,
        pseudo_trans_lw=1.0),
    renderer=RendererConfig(tile_px=32, faces_per_tile=128))
model = ge.build_gdrn(cfg)
batch = {k: jnp.asarray(v) for k, v in make_gdrn_batch(cfg, batch_size).items()}
verts, faces = make_icosphere(radius=0.06, subdivisions=3)
colors = (verts - verts.min(0)) / np.ptp(verts, 0)
C = cfg.model.num_classes
batch["mesh_verts"] = jnp.asarray(verts)[None].repeat(C, 0)
batch["mesh_faces"] = jnp.asarray(faces)[None].repeat(C, 0)
batch["mesh_colors"] = jnp.asarray(colors)[None].repeat(C, 0)
batch["roi_zoom_K"] = se.roi_zoom_K(batch, cfg.model.input_res, cfg.model.output_res)
batch["roi_depth"] = jnp.ones(
    (batch_size, cfg.model.input_res, cfg.model.input_res)
) * batch["gt_trans"][:, 2, None, None]
state = ge.init_state(cfg, model, batch)
lpips = LPIPS()
lp = jax.jit(lpips.init)(jax.random.PRNGKey(1), batch["roi_img"],
                         batch["roi_img"])["params"]
rng = jax.random.PRNGKey(0)


def _sign_kernel(r_ref, i_ref, o_ref):
    o_ref[...] = jnp.sign(r_ref[...] - i_ref[...]) * 1e-3


def pallas_g(ren_m, img_m):
    b = ren_m.shape[0]
    n = int(np.prod(ren_m.shape[1:]))
    r2 = ren_m.reshape(b, n)
    i2 = img_m.reshape(b, n)
    g = pl.pallas_call(
        _sign_kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n), lambda k: (k, 0)),
                  pl.BlockSpec((1, n), lambda k: (k, 0))],
        out_specs=pl.BlockSpec((1, n), lambda k: (k, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n), ren_m.dtype),
    )(jax.lax.stop_gradient(r2), i2)
    return g.reshape(ren_m.shape)


orig_loss = sl.compute_self_loss_pose


def patched(cfg_loss, ren, out, pseudo, batch, lpips_fn=None,
            max_depth_points=2048, lab_linear=None):
    # in-graph opaque g + inject_grad re-entry; drop the side-program feed
    vis = pseudo["vis_mask"]
    ren_m = ren["color"] * vis[..., None]
    img_m = batch["roi_img"] * vis[..., None]
    g = pallas_g(ren_m, img_m)
    lab_val = jnp.float32(0.0)
    return orig_loss(cfg_loss, ren, out, pseudo, batch, lpips_fn=lpips_fn,
                     max_depth_points=max_depth_points,
                     lab_linear=(lab_val, g))


def _sign3_kernel(rr, rg, rb, ir, ig, ib, orr, org, orb):
    orr[...] = jnp.sign(rr[...] - ir[...]) * 1e-3
    org[...] = jnp.sign(rg[...] - ig[...]) * 1e-3
    orb[...] = jnp.sign(rb[...] - ib[...]) * 1e-3


def pallas_g_split(ren_m, img_m):
    # channel-split feed: the layout the real LAB kernel needs (per-channel
    # (B, S*S) planes; cross-channel math happens inside the kernel)
    b, s, _, _ = ren_m.shape
    n = s * s
    rp = jax.lax.stop_gradient(ren_m)
    chans = [rp[..., k].reshape(b, n) for k in range(3)]
    ichans = [img_m[..., k].reshape(b, n) for k in range(3)]
    bs = pl.BlockSpec((1, n), lambda k: (k, 0))
    outs = pl.pallas_call(
        _sign3_kernel,
        grid=(b,),
        in_specs=[bs] * 6,
        out_specs=[bs] * 3,
        out_shape=[jax.ShapeDtypeStruct((b, n), ren_m.dtype)] * 3,
    )(*chans, *ichans)
    return jnp.stack([o.reshape(b, s, s) for o in outs], axis=-1)


def patched2(cfg_loss, ren, out, pseudo, batch, lpips_fn=None,
             max_depth_points=2048, lab_linear=None):
    vis = pseudo["vis_mask"]
    ren_m = ren["color"] * vis[..., None]
    img_m = batch["roi_img"] * vis[..., None]
    g = pallas_g_split(ren_m, img_m)
    return orig_loss(cfg_loss, ren, out, pseudo, batch, lpips_fn=lpips_fn,
                     max_depth_points=max_depth_points,
                     lab_linear=(jnp.float32(0.0), g))


def timeit(name, fn, n=20):
    r = fn()
    jax.block_until_ready(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(jax.tree.leaves(r)[0])
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)


# baseline: split_lab step fed a constant lab_linear (no in-graph LAB)
step0 = se.make_self_train_step(cfg, model, lpips, split_lab=True)
jstep0 = jax.jit(step0)
val0 = jnp.float32(0.1)
g0 = jnp.zeros((batch_size, cfg.model.input_res, cfg.model.input_res, 3))
st = state

def base():
    global st
    st, m = jstep0(st, lp, batch, rng, None, None, (val0, g0))
    return m["total_loss"]

timeit("A jstep const-lab_linear", base)

# probe J: in-graph Pallas g (patch stays active until jstepJ is traced —
# jit traces on first call, which happens inside timeit's warmup)
se.compute_self_loss_pose = patched
stepJ = se.make_self_train_step(cfg, model, lpips, split_lab=True)
jstepJ = jax.jit(stepJ)

stJ = state

def j():
    global stJ
    stJ, m = jstepJ(stJ, lp, batch, rng, None, None, None)
    return m["total_loss"]

timeit("J in-graph pallas-g + inject", j)

se.compute_self_loss_pose = patched2
stepJ2 = se.make_self_train_step(cfg, model, lpips, split_lab=True)
jstepJ2 = jax.jit(stepJ2)
stJ2 = state

def j2():
    global stJ2
    stJ2, m = jstepJ2(stJ2, lp, batch, rng, None, None, None)
    return m["total_loss"]

timeit("J2 channel-split pallas-g + inject", j2)
se.compute_self_loss_pose = orig_loss
timeit("A' recheck", base)
