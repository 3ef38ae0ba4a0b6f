"""Extended decisive bisect for the pixel_split chain slowdown.

Known (TPU, bs=8 flagship stage-II):
  jstep alone (split_lab, fed precomputed lab_linear): ~6.8-11 ms
  jstep + tiny alternating program:                    +0.4 ms (fine)
  jstep fed lab_g from synthetic big programs:         fine (P1-P3)
  full chain jfwd -> jpix -> jstep:                    ~50 ms
  jfwd + jpix alone chained:                           ~11 ms
  jfwd alone 0.66 ms, jpix alone 1.10 ms

Questions:
  (1) does a side program with LAB ops (jpix) poison the cycle? [B vs E]
  (2) does a side program taking the ~300-leaf params tree poison it? [F]
  (3) does a side program containing the model fwd poison it? [G]
  (4) does a side program containing the Pallas render poison it? [H]
  (5) full jfwd reproduction [I]
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _flagship_cfg
from self6dpp_tpu.config.base import RendererConfig, SelfSupConfig
from self6dpp_tpu.data.meshes import make_icosphere
from self6dpp_tpu.data.synthetic import make_gdrn_batch
from self6dpp_tpu.engine import gdrn_engine as ge
from self6dpp_tpu.engine import self_engine as se
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

step = se.make_self_train_step(cfg, model, lpips, split_lab=True)
jstep = jax.jit(step)
val0 = jnp.float32(0.1)
g0 = jnp.zeros((batch_size, cfg.model.input_res, cfg.model.input_res, 3))

jfwd = jax.jit(se.make_lab_fwd_fn(cfg, model))
rc0, vis0 = jfwd(state.params, state.batch_stats, state.ema_params,
                 batch, rng)
rc0 = jax.block_until_ready(rc0)
img = batch["roi_img"]
jpix = jax.jit(se.make_lab_pixel_fn(cfg))


@jax.jit
def tuple_trivial(rc, roi, vis):
    rm = rc * vis[..., None]
    im = roi * vis[..., None]
    d = rm - im
    return jnp.mean(jnp.abs(d)), jnp.sign(d) * 1e-3


@jax.jit
def params_eater(params, rc):
    # same ~300-leaf input signature class as jfwd, trivial math
    s = sum(jnp.sum(l[..., 0] if l.ndim else l)
            for l in jax.tree.leaves(params)[:8])
    d = rc + s * 0.0
    return jnp.mean(d), jnp.sign(d) * 1e-3


@jax.jit
def model_only(params, batch_stats, b, rng):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    out = model.apply(variables, *se.model_inputs(b), train=False,
                      rngs={"dropout": rng})
    return out["rot"], out["trans"]


@jax.jit
def render_only(b, rot, trans):
    ren = se.render_student_pose(cfg, b, rot, trans)
    return ren["color"]


def timeit(name, fn, n=20):
    r = fn()
    jax.block_until_ready(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(jax.tree.leaves(r)[0])
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)


st = state

def base():
    global st
    st, m = jstep(st, lp, batch, rng, None, None, (val0, g0))
    return m["total_loss"]

timeit("A jstep alone", base)

def b():
    global st
    v, g = tuple_trivial(rc0, img, vis0)
    st, m = jstep(st, lp, batch, rng, None, None, (v, g))
    return m["total_loss"]

timeit("B tuple-trivial -> jstep", b)

def e():
    global st
    v, g = jpix(rc0, img, vis0)
    st, m = jstep(st, lp, batch, rng, None, None, (v, g))
    return m["total_loss"]

timeit("E jpix (real LAB) -> jstep", e)

def f():
    global st
    v, g = params_eater(st.params, rc0)
    st, m = jstep(st, lp, batch, rng, None, None, (v, g))
    return m["total_loss"]

timeit("F params-eater(300 leaves) -> jstep", f)

def gprobe():
    global st
    rot, tr = model_only(st.params, st.batch_stats, batch, rng)
    st, m = jstep(st, lp, batch, rng, None, None, (val0, g0))
    return m["total_loss"]

timeit("G model-fwd-sideprog + jstep", gprobe)

rot0, tr0 = model_only(state.params, state.batch_stats, batch, rng)

def h():
    global st
    c = render_only(batch, rot0, tr0)
    st, m = jstep(st, lp, batch, rng, None, None, (val0, c[..., :3] * 0 + g0))
    return m["total_loss"]

timeit("H render-sideprog + jstep", h)

def i():
    global st
    rc, vis = jfwd(st.params, st.batch_stats, st.ema_params, batch, rng)
    v, g = jpix(rc, img, vis)
    st, m = jstep(st, lp, batch, rng, None, None, (v, g))
    return m["total_loss"]

timeit("I full chain jfwd->jpix->jstep", i)

timeit("A' jstep alone (recheck)", base)
