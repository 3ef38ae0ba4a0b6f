"""Fused LAB chroma loss (value + analytic image-space gradient) as one
Pallas kernel.

Motivation (BENCH_NOTES.md "LAB loss compile pathology"): ANY jnp
formulation of the LAB term inside the stage-II train graph fragments the
whole program on the TPU backend (~10x step cost), including stop-grad
side branches and custom-vjp Pallas kernels whose scalar output feeds the
loss reduction. This kernel targets the one shape not yet ruled out: the
LAB math fully opaque to XLA, producing (masked diff sum, mask sum, g)
where g = d(masked diff sum)/d(pred) is consumed ONLY through
``inject_grad``'s elementwise cotangent add — no LAB ops and no extra
color-consuming reduction ever visible to the fusion pass.

Math parity target: ops/color.py::lab_loss (itself mirroring
lib/torch_utils/color rgb_to_lab; L1 on a/b chroma, optionally +L,
masked mean). The gradient is derived analytically through the sRGB
linearization -> XYZ -> f(t) (cbrt branch) -> Lab chain; exactness vs
jax autodiff is asserted in tests/test_ops.py::TestLabPallas.

Layout: channel-split (B, S*S) planes — pixels ride the lanes at full
width; the 3-channel mixing happens between separate full-lane registers
inside the kernel (the NHWC minor-dim=3 layout would waste 125/128 lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

Array = jax.Array

# sRGB D65 (identical constants to ops/color.py)
_M = np.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227],
], np.float32)
_XYZ_REF = np.array([0.950456, 1.0, 1.088754], np.float32)
_EPS = 1e-8
_FT = 0.008856          # f(t) cbrt/linear branch threshold
_SRGB_T = 0.04045       # sRGB gamma branch threshold


def _lin(c):
    return jnp.where(c > _SRGB_T, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def _dlin(c):
    return jnp.where(c > _SRGB_T,
                     (2.4 / 1.055) * ((c + 0.055) / 1.055) ** 1.4,
                     1.0 / 12.92)


def _cbrt_pos(c):
    # cube root of a positive input; jnp.cbrt has no Pallas TPU (Mosaic)
    # lowering, exp/log do — inputs here are always >= _EPS
    return jnp.exp(jnp.log(c) * (1.0 / 3.0))


def _f(c):
    return jnp.where(c > _FT, _cbrt_pos(jnp.maximum(c, _EPS)),
                     7.787 * c + 16.0 / 116.0)


def _df(c):
    # d cbrt(max(c, eps))/dc = 1/(3 cbrt(c)^2) for c > eps, 0 below
    # (mirrors jax autodiff of the clamped form in ops/color.py)
    cb = _cbrt_pos(jnp.maximum(c, _EPS))
    dcbrt = jnp.where(c > _EPS, 1.0 / (3.0 * cb * cb), 0.0)
    return jnp.where(c > _FT, dcbrt, 7.787)


def _lab_channels_split(r, g, b):
    rl, gl, bl = _lin(r), _lin(g), _lin(b)
    x = (_M[0, 0] * rl + _M[0, 1] * gl + _M[0, 2] * bl) / _XYZ_REF[0]
    y = (_M[1, 0] * rl + _M[1, 1] * gl + _M[1, 2] * bl) / _XYZ_REF[1]
    z = (_M[2, 0] * rl + _M[2, 1] * gl + _M[2, 2] * bl) / _XYZ_REF[2]
    fx, fy, fz = _f(x), _f(y), _f(z)
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    bb = 200.0 * (fy - fz)
    return (rl, gl, bl, x, y, z, fx, fy, fz, L, a, bb)


def _kernel(no_l: bool,
            pr_ref, pg_ref, pb_ref, gr_ref, gg_ref, gb_ref, m_ref,
            val_ref, msum_ref, or_ref, og_ref, ob_ref):
    i = pl.program_id(0)
    pr, pg, pb = pr_ref[...], pg_ref[...], pb_ref[...]
    gr, gg, gb = gr_ref[...], gg_ref[...], gb_ref[...]
    m = m_ref[...]

    (_, _, _, xp, yp, zp, fxp, fyp, fzp, Lp, ap, bp) = \
        _lab_channels_split(pr, pg, pb)
    (_, _, _, _, _, _, _, _, _, Lg, ag, bg) = \
        _lab_channels_split(gr, gg, gb)

    diff = jnp.abs(ap - ag) + jnp.abs(bp - bg)
    # d(diff)/d(fx, fy, fz) through a=500(fx-fy), b=200(fy-fz) [, L=116fy-16]
    sa = jnp.sign(ap - ag)
    sb = jnp.sign(bp - bg)
    dfx = 500.0 * sa
    dfy = -500.0 * sa + 200.0 * sb
    dfz = -200.0 * sb
    if not no_l:
        sL = jnp.sign(Lp - Lg)
        diff = diff + jnp.abs(Lp - Lg)
        dfy = dfy + 116.0 * sL

    # back through f(t) and the XYZ normalization
    dx = dfx * _df(xp) / _XYZ_REF[0]
    dy = dfy * _df(yp) / _XYZ_REF[1]
    dz = dfz * _df(zp) / _XYZ_REF[2]
    # back through the RGB->XYZ mix and the sRGB linearization; masked
    dm_r = (dx * _M[0, 0] + dy * _M[1, 0] + dz * _M[2, 0]) * _dlin(pr) * m
    dm_g = (dx * _M[0, 1] + dy * _M[1, 1] + dz * _M[2, 1]) * _dlin(pg) * m
    dm_b = (dx * _M[0, 2] + dy * _M[1, 2] + dz * _M[2, 2]) * _dlin(pb) * m
    or_ref[...] = dm_r
    og_ref[...] = dm_g
    ob_ref[...] = dm_b

    # scalar accumulators live in SMEM — Mosaic cannot store scalars to
    # VMEM refs (the grid is sequential on TPU, so += is race-free)
    @pl.when(i == 0)
    def _init():
        val_ref[0] = 0.0
        msum_ref[0] = 0.0

    val_ref[0] += jnp.sum(diff * m)
    msum_ref[0] += jnp.sum(m)


def lab_value_grad_pallas(pred_rgb: Array, gt_rgb: Array, mask: Array,
                          no_l: bool = True,
                          interpret: bool | None = None
                          ) -> tuple[Array, Array]:
    """Masked-mean LAB L1 value and its gradient w.r.t. pred_rgb.

    pred_rgb/gt_rgb: (B, S, S, 3) in [0,1]; mask: (B, S, S).
    Returns (val scalar, g (B, S, S, 3)) with
    val == lab_loss(pred, gt, mask, no_l) and g == d(val)/d(pred) — the
    same normalization (masked mean over n_ch channels) as ops/color.py.
    The kernel is opaque to XLA; only the scalar normalization (two muls)
    happens in-graph.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    B, S, _, _ = pred_rgb.shape
    n = S * S
    p = jax.lax.stop_gradient(pred_rgb)
    gt = jax.lax.stop_gradient(gt_rgb)
    m = jax.lax.stop_gradient(mask)
    chans = [p[..., k].reshape(B, n) for k in range(3)]
    gchans = [gt[..., k].reshape(B, n) for k in range(3)]
    # blocks span the full batch in the sublanes (B rows) and a lane chunk
    # of pixels; grid walks the pixel axis. ~10 live blocks x B x CHUNK x 4B
    # (double-buffered) must stay inside the ~19 MB scoped-VMEM budget, so
    # the chunk shrinks as the batch grows (B=8 -> 8192, B=16 -> 4096;
    # bs=16 OOMed the fixed 8192 at 26 MB on v5e).
    chunk = min(n, max(512, 65536 // max(B, 1)))
    while n % chunk:
        chunk //= 2    # n = S*S; terminates (chunk=1 divides anything)
    from jax.experimental.pallas import tpu as pltpu
    bs = pl.BlockSpec((B, chunk), lambda i: (0, i))
    sc = pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jnp.float32
    val_raw, msum, gr, gg, gb = pl.pallas_call(
        functools.partial(_kernel, no_l),
        grid=(n // chunk,),
        in_specs=[bs] * 6 + [bs],
        out_specs=[sc, sc, bs, bs, bs],
        out_shape=[jax.ShapeDtypeStruct((1,), f32),
                   jax.ShapeDtypeStruct((1,), f32),
                   jax.ShapeDtypeStruct((B, n), f32),
                   jax.ShapeDtypeStruct((B, n), f32),
                   jax.ShapeDtypeStruct((B, n), f32)],
        interpret=interpret,
    )(*chans, *gchans, m.reshape(B, n))
    n_ch = 2 if no_l else 3
    norm = 1.0 / (jnp.maximum(msum[0], 1.0) * n_ch)
    val = val_raw[0] * norm
    g = jnp.stack([gr, gg, gb], axis=-1).reshape(B, S, S, 3) * norm
    return val, g
