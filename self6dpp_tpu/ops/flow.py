"""Depth-warp optical flow GT for DeepIM's flow loss — pure jnp.

Parity target: core/csrc/flow (flow_cuda_kernel.cu:29-66): backproject src
depth through Kinv, transform by the relative pose KT=[K(R|t)], project, and
accept if the target depth at the rounded landing pixel agrees within 3mm.
The CUDA per-pixel loop becomes one vectorized gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def flow_from_depth(depth_src: Array, depth_tgt: Array, KT: Array,
                    Kinv: Array, depth_thresh: float = 3e-3
                    ) -> tuple[Array, Array]:
    """depth_src/tgt (B, H, W); KT (B, 3, 4) = K @ [R_rel | t_rel];
    Kinv (B, 3, 3). Returns flow (B, H, W, 2) = (dv, du) [reference channel
    order: flow[0]=h_proj-h, flow[1]=w_proj-w] and valid (B, H, W)."""
    B, H, W = depth_src.shape
    ws = jnp.arange(W, dtype=depth_src.dtype)[None, None, :]
    hs = jnp.arange(H, dtype=depth_src.dtype)[None, :, None]

    # x = (w*Ki00 + h*Ki01 + Ki02) * d ; y = (w*Ki10 + h*Ki11 + Ki12) * d
    Ki = Kinv[:, :, :]
    x = (ws * Ki[:, 0, 0, None, None] + hs * Ki[:, 0, 1, None, None]
         + Ki[:, 0, 2, None, None]) * depth_src
    y = (ws * Ki[:, 1, 0, None, None] + hs * Ki[:, 1, 1, None, None]
         + Ki[:, 1, 2, None, None]) * depth_src
    z = depth_src

    xp = x * KT[:, 0, 0, None, None] + y * KT[:, 0, 1, None, None] \
        + z * KT[:, 0, 2, None, None] + KT[:, 0, 3, None, None]
    yp = x * KT[:, 1, 0, None, None] + y * KT[:, 1, 1, None, None] \
        + z * KT[:, 1, 2, None, None] + KT[:, 1, 3, None, None]
    zp = x * KT[:, 2, 0, None, None] + y * KT[:, 2, 1, None, None] \
        + z * KT[:, 2, 2, None, None] + KT[:, 2, 3, None, None] + 1e-15

    wp = xp / zp
    hp = yp / zp
    wi = jnp.round(wp).astype(jnp.int32)
    hi = jnp.round(hp).astype(jnp.int32)
    inb = (wp >= 0) & (wp <= W - 1) & (hp >= 0) & (hp <= H - 1)

    wi_c = jnp.clip(wi, 0, W - 1)
    hi_c = jnp.clip(hi, 0, H - 1)
    d_tgt = jnp.take_along_axis(
        depth_tgt.reshape(B, -1), (hi_c * W + wi_c).reshape(B, -1), axis=1
    ).reshape(B, H, W)

    valid = (depth_src > 1e-3) & inb & (jnp.abs(zp - d_tgt) < depth_thresh)
    flow = jnp.stack([hp - jnp.broadcast_to(hs, (B, H, W)),
                      wp - jnp.broadcast_to(ws, (B, H, W))], axis=-1)
    flow = jnp.where(valid[..., None], flow, 0.0)
    return flow, valid.astype(depth_src.dtype)


def relative_pose_KT(K: Array, R_src: Array, t_src: Array, R_tgt: Array,
                     t_tgt: Array) -> tuple[Array, Array]:
    """Build (KT, Kinv) for flow_from_depth from two poses: the relative
    transform carrying src-camera points onto tgt-camera points
    (core/csrc/flow/flow_torch.py semantics)."""
    R_rel = jnp.einsum("bij,bkj->bik", R_tgt, R_src)         # R_tgt @ R_srcᵀ
    t_rel = t_tgt - jnp.einsum("bij,bj->bi", R_rel, t_src)
    Rt = jnp.concatenate([R_rel, t_rel[:, :, None]], axis=2)  # (B,3,4)
    KT = jnp.einsum("bij,bjk->bik", K, Rt)
    Kinv = jnp.linalg.inv(K)
    return KT, Kinv
