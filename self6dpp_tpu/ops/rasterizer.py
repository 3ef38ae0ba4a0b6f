"""ONE batched differentiable rasterizer for the whole framework.

Replaces four reference renderers with a single TPU-native design
(SURVEY.md §7 architecture stance):
  * kaolin DIB-R CUDA soft rasterizer (lib/dr_utils/dib_renderer_x/rasterizer/
    rasterizer.py: knum=30 candidate faces, exp-distance silhouette probs,
    custom CUDA backward) -> soft mode, gradients via XLA autodiff;
  * EGL offscreen renderer (lib/egl_renderer/egl_renderer_v3.py: xyz / mask /
    depth / normal GT maps, DeepIM ren branch)  -> hard mode outputs;
  * lib/meshrenderer + lib/render_vispy                  -> same hard mode.

Design (tile-binned, two stages, static shapes):
  1. bin: for every image tile (tile_px²), select the top-K faces whose
     screen bbox overlaps the tile (K static) — one O(T·F) mask + top_k;
  2. raster: per tile × pixel × candidate: edge functions -> coverage,
     barycentrics, per-face mean depth z-test (DIB-R parity,
     rasterizer.py:62-67 uses face-mean depth), interpolated attributes,
     and the DIB-R silhouette probability 1 - prod_k(1 - exp(-d²/σ²)).

Everything is jnp; gradients wrt vertex positions AND attributes come from
autodiff of the same forward math DIB-R differentiates by hand. A Pallas
kernel can later swap in for stage 2 behind the same signature.

Conventions: pixel coords (u right, v down), camera looks +z (BOP/OpenCV),
depth = camera-space z (smaller = closer). Faces with all-behind vertices or
back-facing orientation are culled. All shapes static; variable face counts
are padded with degenerate faces (index 0,0,0 -> zero area -> no coverage).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class RasterOut(NamedTuple):
    mask: Array          # (B, H, W)   hard coverage {0,1}
    prob: Array          # (B, H, W)   soft silhouette probability
    depth: Array         # (B, H, W)   camera-space z (0 where empty)
    attr: Array          # (B, H, W, D) interpolated vertex attributes
    face_id: Array       # (B, H, W)   winning face index (-1 where empty)
    bary: Array          # (B, H, W, 3) barycentric weights of the winner


def project_mesh(verts: Array, K: Array, R: Array, t: Array,
                 eps: float = 1e-8) -> tuple[Array, Array]:
    """verts (V,3) object frame -> 2D pixels (V,2) + camera z (V,).
    K (3,3), R (3,3), t (3,)."""
    cam = verts @ R.T + t
    z = cam[:, 2]
    u = K[0, 0] * cam[:, 0] / (z + eps) + K[0, 2]
    v = K[1, 1] * cam[:, 1] / (z + eps) + K[1, 2]
    return jnp.stack([u, v], axis=-1), z


def _face_gather(x: Array, faces: Array) -> Array:
    """x (V, ...) , faces (F, 3) -> (F, 3, ...)."""
    return x[faces]


def _bin_faces(v2d_f: Array, valid_f: Array, height: int, width: int,
               tile_px: int, faces_per_tile: int,
               zmean_f: Array | None = None) -> Array:
    """Assign faces to tiles. Returns (T, K) int32 face ids (-1 = empty).

    v2d_f: (F, 3, 2) screen-space face vertices; valid_f: (F,) bool.
    zmean_f: (F,) mean face depth. When given, a tile whose overlap set
    exceeds the K budget keeps the K *nearest* faces (kaolin keeps a
    closest-knum candidate buffer the same way) — dropped faces are the
    farthest, i.e. occluded for an opaque mesh — instead of an arbitrary
    first-K by face order.
    """
    F = v2d_f.shape[0]
    th = -(-height // tile_px)
    tw = -(-width // tile_px)
    fmin = v2d_f.min(axis=1)         # (F, 2) u,v
    fmax = v2d_f.max(axis=1)

    ty = jnp.arange(th, dtype=jnp.float32)[:, None] * tile_px     # (th,1)
    tx = jnp.arange(tw, dtype=jnp.float32)[None, :] * tile_px     # (1,tw)
    # overlap per tile/face: bbox test, expanded 1px for soft edges
    pad = 1.0 + tile_px * 0.0
    ov_y = (fmin[:, 1][None, None, :] <= ty[:, :, None] + tile_px + pad) & \
           (fmax[:, 1][None, None, :] >= ty[:, :, None] - pad)     # (th,tw,F)... memory!
    ov_x = (fmin[:, 0][None, None, :] <= tx[:, :, None] + tile_px + pad) & \
           (fmax[:, 0][None, None, :] >= tx[:, :, None] - pad)
    overlap = ov_y & ov_x & valid_f[None, None, :]                 # (th, tw, F)
    overlap = overlap.reshape(th * tw, F)

    # selection priority: nearest-first when depths are given (graceful
    # overflow), else first-K in mesh order; ties resolved by top_k's
    # stable index order either way
    if zmean_f is not None:
        key = jnp.where(overlap, -zmean_f[None, :], -jnp.inf)
    else:
        key = jnp.where(overlap, -jnp.arange(F, dtype=jnp.float32), -jnp.inf)
    k = min(faces_per_tile, F)
    neg_idx, idx = jax.lax.top_k(key, k)                           # (T, k)
    cand = jnp.where(jnp.isfinite(neg_idx), idx, -1).astype(jnp.int32)
    if k < faces_per_tile:
        pad = jnp.full((cand.shape[0], faces_per_tile - k), -1, jnp.int32)
        cand = jnp.concatenate([cand, pad], axis=1)
    return cand


def _raster_tile(tile_idx: Array, cand: Array, v2d_f: Array, zmean_f: Array,
                 zinv_f: Array, attr_f: Array, valid_f: Array,
                 height: int, width: int, tile_px: int, sigma_px: float,
                 zbuf_mode: str, with_prob: bool = True):
    """Rasterize one tile. cand: (K,) face ids (-1 empty). Returns per-pixel
    outputs of shape (tile_px, tile_px, ...). K=128 fills the TPU lanes."""
    K = cand.shape[0]
    tw = -(-width // tile_px)
    ty = (tile_idx // tw) * tile_px
    tx = (tile_idx % tw) * tile_px
    py = ty + jnp.arange(tile_px)
    px = tx + jnp.arange(tile_px)
    # pixel centers at integer coords (EGL/OpenCV convention: pixel (i,j)
    # center at (j, i))
    pu = px.astype(jnp.float32)[None, :, None]                    # (1,tp,1)
    pv = py.astype(jnp.float32)[:, None, None]                    # (tp,1,1)

    safe = jnp.maximum(cand, 0)
    cv2d = v2d_f[safe]                                            # (K,3,2)
    czme = zmean_f[safe]                                          # (K,)
    czin = zinv_f[safe]                                           # (K,3)
    catt = attr_f[safe]                                           # (K,3,D)
    cval = valid_f[safe] & (cand >= 0)                            # (K,)

    x0, y0 = cv2d[:, 0, 0], cv2d[:, 0, 1]
    x1, y1 = cv2d[:, 1, 0], cv2d[:, 1, 1]
    x2, y2 = cv2d[:, 2, 0], cv2d[:, 2, 1]
    area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)          # (K,)
    inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)

    # edge functions -> barycentrics (w0 at v0, etc.)
    w0 = ((x1 - pu) * (y2 - pv) - (x2 - pu) * (y1 - pv)) * inv_area
    w1 = ((x2 - pu) * (y0 - pv) - (x0 - pu) * (y2 - pv)) * inv_area
    w2 = 1.0 - w0 - w1                                            # (tp,tp,K)
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & cval[None, None, :]

    # depth test on per-face mean z (DIB-R parity); closest (min z) wins
    zkey = jnp.where(inside, czme[None, None, :], jnp.inf)
    best = jnp.argmin(zkey, axis=-1)                              # (tp,tp)
    covered = jnp.take_along_axis(inside, best[..., None], axis=-1)[..., 0]

    bary = jnp.stack([
        jnp.take_along_axis(w0, best[..., None], -1)[..., 0],
        jnp.take_along_axis(w1, best[..., None], -1)[..., 0],
        jnp.take_along_axis(w2, best[..., None], -1)[..., 0],
    ], axis=-1)                                                   # (tp,tp,3)
    bary = jnp.clip(bary, 0.0, 1.0)
    bary = bary / jnp.maximum(bary.sum(-1, keepdims=True), 1e-8)

    watt = catt[best]                                             # (tp,tp,3,D)
    if zbuf_mode == "persp":
        # perspective-correct interpolation via 1/z weights
        winv = czin[best]                                         # (tp,tp,3)
        pw = bary * winv
        pw = pw / jnp.maximum(pw.sum(-1, keepdims=True), 1e-12)
        attr = (watt * pw[..., None]).sum(-2)
        depth = 1.0 / jnp.maximum((bary * winv).sum(-1), 1e-12)
    else:
        attr = (watt * bary[..., None]).sum(-2)
        depth = jnp.take_along_axis(
            jnp.where(inside, czme[None, None, :], 0.0), best[..., None], -1
        )[..., 0]

    attr = jnp.where(covered[..., None], attr, 0.0)
    depth = jnp.where(covered, depth, 0.0)
    face_id = jnp.where(covered, cand[best], -1)

    # ---- soft silhouette prob (DIB-R semantics) -------------------------
    # inside a face: contribution 1; outside: exp(-d²/σ²) with d = squared
    # pixel distance to the face (distance to the nearest edge segment).
    # Aggregate: 1 - prod(1 - p_k). Skipped entirely for hard-only renders.
    if with_prob:
        d2 = _point_tri_dist2(pu, pv, x0, y0, x1, y1, x2, y2)     # (tp,tp,K)
        p_face = jnp.where(inside, 1.0, jnp.exp(-d2 / (sigma_px ** 2)))
        p_face = jnp.where(cval[None, None, :], p_face, 0.0)
        prob = 1.0 - jnp.prod(1.0 - p_face, axis=-1)
    else:
        prob = covered.astype(jnp.float32)

    return covered.astype(jnp.float32), prob, depth, attr, face_id, bary


def _point_seg_dist2(pu, pv, ax, ay, bx, by):
    abx, aby = bx - ax, by - ay
    apx, apy = pu - ax, pv - ay
    tt = (apx * abx + apy * aby) / jnp.maximum(abx * abx + aby * aby, 1e-12)
    tt = jnp.clip(tt, 0.0, 1.0)
    dx = apx - tt * abx
    dy = apy - tt * aby
    return dx * dx + dy * dy


def _point_tri_dist2(pu, pv, x0, y0, x1, y1, x2, y2):
    d01 = _point_seg_dist2(pu, pv, x0, y0, x1, y1)
    d12 = _point_seg_dist2(pu, pv, x1, y1, x2, y2)
    d20 = _point_seg_dist2(pu, pv, x2, y2, x0, y0)
    return jnp.minimum(jnp.minimum(d01, d12), d20)


def _pack_candidates(cand, v2d_f, zmean_f, zinv_f, attr_f, valid_f):
    """Gather per-tile candidate face data into the kernel's K-minor layout:
    cgeo (T, 8, K), czin (T, 3, K), catt (T, 3D, K)."""
    T, K = cand.shape
    D = attr_f.shape[-1]
    safe = jnp.maximum(cand, 0)
    cv2d = v2d_f[safe].reshape(T, K, 6)
    czme = zmean_f[safe][..., None]
    cval = (valid_f[safe] & (cand >= 0)).astype(jnp.float32)[..., None]
    cgeo = jnp.concatenate([cv2d, czme, cval], axis=-1)          # (T,K,8)
    czin = zinv_f[safe]                                          # (T,K,3)
    catt = attr_f[safe].reshape(T, K, 3 * D)
    return (jnp.swapaxes(cgeo, 1, 2), jnp.swapaxes(czin, 1, 2),
            jnp.swapaxes(catt, 1, 2))


def _unpack_pixels(x, tile_px):
    """(T, [D,] P/128, 128) -> (T, tp, tp[, D])."""
    T = x.shape[0]
    if x.ndim == 4:            # attr (T, D, P8, LANE)
        D = x.shape[1]
        return jnp.moveaxis(x.reshape(T, D, tile_px, tile_px), 1, -1)
    return x.reshape(T, tile_px, tile_px)


def _rasterize_fine_pallas(cand, v2d_f, zmean_f, zinv_f, attr_f, valid_f,
                           height, width, tile_px, sigma_px, zbuf_mode,
                           with_prob):
    """Pallas fine stage: pre-gather candidate data, run the fused kernel
    (ops/raster_pallas.py), reshape tiles back to the image."""
    from .raster_pallas import fine_raster
    tw = -(-width // tile_px)
    T, K = cand.shape
    D = attr_f.shape[-1]
    cgeo, czin, catt = _pack_candidates(cand, v2d_f, zmean_f, zinv_f,
                                        attr_f, valid_f)
    mask, prob, depth, attr, best = fine_raster(
        cgeo, czin, catt, tile_px, D, sigma_px, with_prob,
        zbuf_mode == "persp", tw, T)
    mask = _unpack_pixels(mask, tile_px)
    prob = _unpack_pixels(prob, tile_px)
    depth = _unpack_pixels(depth, tile_px)
    attr = _unpack_pixels(attr, tile_px)
    best = _unpack_pixels(best, tile_px)
    face_id = jnp.where(
        best >= 0,
        jnp.take_along_axis(cand, jnp.maximum(best, 0).reshape(T, -1),
                            axis=1).reshape(best.shape), -1)
    bary = jnp.zeros(best.shape + (3,), jnp.float32)   # not exposed by kernel
    return mask, prob, depth, attr, face_id, bary


@partial(jax.jit, static_argnames=("height", "width", "tile_px",
                                  "faces_per_tile", "sigma_px", "zbuf_mode",
                                  "cull_backfaces", "with_prob", "impl"))
def rasterize_single(
    verts: Array,            # (V, 3) object-frame vertices
    faces: Array,            # (F, 3) int32 (padded with 0s for degenerate)
    attrs: Array,            # (V, D) per-vertex attributes to interpolate
    K: Array, R: Array, t: Array,
    height: int = 64, width: int = 64,
    tile_px: int = 16, faces_per_tile: int = 128,
    sigma_px: float = 1.0, zbuf_mode: str = "persp",
    cull_backfaces: bool = True, with_prob: bool = True,
    impl: str = "xla",
) -> RasterOut:
    """Rasterize one mesh under one pose. vmap over a batch axis for batches.

    impl: 'xla' (portable, autodiff) or 'pallas' (fused TPU kernel with
    analytic VJP — ops/raster_pallas.py)."""
    v2d, z = project_mesh(verts, K, R, t)
    v2d_f = _face_gather(v2d, faces)                              # (F,3,2)
    z_f = _face_gather(z, faces)                                  # (F,3)
    attr_f = _face_gather(attrs, faces)                           # (F,3,D)
    zmean_f = z_f.mean(axis=1)
    zinv_f = 1.0 / jnp.maximum(z_f, 1e-8)

    # validity: in front of camera, non-degenerate, front-facing
    front = (z_f > 1e-6).all(axis=1)
    x0, y0 = v2d_f[:, 0, 0], v2d_f[:, 0, 1]
    x1, y1 = v2d_f[:, 1, 0], v2d_f[:, 1, 1]
    x2, y2 = v2d_f[:, 2, 0], v2d_f[:, 2, 1]
    area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    nondeg = jnp.abs(area2) > 1e-10
    valid_f = front & nondeg
    if cull_backfaces:
        # v-down image coords: a triangle whose outward 3D normal points at
        # the camera (-z) winds clockwise on screen -> negative signed area
        valid_f = valid_f & (area2 < 0)

    cand = _bin_faces(v2d_f, valid_f, height, width, tile_px, faces_per_tile,
                      zmean_f=zmean_f)

    if impl == "pallas":
        mask, prob, depth, attr, face_id, bary = _rasterize_fine_pallas(
            cand, v2d_f, zmean_f, zinv_f, attr_f, valid_f, height, width,
            tile_px, sigma_px, zbuf_mode, with_prob)
    else:
        tiles = jnp.arange(cand.shape[0], dtype=jnp.int32)
        raster = partial(_raster_tile, v2d_f=v2d_f, zmean_f=zmean_f,
                         zinv_f=zinv_f, attr_f=attr_f, valid_f=valid_f,
                         height=height, width=width, tile_px=tile_px,
                         sigma_px=sigma_px, zbuf_mode=zbuf_mode,
                         with_prob=with_prob)
        mask, prob, depth, attr, face_id, bary = jax.vmap(raster)(tiles, cand)

    th = -(-height // tile_px)
    tw = -(-width // tile_px)

    def untile(x):
        # (T, tp, tp, ...) -> (H, W, ...)
        x = x.reshape((th, tw, tile_px, tile_px) + x.shape[3:])
        x = jnp.moveaxis(x, 2, 1).reshape((th * tile_px, tw * tile_px) + x.shape[4:])
        return x[:height, :width]

    return RasterOut(mask=untile(mask), prob=untile(prob), depth=untile(depth),
                     attr=untile(attr), face_id=untile(face_id),
                     bary=untile(bary))


def rasterize_batch(verts, faces, attrs, K, R, t, **kw) -> RasterOut:
    """Batched over poses (and optionally per-instance meshes).

    verts (B,V,3) or (V,3); faces (F,3) shared or (B,F,3); attrs (B,V,D) or
    (V,D); K (B,3,3) or (3,3); R (B,3,3); t (B,3).

    impl='pallas' uses a dedicated batched path: the per-image binning/prep
    is vmapped jnp, then ALL (batch x tile) cells go through ONE pallas_call
    grid — vmap over pallas_call itself is avoided (it defeats the kernel's
    grid pipelining).
    """
    if kw.get("impl", "xla") == "pallas":
        return _rasterize_batch_pallas(verts, faces, attrs, K, R, t, **kw)
    B = R.shape[0]
    bcast = lambda x, nd: (0 if x.ndim > nd else None)
    in_axes = (bcast(verts, 2), bcast(faces, 2), bcast(attrs, 2),
               bcast(K, 2), 0, 0)
    fn = lambda v, f, a, k, r, tt: rasterize_single(v, f, a, k, r, tt, **kw)
    return jax.vmap(fn, in_axes=in_axes)(verts, faces, attrs, K, R, t)


@partial(jax.jit, static_argnames=("height", "width", "tile_px",
                                  "faces_per_tile", "sigma_px", "zbuf_mode",
                                  "cull_backfaces", "with_prob", "impl"))
def _rasterize_batch_pallas(
    verts, faces, attrs, K, R, t,
    height: int = 64, width: int = 64, tile_px: int = 16,
    faces_per_tile: int = 128, sigma_px: float = 1.0,
    zbuf_mode: str = "persp", cull_backfaces: bool = True,
    with_prob: bool = True, impl: str = "pallas",
) -> RasterOut:
    from .raster_pallas import fine_raster
    B = R.shape[0]
    D = attrs.shape[-1]
    th = -(-height // tile_px)
    tw = -(-width // tile_px)
    Tt = th * tw

    def prep(v, f, a, k, r, tt):
        v2d, z = project_mesh(v, k, r, tt)
        v2d_f = _face_gather(v2d, f)
        z_f = _face_gather(z, f)
        attr_f = _face_gather(a, f)
        zmean_f = z_f.mean(axis=1)
        zinv_f = 1.0 / jnp.maximum(z_f, 1e-8)
        front = (z_f > 1e-6).all(axis=1)
        x0, y0 = v2d_f[:, 0, 0], v2d_f[:, 0, 1]
        x1, y1 = v2d_f[:, 1, 0], v2d_f[:, 1, 1]
        x2, y2 = v2d_f[:, 2, 0], v2d_f[:, 2, 1]
        area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        valid_f = front & (jnp.abs(area2) > 1e-10)
        if cull_backfaces:
            valid_f = valid_f & (area2 < 0)
        cand = _bin_faces(v2d_f, valid_f, height, width, tile_px,
                          faces_per_tile, zmean_f=zmean_f)
        cgeo, czin, catt = _pack_candidates(cand, v2d_f, zmean_f, zinv_f,
                                            attr_f, valid_f)
        return cand, cgeo, czin, catt

    bcast = lambda x, nd: (0 if x.ndim > nd else None)
    in_axes = (bcast(verts, 2), bcast(faces, 2), bcast(attrs, 2),
               bcast(K, 2), 0, 0)
    cand, cgeo, czin, catt = jax.vmap(prep, in_axes=in_axes)(
        verts, faces, attrs, K, R, t)                 # (B,T,...)

    Kc = cand.shape[-1]
    mask, prob, depth, attr, best = fine_raster(
        cgeo.reshape(B * Tt, 8, Kc), czin.reshape(B * Tt, 3, Kc),
        catt.reshape(B * Tt, 3 * D, Kc), tile_px, D, sigma_px, with_prob,
        zbuf_mode == "persp", tw, Tt)
    mask = _unpack_pixels(mask, tile_px)
    prob = _unpack_pixels(prob, tile_px)
    depth = _unpack_pixels(depth, tile_px)
    attr = _unpack_pixels(attr, tile_px)
    best = _unpack_pixels(best, tile_px)
    face_id = jnp.where(
        best >= 0,
        jnp.take_along_axis(cand.reshape(B * Tt, Kc),
                            jnp.maximum(best, 0).reshape(B * Tt, -1),
                            axis=1).reshape(best.shape), -1)

    def untile(x):
        x = x.reshape((B, th, tw, tile_px, tile_px) + x.shape[3:])
        x = jnp.moveaxis(x, 3, 2).reshape(
            (B, th * tile_px, tw * tile_px) + x.shape[5:])
        return x[:, :height, :width]

    bary = jnp.zeros((B, height, width, 3), jnp.float32)
    return RasterOut(mask=untile(mask), prob=untile(prob),
                     depth=untile(depth), attr=untile(attr),
                     face_id=untile(face_id), bary=bary)


# ---------------------------------------------------------------------------
# convenience wrappers mirroring Renderer_dibr outputs
# ---------------------------------------------------------------------------

def render_xyz_mask_depth(verts, faces, K, R, t, height, width, **kw):
    """EGL-parity GT maps: object-frame XYZ, mask, depth
    (lib/egl_renderer usage in core/gdrn_modeling/engine/engine_utils.py:54-77)."""
    out = rasterize_batch(verts, faces, verts, K, R, t,
                          height=height, width=width, **kw)
    return {"xyz": out.attr, "mask": out.mask, "depth": out.depth,
            "prob": out.prob}


def render_color(verts, faces, colors, K, R, t, height, width, **kw):
    """DIB-R VertexColor mode parity (renderer/vcrender_batch.py):
    returns color, soft prob, hard mask, depth."""
    out = rasterize_batch(verts, faces, colors, K, R, t,
                          height=height, width=width, **kw)
    return {"color": out.attr, "prob": out.prob, "mask": out.mask,
            "depth": out.depth}


def render_textured(verts, faces, uv, texture, K, R, t, height, width, **kw):
    """Texture-mapped rendering (DIB-R TexRender parity,
    renderer/texrender*.py): rasterize per-vertex UVs, then bilinearly sample
    the texture — both steps differentiable (grads flow to vertices, UVs and
    texels).

    uv (V, 2) in [0,1] (v down); texture (Ht, Wt, 3) shared or (B, Ht, Wt, 3).
    """
    out = rasterize_batch(verts, faces, uv, K, R, t,
                          height=height, width=width, **kw)
    us = out.attr[..., 0]
    vs = out.attr[..., 1]
    tex = texture if texture.ndim == 4 else jnp.broadcast_to(
        texture, (out.mask.shape[0],) + texture.shape)
    ht, wt = tex.shape[1], tex.shape[2]

    from .zoom import _bilinear_sample
    def sample(texture_i, u_i, v_i):
        return _bilinear_sample(texture_i, u_i * (wt - 1), v_i * (ht - 1))

    color = jax.vmap(sample)(tex, us, vs)
    color = color * out.mask[..., None]
    return {"color": color, "prob": out.prob, "mask": out.mask,
            "depth": out.depth}


def render_shaded(verts, faces, normals, K, R, t, height, width, *,
                  mode: str = "lambertian", colors=None, uv=None,
                  texture=None, light_dir=(0.0, 0.0, -1.0),
                  ambient: float = 0.4, diffuse: float = 0.6,
                  material=None, shininess: float = 40.0, sh_coeffs=None,
                  **kw):
    """Lit rendering modes — Lambertian / Phong / spherical-harmonics, with
    vertex colors or a texture as the base albedo.

    Parity: DIB-R's per-mode renderers (lib/dr_utils/dib_renderer_x/
    renderer/base.py:53-104 dispatch; fragment shaders frag_phongtex.py,
    frag_shtex.py). TPU-first restructuring: instead of five nn.Module
    pipelines, ONE rasterization pass interpolates [albedo|uv ++ normal]
    attributes and shading happens as a fused elementwise epilogue
    (deferred shading — XLA fuses it into the rasterizer output write).

    normals: (V,3) or (B,V,3) object-frame vertex normals
             (compute_vertex_normals).
    mode: 'lambertian' | 'phong' | 'sh'.
    colors (V,3)/(B,V,3) or uv (V,2)+texture (Ht,Wt,3)/(B,Ht,Wt,3) albedo.
    light_dir: (3,) or (B,3) directional light, camera frame (phong/lamb).
    material: (B,3,3) [ambient;diffuse;specular] rgb rows (phong; defaults
              to [[a,a,a],[d,d,d],[.5,.5,.5]]).
    sh_coeffs: (B,9) SH lighting coefficients (sh mode).
    """
    use_tex = uv is not None
    base_attr = uv if use_tex else colors
    assert base_attr is not None, "need colors= or uv=+texture="
    nd = base_attr.shape[-1]
    # broadcast per-vertex attr tables to a common batch-ness
    if base_attr.ndim != normals.ndim:
        B = R.shape[0]
        if base_attr.ndim == 2:
            base_attr = jnp.broadcast_to(base_attr,
                                         (B,) + base_attr.shape)
        if normals.ndim == 2:
            normals = jnp.broadcast_to(normals, (B,) + normals.shape)
    attrs = jnp.concatenate([base_attr, normals], axis=-1)
    out = rasterize_batch(verts, faces, attrs, K, R, t,
                          height=height, width=width, **kw)
    B = out.mask.shape[0]
    n_obj = out.attr[..., nd : nd + 3]
    Rb = R if R.ndim == 3 else jnp.broadcast_to(R, (B, 3, 3))
    n_cam = jnp.einsum("bij,bhwj->bhwi", Rb, n_obj)
    n_cam = n_cam / jnp.maximum(
        jnp.linalg.norm(n_cam, axis=-1, keepdims=True), 1e-8)

    if use_tex:
        tex = texture if texture.ndim == 4 else jnp.broadcast_to(
            texture, (B,) + texture.shape)
        ht, wt = tex.shape[1], tex.shape[2]
        from .zoom import _bilinear_sample
        base = jax.vmap(lambda tx, u, v: _bilinear_sample(
            tx, u * (wt - 1), v * (ht - 1)))(
            tex, out.attr[..., 0], out.attr[..., 1])
    else:
        base = out.attr[..., :3]

    if mode == "sh":
        assert sh_coeffs is not None, "sh mode needs sh_coeffs (B,9)"
        x, y, z = n_cam[..., 0:1], n_cam[..., 1:2], n_cam[..., 2:3]
        bands = jnp.concatenate([
            0.2820948 * jnp.ones_like(x),
            -0.3257350 * y, 0.3257350 * z, -0.3257350 * x,
            0.2731371 * (x * y), -0.2731371 * (y * z),
            0.1365686 * (z * z) - 0.0788479,
            -0.1931371 * (x * z), 0.1365686 * (x * x - y * y),
        ], axis=-1)                                           # (B,H,W,9)
        coef = (bands * jnp.asarray(sh_coeffs)[:, None, None, :]).sum(
            -1, keepdims=True)
        color = coef * base
    else:
        l = jnp.asarray(light_dir, jnp.float32)
        l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-8)
        l = l if l.ndim == 2 else jnp.broadcast_to(l, (B, 3))
        lb = l[:, None, None, :]
        cos_t = jnp.clip((n_cam * lb).sum(-1, keepdims=True), 0.0, 1.0)
        if mode == "lambertian":
            color = base * (ambient + diffuse * cos_t)
        elif mode == "phong":
            if material is None:
                material = jnp.broadcast_to(jnp.asarray(
                    [[ambient] * 3, [diffuse] * 3, [0.5] * 3],
                    jnp.float32), (B, 3, 3))
            # eye direction from the camera-space fragment position
            from .geometry import backproject_depth
            pos = backproject_depth(out.depth, K if K.ndim == 3 else
                                    jnp.broadcast_to(K, (B, 3, 3)))
            eye = -pos / jnp.maximum(
                jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-8)
            refl = -lb + 2.0 * cos_t * n_cam
            cos_a = jnp.clip((refl * eye).sum(-1, keepdims=True), 1e-5, 1.0)
            cos_a = cos_a ** shininess
            amb = material[:, 0][:, None, None, :]
            dif = material[:, 1][:, None, None, :] * cos_t
            spe = material[:, 2][:, None, None, :] * cos_a
            color = (amb + dif) * base + spe
        else:
            raise ValueError(f"unknown shading mode: {mode}")

    color = jnp.clip(color, 0.0, 1.0) * out.mask[..., None]
    return {"color": color, "prob": out.prob, "mask": out.mask,
            "depth": out.depth, "normal": n_cam * out.mask[..., None]}


def compute_vertex_normals(verts: Array, faces: Array) -> Array:
    """Area-weighted vertex normals (for normal-map rendering)."""
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)                              # (F,3)
    vn = jnp.zeros_like(verts)
    for i in range(3):
        vn = vn.at[faces[:, i]].add(fn)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)
