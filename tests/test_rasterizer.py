"""Golden tests for the differentiable rasterizer against analytic geometry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self6dpp_tpu.data.meshes import make_cube, make_icosphere, make_quad, pad_mesh
from self6dpp_tpu.ops import rasterizer as Rz

H = W = 64
K = np.array([[64.0, 0, 32.0], [0, 64.0, 32.0], [0, 0, 1.0]], dtype=np.float32)
EYE = np.eye(3, dtype=np.float32)


def raster_quad(t=(0, 0, 1.0), size=0.5, **kw):
    verts, faces = make_quad(size=size)
    return Rz.rasterize_single(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(verts),
        jnp.asarray(K), jnp.asarray(EYE), jnp.asarray(t, dtype=jnp.float32),
        height=H, width=W, tile_px=16, faces_per_tile=16, **kw)


class TestHardMode:
    def test_quad_coverage(self):
        """0.5m quad at z=1 with f=64: half-extent 0.25m -> 16px; covers
        pixels [16, 48) in both axes (quad corners project to 16..48)."""
        out = raster_quad()
        mask = np.asarray(out.mask)
        # interior definitely covered
        assert mask[32, 32] == 1.0
        assert mask[20, 20] == 1.0 and mask[44, 44] == 1.0
        # outside
        assert mask[8, 8] == 0.0 and mask[56, 56] == 0.0
        # analytic area: 32x32 px square (+/- 1px edge effects)
        assert abs(mask.sum() - 32 * 32) < 140

    def test_depth_value(self):
        out = raster_quad(t=(0, 0, 1.5))
        d = np.asarray(out.depth)
        assert abs(d[32, 32] - 1.5) < 1e-4
        assert d[2, 2] == 0.0

    def test_xyz_attr_interpolation(self):
        """Attr = object-frame coords; pixel (u,v) must backproject to the
        plane point ((u-32)/64*z, (v-32)/64*z, 0)."""
        out = raster_quad()
        xyz = np.asarray(out.attr)
        for (v, u) in [(32, 32), (24, 40), (40, 24)]:
            expect_x = (u - 32) / 64.0
            expect_y = (v - 32) / 64.0
            np.testing.assert_allclose(xyz[v, u, 0], expect_x, atol=2e-2)
            np.testing.assert_allclose(xyz[v, u, 1], expect_y, atol=2e-2)
            np.testing.assert_allclose(xyz[v, u, 2], 0.0, atol=1e-5)

    def test_zbuffer_closer_wins(self):
        """Two quads; the closer one must own the overlap."""
        v1, f1 = make_quad(size=0.5)            # z=1 plane
        v2, f2 = make_quad(size=0.5)
        v1 = v1 + np.array([0, 0, 1.0], dtype=np.float32)
        v2 = v2 + np.array([0, 0, 2.0], dtype=np.float32)
        verts = np.concatenate([v1, v2])
        faces = np.concatenate([f1, f2 + 4])
        attrs = np.concatenate([np.ones((4, 1)), 2 * np.ones((4, 1))]).astype(np.float32)
        out = Rz.rasterize_single(
            jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(attrs),
            jnp.asarray(K), jnp.asarray(EYE), jnp.zeros(3),
            height=H, width=W, tile_px=16, faces_per_tile=16)
        assert abs(float(out.depth[32, 32]) - 1.0) < 1e-4
        assert abs(float(out.attr[32, 32, 0]) - 1.0) < 1e-4

    def test_backface_culling(self):
        verts, faces = make_quad(size=0.5)
        flipped = faces[:, ::-1].copy()
        out = Rz.rasterize_single(
            jnp.asarray(verts), jnp.asarray(flipped), jnp.asarray(verts),
            jnp.asarray(K), jnp.asarray(EYE), jnp.asarray([0, 0, 1.0]),
            height=H, width=W, tile_px=16, faces_per_tile=16)
        assert float(out.mask.sum()) == 0.0

    def test_cube_silhouette_and_normals(self):
        verts, faces = make_cube(size=0.4)
        out = Rz.rasterize_single(
            jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(verts),
            jnp.asarray(K), jnp.asarray(EYE), jnp.asarray([0, 0, 1.0]),
            height=H, width=W, tile_px=16, faces_per_tile=32)
        mask = np.asarray(out.mask)
        assert mask[32, 32] == 1.0
        # front face at z = 1 - 0.2
        assert abs(float(out.depth[32, 32]) - 0.8) < 1e-3
        # roughly square silhouette of half-extent 0.2/0.8*64 = 16px
        assert abs(mask.sum() - 32 * 32) < 200

    def test_padded_faces_ignored(self):
        verts, faces = make_quad(size=0.5)
        pv, pf = pad_mesh(verts, faces, 64, 64)
        out = Rz.rasterize_single(
            jnp.asarray(pv), jnp.asarray(pf), jnp.asarray(pv),
            jnp.asarray(K), jnp.asarray(EYE), jnp.asarray([0, 0, 1.0]),
            height=H, width=W, tile_px=16, faces_per_tile=16)
        out2 = raster_quad()
        np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(out2.mask))

    def test_batch_consistency(self):
        verts, faces = make_cube(size=0.3)
        R = np.broadcast_to(EYE, (3, 3, 3)).copy()
        t = np.array([[0, 0, 1.0], [0.1, 0, 1.0], [0, 0, 2.0]], dtype=np.float32)
        out = Rz.rasterize_batch(
            jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(verts),
            jnp.asarray(K), jnp.asarray(R), jnp.asarray(t),
            height=H, width=W, tile_px=16, faces_per_tile=32)
        assert out.mask.shape == (3, H, W)
        # farther object => smaller silhouette
        assert float(out.mask[2].sum()) < float(out.mask[0].sum())
        # shifted object => shifted centroid
        ys, xs = np.nonzero(np.asarray(out.mask[1]))
        assert xs.mean() > 33


class TestSoftMode:
    def test_prob_bounds_and_interior(self):
        out = raster_quad()
        prob = np.asarray(out.prob)
        assert prob.min() >= 0.0 and prob.max() <= 1.0 + 1e-6
        assert prob[32, 32] > 0.99
        assert prob[1, 1] < 1e-3
        # prob decays smoothly outside the hard edge
        edge = prob[32, 48]      # just outside right edge (boundary at 47.x)
        far = prob[32, 55]
        assert edge > far

    def test_gradient_flows_to_translation(self):
        verts, faces = make_quad(size=0.5)

        def silhouette_sum(tz):
            t = jnp.stack([jnp.asarray(0.0), jnp.asarray(0.0), tz])
            out = Rz.rasterize_single(
                jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(verts),
                jnp.asarray(K), jnp.asarray(EYE), t,
                height=H, width=W, tile_px=16, faces_per_tile=16)
            return out.prob.sum()

        g = jax.grad(silhouette_sum)(jnp.asarray(1.0))
        # moving away shrinks the silhouette -> negative gradient
        assert np.isfinite(float(g)) and float(g) < 0

    def test_gradient_matches_finite_difference(self):
        verts, faces = make_quad(size=0.5)

        def loss(tx):
            t = jnp.stack([tx, jnp.asarray(0.0), jnp.asarray(1.0)])
            out = Rz.rasterize_single(
                jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(verts),
                jnp.asarray(K), jnp.asarray(EYE), t,
                height=H, width=W, tile_px=16, faces_per_tile=16)
            # weighted-centroid loss, smooth in tx
            us = jnp.arange(W, dtype=jnp.float32)[None, :]
            return (out.prob * us).sum() / jnp.maximum(out.prob.sum(), 1e-6)

        g = jax.grad(loss)(jnp.asarray(0.0))
        eps = 1e-3
        fd = (loss(jnp.asarray(eps)) - loss(jnp.asarray(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=0.1)
        # 1 m right shift at z=1,f=64 moves the centroid 64 px
        assert 40 < float(g) < 90

    def test_gradient_flows_to_rotation_on_sphere(self):
        verts, faces = make_icosphere(radius=0.2, subdivisions=1)

        def loss(angle):
            c, s = jnp.cos(angle), jnp.sin(angle)
            R = jnp.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            out = Rz.rasterize_single(
                jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(verts),
                jnp.asarray(K), R, jnp.asarray([0, 0, 1.0]),
                height=H, width=W, tile_px=16, faces_per_tile=64)
            return (out.attr ** 2).sum()

        g = jax.grad(loss)(jnp.asarray(0.3))
        assert np.isfinite(float(g))


class TestTexturedRender:
    def test_texture_sampling(self):
        """Quad with UVs spanning the texture: left half red, right green."""
        verts, faces = make_quad(size=0.5)
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float32)
        tex = np.zeros((8, 8, 3), np.float32)
        tex[:, :4, 0] = 1.0       # left half red
        tex[:, 4:, 1] = 1.0       # right half green
        out = Rz.render_textured(
            jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(uv),
            jnp.asarray(tex), jnp.asarray(K)[None],
            jnp.broadcast_to(jnp.eye(3), (1, 3, 3)).astype(jnp.float32),
            jnp.asarray([[0.0, 0.0, 1.0]]), height=H, width=W,
            tile_px=16, faces_per_tile=16)
        c = np.asarray(out["color"][0])
        m = np.asarray(out["mask"][0])
        assert m[32, 32] == 1
        # left side of the quad (u<0.5) red, right green
        assert c[32, 20, 0] > 0.9 and c[32, 20, 1] < 0.1
        assert c[32, 44, 1] > 0.9 and c[32, 44, 0] < 0.1

    def test_texture_grad(self):
        verts, faces = make_quad(size=0.5)
        uv = jnp.asarray(np.array([[0, 0], [1, 0], [1, 1], [0, 1]],
                                  dtype=np.float32))
        tex = jnp.ones((4, 4, 3)) * 0.5

        def loss(tex):
            out = Rz.render_textured(
                jnp.asarray(verts), jnp.asarray(faces), uv, tex,
                jnp.asarray(K)[None],
                jnp.broadcast_to(jnp.eye(3), (1, 3, 3)).astype(jnp.float32),
                jnp.asarray([[0.0, 0.0, 1.0]]), height=H, width=W,
                tile_px=16, faces_per_tile=16)
            return (out["color"] ** 2).sum()

        g = jax.grad(loss)(tex)
        assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


class TestWrappers:
    def test_render_xyz_mask_depth(self):
        verts, faces = make_cube(size=0.3)
        out = Rz.render_xyz_mask_depth(
            jnp.asarray(verts), jnp.asarray(faces),
            jnp.asarray(K)[None],
            jnp.broadcast_to(jnp.eye(3), (1, 3, 3)).astype(jnp.float32),
            jnp.asarray([[0.0, 0.0, 1.0]]), height=H, width=W,
            tile_px=16, faces_per_tile=32)
        assert set(out) == {"xyz", "mask", "depth", "prob"}
        m = np.asarray(out["mask"][0])
        xyz = np.asarray(out["xyz"][0])
        # xyz attr inside mask stays within the cube extents
        assert np.abs(xyz[m > 0]).max() <= 0.15 + 1e-5

    def test_compute_vertex_normals_sphere(self):
        verts, faces = make_icosphere(radius=0.1, subdivisions=1)
        n = np.asarray(Rz.compute_vertex_normals(jnp.asarray(verts),
                                                 jnp.asarray(faces)))
        # sphere normals ~ radial directions
        rad = verts / np.linalg.norm(verts, axis=1, keepdims=True)
        cos = (n * rad).sum(1)
        assert cos.min() > 0.9


class TestShadedModes:
    """Lambertian / Phong / SH deferred shading (DIB-R fragment shader
    parity: frag_phongtex.py, frag_shtex.py; dispatch base.py:53-104)."""

    def _sphere(self):
        verts, faces = make_icosphere(radius=0.1, subdivisions=2)
        colors = np.ones_like(verts) * 0.8
        normals = np.asarray(Rz.compute_vertex_normals(
            jnp.asarray(verts), jnp.asarray(faces)))
        pose = (jnp.asarray(K)[None],
                jnp.broadcast_to(jnp.eye(3), (1, 3, 3)).astype(jnp.float32),
                jnp.asarray([[0.0, 0.0, 1.0]]))
        return verts, faces, colors, normals, pose

    def test_lambertian_brightest_toward_light(self):
        verts, faces, colors, normals, (Kb, R, t) = self._sphere()
        out = Rz.render_shaded(
            jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(normals),
            Kb, R, t, height=H, width=W, mode="lambertian",
            colors=jnp.asarray(colors), light_dir=(0.0, 0.0, -1.0),
            ambient=0.2, diffuse=0.8, tile_px=16, faces_per_tile=64)
        c = np.asarray(out["color"][0]).sum(-1)
        m = np.asarray(out["mask"][0])
        # center of the sphere faces the camera/light -> brightest;
        # silhouette pixels are at the ambient floor
        ys, xs = np.nonzero(m)
        cy, cx = int(ys.mean()), int(xs.mean())
        assert c[cy, cx] > 0.9 * 3 * 0.8 * 0.9
        edge = c[m > 0].min()
        assert edge < c[cy, cx] * 0.45
        # bounded by (ambient+diffuse)*albedo
        assert c.max() <= 3 * (0.2 + 0.8) * 0.8 + 1e-4

    def test_phong_specular_highlight(self):
        verts, faces, colors, normals, (Kb, R, t) = self._sphere()
        kw = dict(height=H, width=W, colors=jnp.asarray(colors),
                  light_dir=(0.0, 0.0, -1.0), tile_px=16, faces_per_tile=64)
        lam = Rz.render_shaded(
            jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(normals),
            Kb, R, t, mode="lambertian", **kw)
        pho = Rz.render_shaded(
            jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(normals),
            Kb, R, t, mode="phong", shininess=60.0, **kw)
        m = np.asarray(pho["mask"][0])
        ys, xs = np.nonzero(m)
        cy, cx = int(ys.mean()), int(xs.mean())
        # specular adds brightness at the mirror-reflection center
        assert float(pho["color"][0, cy, cx].sum()) > \
            float(lam["color"][0, cy, cx].sum()) + 0.1

    def test_sh_constant_band_is_flat(self):
        """Only the constant SH band lit -> shading independent of normals:
        color = 0.2820948 * L0 * albedo everywhere in-mask."""
        verts, faces, colors, normals, (Kb, R, t) = self._sphere()
        sh = np.zeros((1, 9), np.float32)
        sh[0, 0] = 2.0
        out = Rz.render_shaded(
            jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(normals),
            Kb, R, t, height=H, width=W, mode="sh", colors=jnp.asarray(colors),
            sh_coeffs=jnp.asarray(sh), tile_px=16, faces_per_tile=64)
        c = np.asarray(out["color"][0])
        m = np.asarray(out["mask"][0]) > 0
        expected = 0.2820948 * 2.0 * 0.8
        # interior pixels (exclude soft silhouette interpolation)
        interior = np.zeros_like(m)
        interior[16:-16, 16:-16] = m[16:-16, 16:-16]
        vals = c[interior]
        np.testing.assert_allclose(vals, expected, atol=0.02)

    def test_shaded_texture_grad(self):
        verts, faces, colors, normals, (Kb, R, t) = self._sphere()

        def loss(t_):
            out = Rz.render_shaded(
                jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(normals),
                Kb, R, t_, height=H, width=W, mode="phong",
                colors=jnp.asarray(colors), tile_px=16, faces_per_tile=64)
            return (out["color"] ** 2).sum()

        g = jax.grad(loss)(t)
        assert np.isfinite(np.asarray(g)).all()
