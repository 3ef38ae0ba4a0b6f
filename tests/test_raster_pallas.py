"""Pallas rasterizer kernel: forward parity + gradient agreement with the
XLA path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self6dpp_tpu.data.meshes import make_cube, make_icosphere
from self6dpp_tpu.ops import rasterizer as Rz

H = W = 32
K = np.array([[32.0, 0, 16.0], [0, 32.0, 16.0], [0, 0, 1.0]], dtype=np.float32)
EYE = np.eye(3, dtype=np.float32)

# CPU tests run the kernel in interpret mode
import self6dpp_tpu.ops.raster_pallas as RP
from jax.experimental import pallas as pl

_orig_pallas_call = pl.pallas_call


def _interp_pallas_call(*args, **kw):
    kw.setdefault("interpret", True)
    return _orig_pallas_call(*args, **kw)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    if jax.devices()[0].platform == "cpu":
        monkeypatch.setattr(RP.pl, "pallas_call", _interp_pallas_call)
    yield


def render(impl, verts, faces, attrs, t, with_prob=True):
    return Rz.rasterize_single(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(attrs),
        jnp.asarray(K), jnp.asarray(EYE), jnp.asarray(t, dtype=jnp.float32),
        height=H, width=W, tile_px=16, faces_per_tile=16,
        with_prob=with_prob, impl=impl)


class TestForwardParity:
    @pytest.mark.parametrize("mesh", ["cube", "sphere"])
    def test_outputs_match_xla(self, mesh):
        if mesh == "cube":
            verts, faces = make_cube(size=0.4)
        else:
            verts, faces = make_icosphere(radius=0.2, subdivisions=1)
        attrs = verts
        t = (0.02, -0.01, 1.0)
        a = render("xla", verts, faces, attrs, t)
        b = render("pallas", verts, faces, attrs, t)
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
        np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.attr), np.asarray(b.attr),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.prob), np.asarray(b.prob),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(a.face_id),
                                      np.asarray(b.face_id))


class TestGradientParity:
    def test_grad_matches_xla(self):
        verts, faces = make_icosphere(radius=0.2, subdivisions=1)

        def loss(t, impl):
            out = render(impl, verts, faces, verts, t)
            us = jnp.arange(W, dtype=jnp.float32)[None, :]
            return (out.prob * us).sum() * 1e-2 + (out.attr ** 2).sum() \
                + (out.depth ** 2).sum() * 0.1

        t0 = jnp.asarray([0.02, -0.01, 1.0])
        g_xla = jax.grad(lambda t: loss(t, "xla"))(t0)
        g_pal = jax.grad(lambda t: loss(t, "pallas"))(t0)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_xla),
                                   rtol=2e-2, atol=1e-3)

    def test_grad_finite_difference(self):
        verts, faces = make_cube(size=0.4)

        def loss(tx):
            t = jnp.stack([tx, jnp.asarray(0.0), jnp.asarray(1.0)])
            out = render("pallas", verts, faces, verts, t)
            us = jnp.arange(W, dtype=jnp.float32)[None, :]
            return (out.prob * us).sum() / jnp.maximum(out.prob.sum(), 1e-6)

        g = jax.grad(loss)(jnp.asarray(0.0))
        eps = 1e-3
        fd = (loss(jnp.asarray(eps)) - loss(jnp.asarray(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=0.15)

    def test_attr_gradient(self):
        """Gradients wrt vertex attributes flow through interpolation."""
        verts, faces = make_cube(size=0.4)

        def loss(attrs):
            out = render("pallas", verts, faces, attrs, (0, 0, 1.0))
            return (out.attr ** 2).sum()

        g = jax.grad(loss)(jnp.asarray(verts))
        g_ref = jax.grad(lambda a: (render("xla", verts, faces, a,
                                           (0, 0, 1.0)).attr ** 2).sum())(
            jnp.asarray(verts))
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-3, atol=1e-5)


class TestBatchedPallas:
    def test_batch_matches_xla(self):
        verts, faces = make_icosphere(radius=0.2, subdivisions=1)
        t = jnp.asarray([[0.02, -0.01, 1.0], [0.0, 0.05, 1.3]])
        R = jnp.broadcast_to(jnp.eye(3), (2, 3, 3)).astype(jnp.float32)
        Kb = jnp.broadcast_to(jnp.asarray(K), (2, 3, 3))
        kw = dict(height=H, width=W, tile_px=16, faces_per_tile=16)
        a = Rz.rasterize_batch(jnp.asarray(verts), jnp.asarray(faces),
                               jnp.asarray(verts), Kb, R, t, impl="xla", **kw)
        b = Rz.rasterize_batch(jnp.asarray(verts), jnp.asarray(faces),
                               jnp.asarray(verts), Kb, R, t, impl="pallas", **kw)
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
        np.testing.assert_allclose(np.asarray(a.attr), np.asarray(b.attr),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.prob), np.asarray(b.prob),
                                   atol=1e-5)

    def test_batch_grad(self):
        verts, faces = make_cube(size=0.4)
        Kb = jnp.broadcast_to(jnp.asarray(K), (2, 3, 3))
        R = jnp.broadcast_to(jnp.eye(3), (2, 3, 3)).astype(jnp.float32)

        def loss(t, impl):
            out = Rz.rasterize_batch(
                jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(verts),
                Kb, R, t, height=H, width=W, tile_px=16, faces_per_tile=16,
                impl=impl)
            return (out.attr ** 2).sum() + out.prob.sum() * 1e-2

        # generic pose: a perfectly-centered cube puts pixels exactly on
        # triangle edges, where autodiff's 0.5/0.5 tie-splitting of lax.max
        # differs from the kernel's strict clip mask (measure-zero configs)
        t0 = jnp.asarray([[0.013, -0.021, 1.03], [0.057, 0.011, 1.21]])
        g_p = jax.grad(lambda t: loss(t, "pallas"))(t0)
        g_x = jax.grad(lambda t: loss(t, "xla"))(t0)
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                                   rtol=2e-2, atol=1e-3)
