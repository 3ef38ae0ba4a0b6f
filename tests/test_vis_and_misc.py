"""Vis utilities, profiling helpers, LPIPS, and ref metadata sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self6dpp_tpu.data.ref import get_meta, sym_rotations_from_info
from self6dpp_tpu.models.lpips import LPIPS
from self6dpp_tpu.utils import vis
from self6dpp_tpu.utils.profiling import StepTimer, device_memory_stats


class TestVis:
    def test_grid_show(self, rng):
        imgs = [rng.uniform(0, 1, (16, 16, 3)), rng.uniform(0, 1, (8, 8))]
        grid = vis.grid_show(imgs, ncol=2)
        assert grid.dtype == np.uint8 and grid.ndim == 3

    def test_flow_to_rgb(self, rng):
        flow = rng.normal(0, 2, (16, 16, 2)).astype(np.float32)
        rgb = vis.flow_to_rgb(flow)
        assert rgb.shape == (16, 16, 3) and rgb.dtype == np.uint8

    def test_heatmap_and_bbox(self, rng):
        hm = vis.heatmap(rng.uniform(0, 1, (16, 16)))
        assert hm.shape == (16, 16, 3)
        img = vis.draw_bbox(rng.uniform(0, 1, (32, 32, 3)), [4, 4, 20, 20],
                            text="ape")
        assert img.shape == (32, 32, 3)

    def test_pose_axes(self):
        K = np.array([[32.0, 0, 16], [0, 32.0, 16], [0, 0, 1]])
        img = vis.draw_pose_axes(np.zeros((32, 32, 3)), K, np.eye(3),
                                 np.array([0, 0, 1.0]))
        assert img.sum() > 0       # something was drawn


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer()
        for _ in range(3):
            with t:
                pass
        s = t.stats()
        assert set(s) == {"p50", "p90", "max", "mean"}

    def test_memory_stats(self):
        assert isinstance(device_memory_stats(), dict)


class TestLPIPS:
    def test_identical_zero_and_symmetry(self, rng):
        m = LPIPS()
        a = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), dtype=jnp.float32)
        b = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), dtype=jnp.float32)
        params = m.init(jax.random.PRNGKey(0), a, b)
        d_aa = m.apply(params, a, a)
        d_ab = m.apply(params, a, b)
        d_ba = m.apply(params, b, a)
        np.testing.assert_allclose(np.asarray(d_aa), 0.0, atol=1e-5)
        assert (np.asarray(d_ab) > 0).all()
        np.testing.assert_allclose(np.asarray(d_ab), np.asarray(d_ba), rtol=1e-4)

    def test_grad_flows(self, rng):
        m = LPIPS()
        a = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), dtype=jnp.float32)
        b = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), dtype=jnp.float32)
        params = m.init(jax.random.PRNGKey(0), a, b)
        g = jax.grad(lambda x: m.apply(params, x, b).sum())(a)
        assert float(jnp.abs(g).sum()) > 0


class TestRefMeta:
    def test_lm13(self):
        meta = get_meta("lm")
        assert meta.num_objects == 13
        assert "bowl" not in meta.objects and "ape" in meta.objects
        assert meta.is_sym("eggbox") and not meta.is_sym("ape")
        assert abs(meta.diameter("ape") - 0.102099) < 1e-6

    def test_ycbv(self):
        meta = get_meta("ycbv")
        assert meta.num_objects == 21
        assert meta.is_sym("024_bowl")

    def test_sym_rotations_continuous(self):
        info = {"symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]}
        rots, valid = sym_rotations_from_info(info, max_sym=8, n_cont=8)
        assert valid.sum() == 8
        # all are valid rotations about z
        for r in rots[valid]:
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
            np.testing.assert_allclose(r[2, 2], 1.0, atol=1e-6)

    def test_sym_rotations_discrete(self):
        flip = np.diag([-1.0, -1.0, 1.0, 1.0])
        info = {"symmetries_discrete": [flip.reshape(-1).tolist()]}
        rots, valid = sym_rotations_from_info(info, max_sym=4)
        assert valid.sum() == 2
        np.testing.assert_allclose(rots[1], np.diag([-1, -1, 1]), atol=1e-6)


class TestDebugUtils:
    def test_check_finite_tree(self):
        from self6dpp_tpu.utils.debug import check_finite_tree
        import pytest as _pt
        check_finite_tree({"a": np.ones(3)})
        with _pt.raises(FloatingPointError):
            check_finite_tree({"a": {"b": np.array([1.0, np.nan])}})

    def test_nan_debugging_context(self):
        from self6dpp_tpu.utils.debug import nan_debugging
        import jax as _jax
        with nan_debugging():
            assert _jax.config.jax_debug_nans
        assert not _jax.config.jax_debug_nans
