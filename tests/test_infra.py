"""Config system, checkpoint manager, writers."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self6dpp_tpu.config.base import (Config, SolverConfig, apply_overrides,
                                      load_config)
from self6dpp_tpu.engine.checkpoint import (CheckpointManager,
                                            load_params_npz, save_params_npz)
from self6dpp_tpu.engine.optim import build_optimizer
from self6dpp_tpu.engine.train_state import create_train_state
from self6dpp_tpu.engine.writers import EventStorage, JSONWriter


class TestConfig:
    def test_load_example_config(self):
        cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                       "configs", "gdrn", "lm_base.py"))
        assert cfg.model.num_classes == 13
        assert cfg.model.backbone.name == "resnest50d"
        assert cfg.solver.optimizer == "ranger"

    def test_all_shipped_configs_load(self):
        import glob
        root = os.path.join(os.path.dirname(__file__), "..", "configs")
        paths = sorted(glob.glob(os.path.join(root, "*", "*.py")))
        assert len(paths) >= 9, paths
        for p in paths:
            cfg = load_config(p)
            assert cfg.exp_name, p
            assert cfg.model.num_classes >= 1, p

    def test_overrides(self):
        cfg = Config()
        cfg2 = apply_overrides(cfg, ["solver.base_lr=0.01",
                                     "model.num_classes=5",
                                     "data.color_aug_prob=0.3",
                                     "model.backbone.name=resnet18"])
        assert cfg2.solver.base_lr == 0.01
        assert cfg2.model.num_classes == 5
        assert cfg2.model.backbone.name == "resnet18"
        # original untouched (frozen dataclasses)
        assert cfg.solver.base_lr != 0.01

    def test_unknown_key_rejected(self):
        with pytest.raises(AssertionError):
            apply_overrides(Config(), ["solver.nonexistent=1"])


def _mini_state():
    params = {"dense": {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}}
    tx, _ = build_optimizer(SolverConfig(optimizer="adam", total_iters=10,
                                         warmup_iters=0))
    return create_train_state(params, {}, tx, with_ema=True)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        state = _mini_state()
        grads = jax.tree.map(jnp.ones_like, state.params)
        state = state.apply_gradients(grads).update_ema()
        mgr = CheckpointManager(str(tmp_path / "ckpt"), save_period=1)
        assert mgr.save(state)
        state2 = _mini_state()
        restored, start = mgr.resume_or_load(state2, resume=True)
        assert start == 1
        np.testing.assert_allclose(np.asarray(restored.params["dense"]["w"]),
                                   np.asarray(state.params["dense"]["w"]))
        np.testing.assert_allclose(np.asarray(restored.ema_params["dense"]["w"]),
                                   np.asarray(state.ema_params["dense"]["w"]))
        # optimizer state restored too
        assert int(restored.step) == 1

    def test_period_zero_saves_only_forced(self, tmp_path):
        # save_period<=0 = disabled: do_train calls mgr.save every iter and
        # relies on the manager to gate; only force=True may write.
        mgr = CheckpointManager(str(tmp_path / "ckpt"), save_period=0)
        state = _mini_state()
        assert not mgr.save(state, step=1)
        assert not mgr.save(state, step=5000)
        assert mgr.latest_step() is None
        assert mgr.save(state, step=7, force=True)
        assert mgr.latest_step() == 7

    def test_no_resume_returns_fresh(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "empty"))
        state, start = mgr.resume_or_load(_mini_state(), resume=True)
        assert start == 0

    def test_max_to_keep(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2,
                                save_period=1)
        state = _mini_state()
        for i in range(4):
            grads = jax.tree.map(jnp.ones_like, state.params)
            state = state.apply_gradients(grads)
            mgr.save(state)
        assert mgr.latest_step() == 4
        steps = mgr.mgr.all_steps()
        assert len(steps) <= 2

    def test_npz_roundtrip(self, tmp_path):
        params = {"a": {"w": jnp.arange(6.0).reshape(2, 3)}, "b": jnp.ones(2)}
        p = str(tmp_path / "p.npz")
        save_params_npz(p, params)
        loaded = load_params_npz(p, params)
        np.testing.assert_allclose(np.asarray(loaded["a"]["w"]),
                                   np.asarray(params["a"]["w"]))


class TestWriters:
    def test_json_writer(self, tmp_path):
        st = EventStorage()
        path = str(tmp_path / "metrics.json")
        w = JSONWriter(st, path, log_period=2)
        for i in range(1, 5):
            st.iter = i
            st.put_scalars(loss=1.0 / i)
            w.write()
        import json
        rows = [json.loads(l) for l in open(path)]
        assert [r["iteration"] for r in rows] == [2, 4]

    def test_median_smoothing(self):
        st = EventStorage(window=3)
        for v in [1.0, 100.0, 2.0]:
            st.put_scalars(x=v)
        assert st.median("x") == 2.0


def test_tensorboard_writer(tmp_path, rng):
    from self6dpp_tpu.engine.writers import TensorboardWriter
    st = EventStorage()
    w = TensorboardWriter(st, str(tmp_path / "tb"), log_period=1)
    st.iter = 1
    st.put_scalars(loss=0.5)
    w.write()
    w.add_image("vis", rng.uniform(0, 1, (8, 8, 3)))
    w.add_text("table", "| a | b |")
    import os
    assert any(os.scandir(tmp_path / "tb"))


class TestFlatOptimizer:
    """optax.flatten wrapping (TPU launch-overhead fix, engine/optim.py)."""

    def test_flat_matches_per_leaf_updates(self):
        from self6dpp_tpu.config.base import SolverConfig
        from self6dpp_tpu.engine.optim import build_optimizer

        cfg = SolverConfig(optimizer="ranger", base_lr=1e-2, total_iters=50,
                           warmup_iters=0)
        params = {"a": jnp.ones((8, 3)), "b": {"w": jnp.full((5,), 2.0)}}
        grads = {"a": jnp.full((8, 3), 0.1), "b": {"w": jnp.full((5,), -0.2)}}

        import optax
        txf, _ = build_optimizer(cfg, flatten=True)
        txl, _ = build_optimizer(cfg, flatten=False)
        pf, sf = dict(params), txf.init(params)
        plf, sl = dict(params), txl.init(params)
        for _ in range(8):   # crosses a lookahead sync boundary (period 6)
            uf, sf = txf.update(grads, sf, pf)
            pf = optax.apply_updates(pf, uf)
            ul, sl = txl.update(grads, sl, plf)
            plf = optax.apply_updates(plf, ul)
        for x, y in zip(jax.tree.leaves(pf), jax.tree.leaves(plf)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-7)

    def test_engines_gate_flatten_on_fsdp(self):
        """fsdp-sharded params must keep per-leaf updates (no flat concat)."""
        import dataclasses
        import optax
        from self6dpp_tpu.config.base import SolverConfig
        from self6dpp_tpu.engine.optim import build_optimizer

        cfg = SolverConfig(optimizer="adam", total_iters=10, warmup_iters=0)
        params = {"a": jnp.ones((4, 4))}
        flat_state = build_optimizer(cfg, flatten=True)[0].init(params)
        leaf_state = build_optimizer(cfg, flatten=False)[0].init(params)
        flat_mu = jax.tree.leaves(flat_state)
        leaf_mu = jax.tree.leaves(leaf_state)
        # flat: every moment buffer is 1-D; per-leaf keeps (4, 4)
        assert all(x.ndim <= 1 for x in flat_mu)
        assert any(x.shape == (4, 4) for x in leaf_mu)


def test_hb_meta_real():
    """HomebrewedDB metadata carries the real ref/hb.py:30-85 objects and
    diameters (round-1 stub had 33 placeholder 0.2m diameters)."""
    from self6dpp_tpu.data.ref import get_meta
    m = get_meta("hb")
    assert m.num_objects == 33
    assert m.id2obj[1] == "01_bear"
    assert m.id2obj[28] == "28_stegosaurus"
    assert abs(m.diameter("01_bear") - 0.232572) < 1e-9
    assert abs(m.diameter("28_stegosaurus") - 0.477464) < 1e-9
    assert abs(m.camera_matrix[0, 0] - 537.4799) < 1e-3
    # no placeholder diameters remain
    assert len(set(m.diameters)) == 33
