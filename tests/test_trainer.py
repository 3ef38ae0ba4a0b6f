"""Trainer loop: periodic checkpoints, metric files, resume, NaN guard."""

import itertools
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self6dpp_tpu.config.base import Config, SolverConfig
from self6dpp_tpu.engine.optim import build_optimizer
from self6dpp_tpu.engine.train_state import create_train_state
from self6dpp_tpu.engine.trainer import do_train


def _setup(tmp_path, total_iters=6, ckpt_period=3):
    cfg = Config(
        exp_name="t", output_dir=str(tmp_path),
        solver=SolverConfig(optimizer="adam", base_lr=0.1, warmup_iters=0,
                            total_iters=total_iters),
        ckpt_period=ckpt_period, log_period=2)
    params = {"w": jnp.ones((4,))}
    tx, _ = build_optimizer(cfg.solver)
    state = create_train_state(params, {}, tx, with_ema=False)

    def train_step(state, batch, rng):
        def loss_fn(p):
            return ((p["w"] - batch["target"]) ** 2).sum()
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"total_loss": loss}

    batches = itertools.repeat({"target": np.zeros(4, np.float32)})
    return cfg, state, jax.jit(train_step), batches


def test_trainer_runs_and_checkpoints(tmp_path):
    cfg, state, step, batches = _setup(tmp_path)
    out = do_train(cfg, state, step, batches,
                   lambda b: {k: jnp.asarray(v) for k, v in b.items()},
                   resume=False)
    assert int(out.step) == 6
    assert float(out.params["w"][0]) < 1.0
    assert os.path.exists(tmp_path / "t" / "metrics.json")
    ckpts = os.listdir(tmp_path / "t" / "ckpt")
    assert "6" in ckpts                   # final forced save

    # resume continues from the checkpoint without redoing iterations
    cfg2, state2, step2, batches2 = _setup(tmp_path)
    out2 = do_train(cfg2, state2, step2, batches2,
                    lambda b: {k: jnp.asarray(v) for k, v in b.items()},
                    resume=True)
    assert int(out2.step) == 6            # nothing left to do


def test_load_weights_keeps_fresh_opt_state(tmp_path):
    """Stage-II warm start must bring over weights only: restoring the
    stage-I opt_state/step would replay its schedule count into the short
    stage-II run and anneal the LR to zero (ADVICE r1 #1)."""
    from self6dpp_tpu.engine.checkpoint import CheckpointManager

    cfg, state, step, batches = _setup(tmp_path, total_iters=6)
    trained = do_train(cfg, state, step, batches,
                       lambda b: {k: jnp.asarray(v) for k, v in b.items()},
                       resume=False)

    # a fresh state for "stage II" with a different optimizer structure
    cfg2 = Config(solver=SolverConfig(optimizer="ranger", total_iters=3))
    tx2, _ = build_optimizer(cfg2.solver)
    fresh = create_train_state({"w": jnp.zeros((4,))}, {}, tx2, with_ema=True)
    warm = CheckpointManager(str(tmp_path / "t" / "ckpt")).load_weights(fresh)

    np.testing.assert_allclose(np.asarray(warm.params["w"]),
                               np.asarray(trained.params["w"]))
    assert int(warm.step) == 0
    # opt_state stays the fresh ranger one, untouched by the adam checkpoint
    assert jax.tree.structure(warm.opt_state) == jax.tree.structure(fresh.opt_state)


def test_trainer_nan_guard(tmp_path):
    cfg, state, _, batches = _setup(tmp_path / "nan")

    def bad_step(state, batch, rng):
        return state, {"total_loss": jnp.asarray(float("nan"))}

    with pytest.raises(FloatingPointError):
        do_train(cfg, state, bad_step, batches,
                 lambda b: {k: jnp.asarray(v) for k, v in b.items()},
                 resume=False)


def test_trainer_periodic_eval_to_tb(tmp_path):
    """eval_fn fires every test.eval_period iters; tables land in TB as a
    markdown table and avg scalars chart (reference self_engine.py:694-698,
    eval_result_to_markdown :854-861)."""
    import dataclasses
    from self6dpp_tpu.config.base import TestConfig

    cfg, state, step, batches = _setup(tmp_path, total_iters=6)
    cfg = dataclasses.replace(cfg, test=TestConfig(eval_period=2),
                              tensorboard=True)
    calls = []

    def eval_fn(st):
        calls.append(int(st.step))
        return {"ape": {"ad_10": 75.0, "n": 4},
                "avg": {"ad_10": 75.0, "n": 4}}

    do_train(cfg, state, step, batches,
             lambda b: {k: jnp.asarray(v) for k, v in b.items()},
             eval_fn=eval_fn, resume=False)
    assert calls == [2, 4, 6]
    tb_dir = tmp_path / "t" / "tb"
    assert tb_dir.exists() and len(os.listdir(tb_dir)) > 0
    # the markdown table reached the TB event file
    import glob
    blob = b"".join(open(f, "rb").read()
                    for f in glob.glob(str(tb_dir / "*")))
    assert b"eval/tables" in blob and b"ad_10" in blob
