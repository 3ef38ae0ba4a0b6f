"""Orbax-based checkpointing of the TrainState.

Parity target: core/utils/my_checkpoint.py (MyCheckpointer: model + optimizer
+ scheduler + iteration; resume_or_load), PeriodicCheckpointer with
MAX_TO_KEEP (engine.py:296-303). Stage-II additionally checkpoints the EMA
teacher as the canonical weights (self_engine.py:310-314) — here the EMA is
part of the state PyTree so it persists automatically.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train_state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 2,
                 save_period: int = 5000):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_period = save_period
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, state: TrainState, step: int | None = None,
             force: bool = False) -> bool:
        step = int(state.step) if step is None else step
        # save_period <= 0 disables periodic saves (only force=True writes);
        # mirrors cfg.ckpt_period=0 semantics in engine/trainer.py
        if not force and (self.save_period <= 0
                          or step % self.save_period != 0):
            return False
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "ema_params": state.ema_params,
            "step": np.asarray(step),
        }
        payload = {k: v for k, v in payload.items() if v is not None}
        self.mgr.save(step, args=ocp.args.StandardSave(payload))
        self.mgr.wait_until_finished()
        return True

    def latest_step(self) -> int | None:
        return self.mgr.latest_step()

    def restore(self, state: TrainState, step: int | None = None) -> TrainState:
        """resume_or_load parity: restore into an existing (abstract) state."""
        step = step if step is not None else self.latest_step()
        assert step is not None, "no checkpoint found"
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(0),
        }
        if state.ema_params is not None:
            template["ema_params"] = state.ema_params
        restored = self.mgr.restore(step, args=ocp.args.StandardRestore(template))
        return state.replace(
            params=restored["params"],
            batch_stats=restored.get("batch_stats", state.batch_stats),
            opt_state=restored["opt_state"],
            ema_params=restored.get("ema_params", state.ema_params),
            step=jax.numpy.asarray(int(restored["step"])),
        )

    def resume_or_load(self, state: TrainState, resume: bool = True
                       ) -> tuple[TrainState, int]:
        """Returns (state, start_iteration)."""
        step = self.latest_step()
        if resume and step is not None:
            return self.restore(state, step), step
        return state, 0

    def load_weights(self, state: TrainState, step: int | None = None
                     ) -> TrainState:
        """Weights-only warm start: restore params/batch_stats/ema_params and
        keep the fresh opt_state and step=0.

        The reference's stage-II WEIGHTS load brings over model weights only
        (core/self6dpp/engine/self_engine.py:306-316); restoring the stage-I
        opt_state would also restore its schedule count, which exceeds the
        stage-II total_iters and pins the annealed LR at zero.
        """
        step = step if step is not None else self.latest_step()
        assert step is not None, f"no checkpoint found in {self.directory}"
        # template-free restore: the saved opt_state pytree may not match the
        # stage-II optimizer's structure at all, so never touch it
        raw = self.mgr.restore(step, args=ocp.args.StandardRestore())
        as_jnp = lambda tree: jax.tree.map(jax.numpy.asarray, tree)
        return state.replace(
            params=as_jnp(raw["params"]),
            batch_stats=as_jnp(raw.get("batch_stats", state.batch_stats)),
            ema_params=(as_jnp(raw["ema_params"])
                        if raw.get("ema_params") is not None
                        else state.ema_params),
        )


def save_params_npz(path: str, params: Any) -> None:
    """Flat .npz export (for weight exchange / inspection)."""
    flat = {}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}{k}." if prefix else f"{k}.")
        else:
            flat[prefix[:-1]] = np.asarray(tree)

    walk(params)
    np.savez(path, **flat)


def load_params_npz(path: str, template: Any, strict: bool = True) -> Any:
    """Load a flat .npz into the structure of `template` (names must match).

    strict=False keeps the template value for names absent from the file —
    used for partial init, e.g. imported backbone weights under a full GDRN
    tree (reference: pretrained timm backbone + fresh heads).
    """
    raw = dict(np.load(path))
    loaded = []

    def build(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: build(v, f"{prefix}{k}." if prefix else f"{k}.")
                    for k, v in tree.items()}
        key = prefix[:-1]
        if key not in raw:
            assert not strict, f"missing param {key}"
            return tree
        loaded.append(key)
        assert raw[key].shape == tuple(tree.shape), \
            f"{key}: file {raw[key].shape} != template {tree.shape}"
        return jax.numpy.asarray(raw[key])

    out = build(template)
    unused = set(raw) - set(loaded)
    assert not unused, f"npz arrays not in template: {sorted(unused)[:8]}"
    return out
