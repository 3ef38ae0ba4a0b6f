"""Generic training loop (the reference's do_train skeleton,
core/gdrn_modeling/engine/engine.py:204-520, without the detectron2
machinery): iterate batches, jitted step, periodic checkpoint / eval / log.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Iterator

import jax
import numpy as np

from ..config.base import Config
from .checkpoint import CheckpointManager
from .train_state import TrainState
from .writers import EventStorage, JSONWriter, TerminalWriter

logger = logging.getLogger("self6dpp_tpu")


def do_train(
    cfg: Config,
    state: TrainState,
    train_step: Callable,
    batches: Iterator[dict],
    to_device: Callable[[dict], dict],
    eval_fn: Callable[[TrainState], dict] | None = None,
    vis_fn: Callable[[TrainState, dict, "EventStorage"], None] | None = None,
    resume: bool = True,
) -> TrainState:
    """vis_fn(state, device_batch, storage): called every cfg.vis_period
    iters to emit TB image grids (reference self_engine.py:713-746 writes
    gt/ren/pseudo grids through the event storage)."""
    ckpt = CheckpointManager(
        f"{cfg.output_dir}/{cfg.exp_name}/ckpt",
        max_to_keep=cfg.ckpt_max_to_keep, save_period=cfg.ckpt_period)
    state, start_iter = ckpt.resume_or_load(state, resume=resume)
    if start_iter > 0:
        logger.info(f"resumed from iteration {start_iter}")

    storage = EventStorage()
    writers = [
        TerminalWriter(storage, cfg.solver.total_iters, cfg.log_period),
        JSONWriter(storage,
                   f"{cfg.output_dir}/{cfg.exp_name}/metrics.json",
                   cfg.log_period),
    ]
    tb = None
    if cfg.tensorboard or (cfg.vis_period > 0 and vis_fn is not None):
        from .writers import TensorboardWriter
        tb = TensorboardWriter(storage, f"{cfg.output_dir}/{cfg.exp_name}/tb",
                               cfg.log_period)
        writers.append(tb)
        storage.tb = tb            # vis_fn reaches the image writer here
    rng = jax.random.PRNGKey(cfg.seed)

    for it in range(start_iter, cfg.solver.total_iters):
        batch = to_device(next(batches))
        rng, step_rng = jax.random.split(rng)
        t0 = time.perf_counter()
        state, metrics = train_step(state, batch, step_rng)
        total = float(metrics["total_loss"])
        # finite-loss guard (reference engine.py:404 assert isfinite)
        if not np.isfinite(total):
            logger.error(f"non-finite loss at iter {it}: {metrics}")
            raise FloatingPointError(f"loss diverged at iter {it}")
        storage.iter = it + 1
        storage.put_scalars(
            time_per_iter=time.perf_counter() - t0,
            **{k: float(v) for k, v in metrics.items()})
        for w in writers:
            w.write()
        if vis_fn is not None and cfg.vis_period > 0 \
                and (it + 1) % cfg.vis_period == 0:
            vis_fn(state, batch, storage)
        ckpt.save(state, step=it + 1)
        if (eval_fn is not None and cfg.test.eval_period > 0
                and (it + 1) % cfg.test.eval_period == 0):
            tables = eval_fn(state)
            avg = tables.get("avg", {})
            logger.info(f"eval @ {it + 1}: {avg or tables}")
            # eval tables chart as scalars and render as a markdown table in
            # TB (reference self_engine.py:694-698 + eval_result_to_markdown
            # :854-861)
            storage.put_scalars(**{
                f"eval/{k}": float(v) for k, v in avg.items()
                if isinstance(v, (int, float))})
            if tb is not None:
                from .evaluator import table_to_markdown
                tb.add_text("eval/tables", table_to_markdown(tables), it + 1)

    ckpt.save(state, force=True)
    for w in writers:
        getattr(w, "close", lambda: None)()
    return state
