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

    # Metrics stay on-device between flushes so the dispatch pipeline never
    # blocks on a per-step host sync (the reference asserts isfinite every
    # iter, engine.py:404; here the guard runs on each flush — at most
    # log_period steps after divergence, which the flush backdates to the
    # offending iteration).
    pending: list[tuple[int, dict]] = []
    t_window = time.perf_counter()

    def flush() -> None:
        nonlocal t_window
        if not pending:
            return
        host = jax.device_get([m for _, m in pending])
        per_iter = (time.perf_counter() - t_window) / len(pending)
        for (it1, _), m in zip(pending, host):
            total = float(m["total_loss"])
            if not np.isfinite(total):
                logger.error(f"non-finite loss at iter {it1 - 1}: {m}")
                raise FloatingPointError(f"loss diverged at iter {it1 - 1}")
            storage.iter = it1
            storage.put_scalars(time_per_iter=per_iter,
                                **{k: float(v) for k, v in m.items()})
            for w in writers:
                w.write()
        pending.clear()
        t_window = time.perf_counter()

    for it in range(start_iter, cfg.solver.total_iters):
        batch = to_device(next(batches))
        rng, step_rng = jax.random.split(rng)
        state, metrics = train_step(state, batch, step_rng)
        pending.append((it + 1, metrics))
        vis_due = (vis_fn is not None and cfg.vis_period > 0
                   and (it + 1) % cfg.vis_period == 0)
        eval_due = (eval_fn is not None and cfg.test.eval_period > 0
                    and (it + 1) % cfg.test.eval_period == 0)
        ckpt_due = cfg.ckpt_period > 0 and (it + 1) % cfg.ckpt_period == 0
        if ((it + 1) % cfg.log_period == 0 or vis_due or eval_due or ckpt_due
                or it + 1 == cfg.solver.total_iters):
            flush()
        if vis_due:
            vis_fn(state, batch, storage)
        ckpt.save(state, step=it + 1)
        if eval_due:
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

    flush()
    ckpt.save(state, force=True)
    for w in writers:
        getattr(w, "close", lambda: None)()
    return state
